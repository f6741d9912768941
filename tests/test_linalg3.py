import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.math.linalg3 import eigh3x3, eigvals3x3_sym


def _random_sym(rs, n):
    A = rs.randn(n, 3, 3).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_eigvals_match_numpy():
    rs = np.random.RandomState(0)
    A = _random_sym(rs, 500)
    ours = np.asarray(eigvals3x3_sym(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_eigvecs_are_eigvecs():
    rs = np.random.RandomState(1)
    A = _random_sym(rs, 300)
    evals, evecs = eigh3x3(jnp.asarray(A))
    evals = np.asarray(evals)
    evecs = np.asarray(evecs)
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, evecs[:, :, k])
        lv = evals[:, k : k + 1] * evecs[:, :, k]
        np.testing.assert_allclose(Av, lv, atol=5e-4)
    # orthonormality
    G = np.einsum("nik,nil->nkl", evecs, evecs)
    np.testing.assert_allclose(G, np.tile(np.eye(3), (300, 1, 1)), atol=1e-4)


def test_point_covariance_use_case():
    """Line-fit covariance (rank ~1) and plane covariance (rank ~2)."""
    rs = np.random.RandomState(2)
    # points along a line
    d = np.array([0.5, -0.3, 0.8])
    d /= np.linalg.norm(d)
    pts = d[None, :] * rs.randn(50, 1) + rs.randn(50, 3) * 0.01
    C = np.cov(pts.T).astype(np.float32)
    evals, evecs = eigh3x3(jnp.asarray(C[None]))
    v = np.asarray(evecs)[0, :, 2]
    assert abs(np.dot(v, d)) > 0.999
    # plane normal
    n = np.array([0.2, 0.9, 0.4])
    n /= np.linalg.norm(n)
    basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
    pts = (basis @ rs.randn(2, 80)).T + rs.randn(80, 3) * 0.01
    C = np.cov(pts.T).astype(np.float32)
    evals, evecs = eigh3x3(jnp.asarray(C[None]))
    v = np.asarray(evecs)[0, :, 0]
    assert abs(np.dot(v, n)) > 0.999

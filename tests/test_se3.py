import numpy as np
import jax.numpy as jnp
import pytest

from lego_loam_tpu.math import se3


def random_rotation(rs):
    w = rs.randn(3)
    return np.asarray(se3.exp_so3(jnp.asarray(w)))


def test_exp_log_so3_roundtrip():
    rs = np.random.RandomState(0)
    for _ in range(20):
        w = rs.randn(3)
        w = w / np.linalg.norm(w) * rs.uniform(0.0, 3.1)  # |w| < pi
        R = se3.exp_so3(jnp.asarray(w))
        w2 = se3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)
        # exp(log(R)) == R even for angles near pi
        R2 = se3.exp_so3(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_exp_so3_small_angle():
    w = jnp.array([1e-9, -2e-9, 1e-9])
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


def test_exp_log_se3_roundtrip():
    rs = np.random.RandomState(1)
    for _ in range(10):
        xi = rs.randn(6)
        R, t = se3.exp_se3(jnp.asarray(xi))
        xi2 = se3.log_se3(R, t)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-5)


def test_compose_inverse():
    rs = np.random.RandomState(2)
    Ra = random_rotation(rs)
    ta = rs.randn(3)
    Ri, ti = se3.inverse(jnp.asarray(Ra), jnp.asarray(ta))
    Rc, tc = se3.compose(jnp.asarray(Ra), jnp.asarray(ta), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), np.zeros(3), atol=1e-6)


def test_euler_roundtrip():
    rs = np.random.RandomState(3)
    for _ in range(10):
        rpy = rs.uniform(-1.2, 1.2, 3)
        R = se3.euler_zyx_to_matrix(*[jnp.asarray(v) for v in rpy])
        r2 = se3.matrix_to_euler_zyx(R)
        np.testing.assert_allclose(np.asarray(jnp.stack(r2)), rpy, atol=1e-6)


def test_quat_matrix_roundtrip():
    rs = np.random.RandomState(4)
    for _ in range(10):
        R = random_rotation(rs)
        q = se3.matrix_to_quat(jnp.asarray(R))
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_interp_endpoint():
    rs = np.random.RandomState(5)
    R = random_rotation(rs)
    t = rs.randn(3)
    Ri, ti = se3.interp(jnp.asarray(R), jnp.asarray(t), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(Ri), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ti), t, atol=1e-5)
    R0, t0 = se3.interp(jnp.asarray(R), jnp.asarray(t), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(R0), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t0), np.zeros(3), atol=1e-6)


def test_transform_batched():
    rs = np.random.RandomState(6)
    R = random_rotation(rs)
    t = rs.randn(3)
    p = rs.randn(100, 3)
    q = se3.transform(jnp.asarray(R), jnp.asarray(t), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(q), p @ R.T + t, atol=1e-5)

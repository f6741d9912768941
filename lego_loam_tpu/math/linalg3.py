"""Closed-form batched 3x3 symmetric eigendecomposition.

`jnp.linalg.eigh` lowers to an iterative QR/Jacobi routine that serializes
badly for large batches of tiny matrices — and the mapping hot loop does two
such batches (corner covariance line fits, surf PCA plane fits) per GN
iteration. This is the standard trigonometric closed form (analytic
eigenvalues via the characteristic cubic, eigenvectors via cross products),
pure VPU element-wise math, exact for the well-separated spectra the
geometry gates require anyway.

Returns (evals ascending, evecs as columns) matching jnp.linalg.eigh's
convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigvals3x3_sym(A):
    """Eigenvalues of symmetric (..., 3, 3), ascending (..., 3)."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    # B = (A - q I) / p ; r = det(B) / 2
    b00 = (a00 - q) / p
    b11 = (a11 - q) / p
    b22 = (a22 - q) / p
    b01 = a01 / p
    b02 = a02 / p
    b12 = a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    # near-diagonal / repeated-eigenvalue guard
    diag = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)
    evals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where((p2 <= _EPS)[..., None], diag, evals)


def _eigvec_for(A, lam_a, lam_b):
    """Unit eigenvector for the remaining eigenvalue of A given the other
    two: any non-null column of (A - lam_a I)(A - lam_b I)."""
    I = jnp.eye(3, dtype=A.dtype)
    M = (A - lam_a[..., None, None] * I) @ (A - lam_b[..., None, None] * I)
    # choose the column with the largest norm
    norms = jnp.linalg.norm(M, axis=-2)  # (..., 3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(n, _EPS)
    # fallback for repeated eigenvalues: arbitrary unit axis
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape)
    return jnp.where(n > 1e-9, v, fallback)


def eigh3x3(A):
    """(..., 3, 3) symmetric -> (evals (...,3) ascending, evecs (...,3,3)
    with evecs[..., :, k] the k-th eigenvector)."""
    evals = eigvals3x3_sym(A)
    lo, mid, hi = evals[..., 0], evals[..., 1], evals[..., 2]
    v_lo = _eigvec_for(A, mid, hi)
    v_hi = _eigvec_for(A, lo, mid)
    # middle by orthogonality (keeps the frame consistent)
    v_mid = jnp.cross(v_hi, v_lo)
    n = jnp.linalg.norm(v_mid, axis=-1, keepdims=True)
    v_mid = jnp.where(
        n > 1e-9,
        v_mid / jnp.maximum(n, _EPS),
        _eigvec_for(A, lo, hi),
    )
    evecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return evals, evecs

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


def eigvals3x3_components(a00, a01, a02, a11, a12, a22):
    """Eigenvalues from the six unique components, ascending tuple of (...,).

    Component-wise form: on TPU a (..., 3, 3) array pads its tiny trailing
    dims to full (8, 128) tiles (a ~42x memory blowup), so the batched hot
    paths keep everything as (...,) planes."""
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

    # near-diagonal / repeated-eigenvalue guard (component-wise 3-sort)
    d_lo = jnp.minimum(jnp.minimum(a00, a11), a22)
    d_hi = jnp.maximum(jnp.maximum(a00, a11), a22)
    d_mid = a00 + a11 + a22 - d_lo - d_hi
    near = p2 <= _EPS
    return (
        jnp.where(near, d_lo, e_lo),
        jnp.where(near, d_mid, e_mid),
        jnp.where(near, d_hi, e_hi),
    )


def eigvec_extreme_components(comps, lam_a, lam_b):
    """Unit eigenvector for the eigenvalue of A NOT in (lam_a, lam_b):
    the largest-norm column of (A - lam_a I)(A - lam_b I), all in (...,)
    component planes — no (...,3,3) intermediates, no gathers."""
    a00, a01, a02, a11, a12, a22 = comps
    b00, b11, b22 = a00 - lam_a, a11 - lam_a, a22 - lam_a
    c00, c11, c22 = a00 - lam_b, a11 - lam_b, a22 - lam_b
    # columns of M = B @ C (B, C symmetric with shared off-diagonals)
    m00 = b00 * c00 + a01 * a01 + a02 * a02
    m10 = a01 * c00 + b11 * a01 + a12 * a02
    m20 = a02 * c00 + a12 * a01 + b22 * a02
    m01 = b00 * a01 + a01 * c11 + a02 * a12
    m11 = a01 * a01 + b11 * c11 + a12 * a12
    m21 = a02 * a01 + a12 * c11 + b22 * a12
    m02 = b00 * a02 + a01 * a12 + a02 * c22
    m12 = a01 * a02 + b11 * a12 + a12 * c22
    m22 = a02 * a02 + a12 * a12 + b22 * c22

    n0 = m00 * m00 + m10 * m10 + m20 * m20
    n1 = m01 * m01 + m11 * m11 + m21 * m21
    n2 = m02 * m02 + m12 * m12 + m22 * m22

    use1 = (n1 >= n0) & (n1 >= n2)
    use2 = (n2 > n0) & (n2 > n1) & ~use1
    vx = jnp.where(use2, m02, jnp.where(use1, m01, m00))
    vy = jnp.where(use2, m12, jnp.where(use1, m11, m10))
    vz = jnp.where(use2, m22, jnp.where(use1, m21, m20))
    nn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = nn > 1e-9
    inv = jnp.where(ok, 1.0 / jnp.maximum(nn, _EPS), 0.0)
    return (
        jnp.where(ok, vx * inv, 1.0),
        jnp.where(ok, vy * inv, 0.0),
        jnp.where(ok, vz * inv, 0.0),
    )


def eigvals3x3_sym(A):
    """Eigenvalues of symmetric (..., 3, 3), ascending (..., 3)."""
    lo, mid, hi = eigvals3x3_components(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
    )
    return jnp.stack([lo, mid, hi], axis=-1)


def eigh3x3(A):
    """(..., 3, 3) symmetric -> (evals (...,3) ascending, evecs (...,3,3)
    with evecs[..., :, k] the k-th eigenvector). Matrix-shaped convenience
    wrapper over the component-plane implementation."""
    comps = (
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
    )
    lo, mid, hi = eigvals3x3_components(*comps)
    vlx, vly, vlz = eigvec_extreme_components(comps, mid, hi)
    vhx, vhy, vhz = eigvec_extreme_components(comps, lo, mid)
    # middle by orthogonality (keeps the frame consistent)
    vmx = vhy * vlz - vhz * vly
    vmy = vhz * vlx - vhx * vlz
    vmz = vhx * vly - vhy * vlx
    n = jnp.sqrt(vmx * vmx + vmy * vmy + vmz * vmz)
    ok = n > 1e-9
    alt = eigvec_extreme_components(comps, lo, hi)
    inv = jnp.where(ok, 1.0 / jnp.maximum(n, _EPS), 0.0)
    vmx = jnp.where(ok, vmx * inv, alt[0])
    vmy = jnp.where(ok, vmy * inv, alt[1])
    vmz = jnp.where(ok, vmz * inv, alt[2])
    evals = jnp.stack([lo, mid, hi], axis=-1)
    evecs = jnp.stack(
        [
            jnp.stack([vlx, vmx, vhx], axis=-1),
            jnp.stack([vly, vmy, vhy], axis=-1),
            jnp.stack([vlz, vmz, vhz], axis=-1),
        ],
        axis=-2,
    )
    return evals, evecs

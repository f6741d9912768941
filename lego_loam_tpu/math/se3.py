"""SO(3)/SE(3) math for the TPU-native LeGO-LOAM rebuild.

The reference composes poses through hand-expanded euler closed forms in a
rotated LOAM camera frame (e.g. `featureAssociation.cpp:1552-1578`,
`mapOptmization.cpp:458-581`). Here every pose is a rotation matrix + a
translation in the *lidar* frame (x forward, y left, z up), and interpolation /
composition go through the exponential map. All functions are jit/vmap
friendly and shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w):
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = theta[..., None]  # (...,1,1)
    K = hat(w / jnp.maximum(theta[..., 0], _EPS))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = I + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    # Small-angle: I + hat(w) + 0.5 hat(w)^2
    Ksmall = hat(w)
    Rsmall = I + Ksmall + 0.5 * (Ksmall @ Ksmall)
    return jnp.where(theta > 1e-7, R, Rsmall)


def log_so3(R):
    """(...,3,3) rotation -> (...,3) axis-angle."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta_v = jnp.clip(0.5 * jnp.linalg.norm(v, axis=-1), 0.0, 1.0)
    # arccos is ill-conditioned at both ends; use atan2 of the two estimates
    # away from pi, and pi - arcsin(sin) close to it (arcsin of a small value
    # is well-conditioned).
    theta = jnp.where(
        cos_theta < -0.7,
        jnp.pi - jnp.arcsin(sin_theta_v),
        jnp.arctan2(sin_theta_v, cos_theta),
    )
    sin_theta = jnp.sin(theta)
    # Generic branch
    scale = jnp.where(
        jnp.abs(sin_theta) > 1e-6, theta / jnp.maximum(2.0 * sin_theta, _EPS), 0.5
    )
    w = v * scale[..., None]
    # Near pi: extract axis from diagonal
    near_pi = cos_theta < -1.0 + 1e-4
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums
    sx = jnp.sign(R[..., 2, 1] - R[..., 1, 2])
    sy = jnp.sign(R[..., 0, 2] - R[..., 2, 0])
    sz = jnp.sign(R[..., 1, 0] - R[..., 0, 1])
    sgn = jnp.stack(
        [jnp.where(sx == 0, 1.0, sx), jnp.where(sy == 0, 1.0, sy), jnp.where(sz == 0, 1.0, sz)],
        axis=-1,
    )
    w_pi = axis * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def left_jacobian_so3(w):
    """SO(3) left Jacobian J_l(w): (...,3) -> (...,3,3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], _EPS))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    A = (1.0 - jnp.cos(theta)) / jnp.maximum(theta, _EPS)
    B = (theta - jnp.sin(theta)) / jnp.maximum(theta, _EPS)
    J = I + A * K + B * (K @ K)
    Jsmall = I + 0.5 * hat(w)
    return jnp.where(theta > 1e-7, J, Jsmall)


def exp_se3(xi):
    """se(3) twist (...,6) [w, v] -> (R (...,3,3), t (...,3))."""
    w, v = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t = (left_jacobian_so3(w) @ v[..., None])[..., 0]
    return R, t


def log_se3(R, t):
    """(R, t) -> twist (...,6) [w, v]."""
    w = log_so3(R)
    Jinv = jnp.linalg.inv(left_jacobian_so3(w))
    v = (Jinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """T_a * T_b."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def relative(Ra, ta, Rb, tb):
    """T_a^{-1} * T_b."""
    Rinv, tinv = inverse(Ra, ta)
    return compose(Rinv, tinv, Rb, tb)


def orthonormalize(R):
    """Project (...,3,3) near-rotations back onto SO(3).

    Two Newton iterations for the polar factor: R <- R (3I - R^T R)/2.
    Quadratically convergent for ||R^T R - I|| < 1; exact rotations are
    fixed points to rounding. The map pose is a 2000+-deep chain of f32
    3x3 products per campus run — without periodic re-projection the
    accumulated non-orthogonality FEEDS BACK through prior composition
    (t += R @ dt scales with ||R||) and grows exponentially once scan-to-
    map correction is lost (r4 campus tail: ||t|| reached 4e5 m with per-
    frame odometry increments of 0.12 m). The reference's euler-angle
    state (transformTobeMapped[6]) cannot leave SO(3) by construction."""
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        R = R @ (1.5 * I - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def transform(R, t, p):
    """Apply (R, t) to points p (...,3) (R,t broadcast over leading dims)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def interp(R, t, s):
    """Fractional pose: exp(s * log(T)). s broadcasts over leading dims.

    Replaces the reference's per-point euler scaling in TransformToStart
    (`featureAssociation.cpp:1389-1412`)."""
    xi = log_se3(R, t)
    return exp_se3(xi * s[..., None])


def euler_zyx_to_matrix(roll, pitch, yaw):
    """R = Rz(yaw) Ry(pitch) Rx(roll) — standard vehicle convention."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler_zyx(R):
    """Inverse of euler_zyx_to_matrix -> (roll, pitch, yaw).

    Uses the singularity-free extraction the fork cites
    (`featureAssociation.cpp:2386-2388`)."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arctan2(
        -R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2)
    )
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def quat_to_matrix(q):
    """Quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    qx = (R[..., 2, 1] - R[..., 1, 2]) / (4.0 * qw)
    qy = (R[..., 0, 2] - R[..., 2, 0]) / (4.0 * qw)
    qz = (R[..., 1, 0] - R[..., 0, 1]) / (4.0 * qw)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    # Robust path for tr <= 0: fall back through axis-angle
    w = log_so3(R)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    axis = w / jnp.maximum(theta, _EPS)
    q_aa = jnp.concatenate(
        [jnp.cos(theta * 0.5), axis * jnp.sin(theta * 0.5)], axis=-1
    )
    q = jnp.where((tr > 0)[..., None], q, q_aa)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )

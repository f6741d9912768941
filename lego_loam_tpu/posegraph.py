"""Keyframe pose graph: batched factor Gauss-Newton with a CG solver.

Replaces gtsam's iSAM2 incremental smoother (`mapOptmization.cpp:63-66,
1612-1785`) with an honest TPU-native design: every update relinearizes the
whole graph (prior + odometry chain + loop factors) and solves the normal
equations with preconditioned conjugate gradients whose matvec is computed
factor-wise — gathers, 6x6 block products, segment-sum scatters. That matvec
is embarrassingly shardable over factors, which is what the multi-host
distributed solver (`distributed.py`) exploits.

Residual convention: for a factor (i, j) with measurement M_ij,
  r = log_se3( M_ij^{-1} ∘ T_i^{-1} ∘ T_j )            (6,)
with right-multiplicative pose increments T_k <- T_k exp(xi_k):
  J_j =  Jr_inv(r)                                      (approx I + ad(r)/2)
  J_i = -Jr_inv(r) Ad(T_j^{-1} T_i)
Pose 0 is gauge-fixed with a strong prior (≙ the gtsam PriorFactor,
mapOptmization.cpp:1654-1660).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .math import se3


def adjoint(R, t):
    """SE(3) adjoint: (...,3,3),(...,3) -> (...,6,6) acting on [w, v]."""
    tx = se3.hat(t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def ad_se3(xi):
    """se(3) adjoint (little ad): (...,6) -> (...,6,6)."""
    w, v = xi[..., :3], xi[..., 3:]
    wx, vx = se3.hat(w), se3.hat(v)
    top = jnp.concatenate([wx, jnp.zeros_like(wx)], axis=-1)
    bot = jnp.concatenate([vx, wx], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class Factors(NamedTuple):
    """Padded between-factor set over the keyframe chain + loops."""

    i: jax.Array  # (F,) int32 source pose index
    j: jax.Array  # (F,) int32 target pose index
    R: jax.Array  # (F, 3, 3) measured relative rotation (i frame)
    t: jax.Array  # (F, 3)
    info: jax.Array  # (F, 6) diagonal information weights [w_rot*3, w_trans*3]
    mask: jax.Array  # (F,) valid


def factor_residuals(poses_R, poses_t, f: Factors):
    """r = log(M^{-1} T_i^{-1} T_j) per factor: (F, 6)."""
    Ri = poses_R[f.i]
    ti = poses_t[f.i]
    Rj = poses_R[f.j]
    tj = poses_t[f.j]
    R_ij, t_ij = se3.relative(Ri, ti, Rj, tj)
    Rm_inv, tm_inv = se3.inverse(f.R, f.t)
    Re, te = se3.compose(Rm_inv, tm_inv, R_ij, t_ij)
    return se3.log_se3(Re, te)


def factor_jacobians(poses_R, poses_t, f: Factors, r):
    """(J_i, J_j): (F, 6, 6) each, first-order Jr_inv."""
    Jr_inv = jnp.eye(6)[None] + 0.5 * ad_se3(r)
    Rji, tji = se3.relative(poses_R[f.j], poses_t[f.j], poses_R[f.i], poses_t[f.i])
    Ad = adjoint(Rji, tji)
    Jj = Jr_inv
    Ji = -(Jr_inv @ Ad)
    return Ji, Jj


def _matvec(x, Ji, Jj, f: Factors, n_poses, prior_w):
    """y = (H + prior) x with H = sum_f J_f^T Ω J_f, factor-wise."""
    xi = x[f.i]  # (F, 6)
    xj = x[f.j]
    a = jnp.einsum("fab,fb->fa", Ji, xi) + jnp.einsum("fab,fb->fa", Jj, xj)
    a = a * f.info * f.mask[:, None]
    yi = jnp.einsum("fba,fb->fa", Ji, a)
    yj = jnp.einsum("fba,fb->fa", Jj, a)
    y = jax.ops.segment_sum(yi, f.i, num_segments=n_poses)
    y = y + jax.ops.segment_sum(yj, f.j, num_segments=n_poses)
    # gauge prior on pose 0
    y = y.at[0].add(prior_w * x[0])
    return y


def _block_precond(Ji, Jj, f: Factors, n_poses, prior_w):
    """Block-diagonal (6x6 per pose) preconditioner blocks, inverted."""
    Oi = jnp.einsum("fba,fb,fbc->fac", Ji, f.info * f.mask[:, None], Ji)
    Oj = jnp.einsum("fba,fb,fbc->fac", Jj, f.info * f.mask[:, None], Jj)
    B = jax.ops.segment_sum(Oi, f.i, num_segments=n_poses)
    B = B + jax.ops.segment_sum(Oj, f.j, num_segments=n_poses)
    B = B.at[0].add(prior_w * jnp.eye(6))
    B = B + 1e-6 * jnp.eye(6)[None]
    return jnp.linalg.inv(B)


def solve_pose_graph(
    poses_R,
    poses_t,
    factors: Factors,
    n_poses_mask,  # (N,) bool: active poses
    cfg: LegoLoamConfig,
    gn_iters: int = 4,
    prior_w: float = 1e6,
):
    """Batch GN with PCG inner solves. Returns corrected (poses_R, poses_t).

    ≙ the combined effect of gtsam ISAM2 update + correctPoses
    (mapOptmization.cpp:1675-1676, 1757-1785)."""
    N = poses_R.shape[0]
    d = cfg.distributed
    active = n_poses_mask[:, None].astype(poses_t.dtype)

    def gn_body(_, carry):
        R, t = carry
        r = factor_residuals(R, t, factors)
        Ji, Jj = factor_jacobians(R, t, factors, r)

        wr = r * factors.info * factors.mask[:, None]
        gi = jnp.einsum("fba,fb->fa", Ji, wr)
        gj = jnp.einsum("fba,fb->fa", Jj, wr)
        g = jax.ops.segment_sum(gi, factors.i, num_segments=N)
        g = g + jax.ops.segment_sum(gj, factors.j, num_segments=N)
        b = -g * active

        Minv = _block_precond(Ji, Jj, factors, N, prior_w)

        def mv(x):
            return _matvec(x, Ji, Jj, factors, N, prior_w) * active

        def apply_M(x):
            return jnp.einsum("nab,nb->na", Minv, x) * active

        # PCG
        x = jnp.zeros_like(b)
        res = b - mv(x)
        z = apply_M(res)
        p = z
        rz = jnp.sum(res * z)

        def cg_body(_, state):
            x, res, p, rz = state
            Ap = mv(p)
            denom = jnp.sum(p * Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
            x = x + alpha * p
            res = res - alpha * Ap
            z = apply_M(res)
            rz_new = jnp.sum(res * z)
            beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
            p = z + beta * p
            return x, res, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(
            0, d.cg_iterations, cg_body, (x, res, p, rz)
        )

        # Per-pose trust region: a partially-converged PCG direction can
        # carry huge components (measured pose launches to 1e3+ m at the
        # first campus loop closure); a legitimate correction distributes a
        # few meters across hundreds of poses, so per-pose caps only cut
        # runaway.
        rot_n = jnp.linalg.norm(x[:, :3], axis=1, keepdims=True)
        trans_n = jnp.linalg.norm(x[:, 3:], axis=1, keepdims=True)
        scale = jnp.minimum(
            jnp.minimum(1.0, 0.3 / jnp.maximum(rot_n, 1e-12)),
            jnp.minimum(1.0, 2.0 / jnp.maximum(trans_n, 1e-12)),
        )
        x = x * scale
        dR, dt = se3.exp_se3(x)
        # right-multiplicative update
        R_new = R @ dR
        t_new = jnp.einsum("nij,nj->ni", R, dt) + t
        keep = n_poses_mask[:, None]
        return (
            jnp.where(keep[..., None], R_new, R),
            jnp.where(keep, t_new, t),
        )

    R, t = jax.lax.fori_loop(0, gn_iters, gn_body, (poses_R, poses_t))
    return R, t


def graph_cost(poses_R, poses_t, factors: Factors):
    """Total weighted squared residual of the factor set (masked)."""
    r = factor_residuals(poses_R, poses_t, factors)
    return jnp.sum(r * r * factors.info * factors.mask[:, None])


def chain_factors_from_poses(poses_R, poses_t, n_active, max_factors, info_rot=1e6, info_trans=1e8):
    """Odometry-chain between-factors measured from the current pose array.

    ≙ the BetweenFactor chain the reference adds per keyframe with variances
    (1e-6,...,1e-8) (mapOptmization.cpp:1646-1673)."""
    N = poses_R.shape[0]
    i = jnp.arange(N - 1, dtype=jnp.int32)
    j = i + 1
    Rm, tm = se3.relative(poses_R[:-1], poses_t[:-1], poses_R[1:], poses_t[1:])
    mask = (j < n_active)
    info = jnp.concatenate(
        [jnp.full((N - 1, 3), info_rot), jnp.full((N - 1, 3), info_trans)], axis=-1
    )
    return Factors(i=i, j=j, R=Rm, t=tm, info=info, mask=mask)

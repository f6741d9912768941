"""Scan-to-map refinement: submap assembly + 6-DoF Gauss-Newton.

TPU-native rewrite of the MapOptimization hot path
(`mapOptmization.cpp:1096-1610`):

- submap = gathered keyframe feature clouds transformed by their poses and
  voxel-downsampled on device (≙ extractSurroundingKeyFrames :1096-1232);
  keyframe *selection* (radius search over a few thousand positions) stays on
  the host in the pipeline.
- corner residuals: 5-NN covariance eigen line fit (≙ cornerOptimization
  :1269-1377); surf residuals: 5-point least-squares plane with the 0.2 m
  validity gate (≙ surfOptimization :1379-1442). kd-trees are replaced by
  MXU-tiled brute-force top-k (`ops/knn.py::chunked_top_k`).
- solver: on-manifold 6-DoF GN with eigenvalue degeneracy projection
  (<100 -> direction removed) and the (stop_thres deg/cm) exit test
  (≙ LMOptimization :1444-1570). The pose update the reference ships
  commented out (:1539-1545) is ON by default (cfg.mapping.enable_map_update).

Returns solver diagnostics (iterations, min eigenvalue, mean |residual|)
matching the reference's LocalInfo record (:1602-1607).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .math import se3
from .math.linalg3 import eigh3x3
from .ops.knn import chunked_top_k
from .types import MapState


def _nn5(q, target, t_mask, cfg):
    """5-NN search, Pallas kernel on TPU, XLA chunked top-k elsewhere.

    The Pallas kernel (`ops/pallas_knn.py`) streams target tiles through
    VMEM with a running sorted merge — orders of magnitude faster than both
    the chunked `approx_min_k` sweep and a gather-based voxel-hash grid
    (TPU random gathers lose to MXU matmul brute force at these sizes)."""
    use_pallas = (
        cfg.mapping.nn_backend == "pallas"
        or (cfg.mapping.nn_backend == "auto" and jax.default_backend() == "tpu")
    )
    if use_pallas and q.shape[0] % 512 == 0 and target.shape[0] % 2048 == 0:
        from .ops.pallas_knn import pallas_topk_l2

        return pallas_topk_l2(q, target, t_mask, k=5)
    return chunked_top_k(q, jnp.ones(q.shape[0], bool), target, t_mask, 5)


class MapDiag(NamedTuple):
    iterations: jax.Array
    min_lambda: jax.Array
    cf_mean: jax.Array
    degenerate: jax.Array
    n_corner: jax.Array
    n_surf: jax.Array


def assemble_submap(
    kf_corner,  # (K, Nc, 3) keyframe corner clouds (sensor frame)
    kf_corner_mask,  # (K, Nc)
    kf_surf,  # (K, Ns, 3)
    kf_surf_mask,  # (K, Ns)
    kf_R,  # (K, 3, 3) keyframe poses
    kf_t,  # (K, 3)
    kf_valid,  # (K,) selected-keyframe mask
    origin,  # (3,) current position (voxel-grid center)
    cfg: LegoLoamConfig,
) -> MapState:
    """Transform + concat + voxel-downsample the selected keyframes."""
    m = cfg.mapping
    K, Nc, _ = kf_corner.shape
    _, Ns, _ = kf_surf.shape

    cw = jnp.einsum("kij,knj->kni", kf_R, kf_corner) + kf_t[:, None, :]
    sw = jnp.einsum("kij,knj->kni", kf_R, kf_surf) + kf_t[:, None, :]
    cmask = kf_corner_mask & kf_valid[:, None]
    smask = kf_surf_mask & kf_valid[:, None]

    from .ops.voxel import voxel_downsample_masked

    c_xyz, c_m = voxel_downsample_masked(
        cw.reshape(-1, 3), cmask.reshape(-1), m.corner_leaf,
        cfg.pipeline.local_voxel_radius, origin,
    )
    s_xyz, s_m = voxel_downsample_masked(
        sw.reshape(-1, 3), smask.reshape(-1), m.submap_surf_leaf,
        cfg.pipeline.local_voxel_radius, origin,
    )
    return MapState(
        corner_xyz=c_xyz[: m.max_submap_corner],
        corner_mask=c_m[: m.max_submap_corner],
        surf_xyz=s_xyz[: m.max_submap_surf],
        surf_mask=s_m[: m.max_submap_surf],
    )


def _corner_residuals(q, q_mask, idx, submap: MapState, cfg: LegoLoamConfig):
    """5-NN line-fit point-to-line residuals (mapOptmization.cpp:1269-1377)."""
    mcfg = cfg.mapping
    nbr = submap.corner_xyz[idx]  # (Q, 5, 3)
    d2_now = jnp.sum((nbr - q[:, None, :]) ** 2, axis=-1)
    ok = q_mask & (jnp.max(d2_now, axis=1) < mcfg.nn_valid_dist)
    c = jnp.mean(nbr, axis=1)
    dcen = nbr - c[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", dcen, dcen) / 5.0
    evals, evecs = eigh3x3(cov)  # ascending, closed form
    line_ok = evals[:, 2] > mcfg.line_ratio * evals[:, 1]
    v = evecs[:, :, 2]

    t1 = c + 0.1 * v
    t2 = c - 0.1 * v
    u = t1 - t2
    cr = jnp.cross(q - t1, q - t2)
    cn = jnp.linalg.norm(cr, axis=-1)
    un = jnp.linalg.norm(u, axis=-1)
    dist = cn / jnp.maximum(un, 1e-9)
    n = jnp.cross(u, cr / jnp.maximum(cn, 1e-12)[:, None]) / jnp.maximum(
        un, 1e-9
    )[:, None]

    s = 1.0 - 0.9 * jnp.abs(dist)
    w = jnp.where(ok & line_ok & (s > 0.1), s, 0.0)
    return n, dist, w


def plane_fit_pca(nbr):
    """Total-least-squares plane through (..., K, 3) neighbors: unit normal n
    and offset d with n·p + d = 0, via covariance eigendecomposition.

    The reference fits `A x = -1` (mapOptmization.cpp:1390-1402), which is
    ill-posed for planes passing near the coordinate origin (the d=1
    normalization cannot represent d=0); the PCA fit has no such pathology
    and is finite even for degenerate neighbor sets."""
    c = jnp.mean(nbr, axis=-2)
    d = nbr - c[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", d, d)
    evals, evecs = eigh3x3(cov)
    n = evecs[..., :, 0]  # smallest-eigenvalue direction
    off = -jnp.sum(n * c, axis=-1)
    return n, off


def _surf_residuals(q, q_mask, idx, submap: MapState, cfg: LegoLoamConfig):
    """5-NN plane-fit point-to-plane residuals (mapOptmization.cpp:1379-1442)."""
    mcfg = cfg.mapping
    nbr = submap.surf_xyz[idx]  # (Q, 5, 3)
    d2_now = jnp.sum((nbr - q[:, None, :]) ** 2, axis=-1)
    ok = q_mask & (jnp.max(d2_now, axis=1) < mcfg.nn_valid_dist)
    n, d_off = plane_fit_pca(nbr)

    plane_fit = jnp.abs(jnp.einsum("qki,qi->qk", nbr, n) + d_off[:, None])
    plane_ok = jnp.all(plane_fit < mcfg.plane_valid_dist, axis=1)

    pd = jnp.sum(n * q, axis=-1) + d_off
    qn = jnp.linalg.norm(q, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(pd) / jnp.sqrt(jnp.maximum(qn, 1e-9))
    w = jnp.where(ok & plane_ok & (s > 0.1), s, 0.0)
    return n, pd, w


def scan_to_map(
    corner_xyz,  # (Qc, 3) current scan corners (sensor frame, DS'd)
    corner_mask,
    surf_xyz,  # (Qs, 3) current scan surfs+outliers (sensor frame, DS'd)
    surf_mask,
    R0, t0,  # initial pose guess (map frame)
    submap: MapState,
    cfg: LegoLoamConfig,
):
    """6-DoF GN refinement. Returns (R, t, MapDiag)."""
    m = cfg.mapping
    enough = (jnp.sum(submap.corner_mask) > m.min_corner_map) & (
        jnp.sum(submap.surf_mask) > m.min_surf_map
    )

    def cond(state):
        it, _, _, done, _, _, _, _ = state
        return (it < min(m.iter_count_thres, m.max_gn_iterations)) & ~done

    def body(state):
        it, R, t, _, _, _, idx_c, idx_s = state
        qc = corner_xyz @ R.T + t
        qs = surf_xyz @ R.T + t

        def refresh(_):
            ic, _d = _nn5(qc, submap.corner_xyz, submap.corner_mask, cfg)
            isf, _d2 = _nn5(qs, submap.surf_xyz, submap.surf_mask, cfg)
            return jnp.maximum(ic, 0), jnp.maximum(isf, 0)

        idx_c, idx_s = jax.lax.cond(
            (it % m.search_every) == 0, refresh, lambda x: x, (idx_c, idx_s)
        )
        nc, dc, wc = _corner_residuals(qc, corner_mask, idx_c, submap, cfg)
        ns, ds_, ws = _surf_residuals(qs, surf_mask, idx_s, submap, cfg)

        q = jnp.concatenate([qc, qs], axis=0)
        n = jnp.concatenate([nc, ns], axis=0)
        d = jnp.concatenate([dc, ds_], axis=0)
        w = jnp.concatenate([wc, ws], axis=0)

        Jw = jnp.cross(q, n)
        J = jnp.concatenate([Jw, n], axis=-1) * w[:, None]
        r = d * w
        H = J.T @ J
        g = J.T @ r

        evals, evecs = jnp.linalg.eigh(H)
        keep = (evals >= m.eigen_threshold).astype(H.dtype)
        ginv = jnp.where(evals > 1e-9, 1.0 / jnp.maximum(evals, 1e-9), 0.0)
        delta = -(evecs @ ((evecs.T @ g) * ginv * keep)) * m.step_size

        n_sel = jnp.sum(w > 0)
        delta = jnp.where((n_sel >= m.min_sel) & enough, delta, 0.0)
        if not m.enable_map_update:
            delta = jnp.zeros_like(delta)

        dR, dt = se3.exp_se3(delta)
        R_new, t_new = se3.compose(dR, dt, R, t)

        rot_deg = jnp.linalg.norm(delta[:3]) * 180.0 / jnp.pi
        trans_cm = jnp.linalg.norm(delta[3:]) * 100.0
        done = ((rot_deg < m.stop_thres) & (trans_cm < m.stop_thres)) | (
            n_sel < m.min_sel
        ) | ~enough
        cf_mean = jnp.sum(jnp.abs(r)) / jnp.maximum(n_sel, 1)
        return it + 1, R_new, t_new, done, evals[0], cf_mean, idx_c, idx_s

    init = (
        jnp.int32(0), R0, t0, jnp.bool_(False), jnp.float32(0), jnp.float32(0),
        jnp.zeros((corner_xyz.shape[0], 5), jnp.int32),
        jnp.zeros((surf_xyz.shape[0], 5), jnp.int32),
    )
    it, R, t, _, min_lambda, cf_mean, _, _ = jax.lax.while_loop(cond, body, init)

    diag = MapDiag(
        iterations=it,
        min_lambda=min_lambda,
        cf_mean=cf_mean,
        degenerate=min_lambda < m.eigen_threshold,
        n_corner=jnp.sum(corner_mask),
        n_surf=jnp.sum(surf_mask),
    )
    return R, t, diag


def map_prior(R_map_prev, t_map_prev, R_odom_prev, t_odom_prev, R_odom, t_odom):
    """Initial mapping guess from the latest odometry increment.

    ≙ transformAssociateToMap (mapOptmization.cpp:458-581), which composes the
    previous map correction with the new odometry delta via euler closed
    forms; here simply T_map_prior = T_map_prev ∘ (T_odom_prev⁻¹ ∘ T_odom)."""
    Rd, td = se3.relative(R_odom_prev, t_odom_prev, R_odom, t_odom)
    return se3.compose(R_map_prev, t_map_prev, Rd, td)

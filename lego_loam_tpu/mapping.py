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
from .math.linalg3 import (
    eigh3x3,
    eigvals3x3_components,
    eigvec_extreme_components,
)
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

        # groups=16: strided group reduction cuts the selection sweeps; on
        # voxel-sorted targets the k-NN it returns are distance-identical to
        # exact (same-residue collisions only drop equidistant duplicates —
        # mean 5-NN distance error < 1 mm measured, tests/test_pallas_knn.py).
        return pallas_topk_l2(q, target, t_mask, k=5, groups=16)
    return chunked_top_k(q, jnp.ones(q.shape[0], bool), target, t_mask, 5)


class MapDiag(NamedTuple):
    iterations: jax.Array
    min_lambda: jax.Array
    cf_mean: jax.Array
    degenerate: jax.Array
    n_corner: jax.Array
    n_surf: jax.Array
    # Whole-solve divergence rejection fired (pose fell back to the prior).
    rejected: jax.Array
    # Submap fill + selected-correspondence counts (0 when mapping skipped).
    n_submap_corner: jax.Array
    n_submap_surf: jax.Array
    n_sel: jax.Array


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

    # radial_pack: the output is truncated to max_submap_* below — nearest-
    # first ordering makes that truncation drop the FARTHEST voxels. Raw key
    # order dropped an x-slab (including the scene ahead of the vehicle)
    # whenever the campus-scale submap overflowed the cap, collapsing the
    # solver's correspondence set lap by lap (r4 divergence root cause).
    c_xyz, c_m = voxel_downsample_masked(
        cw.reshape(-1, 3), cmask.reshape(-1), m.corner_leaf,
        cfg.pipeline.local_voxel_radius, origin, radial_pack=True,
    )
    s_xyz, s_m = voxel_downsample_masked(
        sw.reshape(-1, 3), smask.reshape(-1), m.submap_surf_leaf,
        cfg.pipeline.local_voxel_radius, origin, radial_pack=True,
    )
    return MapState(
        corner_xyz=c_xyz[: m.max_submap_corner],
        corner_mask=c_m[: m.max_submap_corner],
        surf_xyz=s_xyz[: m.max_submap_surf],
        surf_mask=s_m[: m.max_submap_surf],
    )


def _nbr_components(points, idx):
    """Gather 5-NN coordinates as (Q, 5) component planes (a (Q, 5, 3)
    gather would pad the trailing 3 to a full 128-lane tile on TPU)."""
    return points[:, 0][idx], points[:, 1][idx], points[:, 2][idx]


def _corner_fit(q, q_mask, idx, submap: MapState, cfg: LegoLoamConfig):
    """Pose-independent part of the corner residual: 5-NN covariance line fit
    (mapOptmization.cpp:1283-1333). Runs only at index-refresh time — the
    fitted line (center c, direction v) and validity gate depend on the
    neighbor set alone, not on the pose iterate, so they are hoisted out of
    the GN loop. Returns (Q,) component planes (cx,cy,cz,vx,vy,vz,ok)."""
    mcfg = cfg.mapping
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
    nx, ny, nz = _nbr_components(submap.corner_xyz, idx)  # (Q, 5)

    # The reference re-searches each iteration and gates on the 5th-NN
    # distance from the *current* transformed point; evaluating the gate at
    # refresh time changes it by the (mm-scale) inter-refresh pose motion.
    d2_now = (nx - qx[:, None]) ** 2 + (ny - qy[:, None]) ** 2 + (nz - qz[:, None]) ** 2
    ok = q_mask & (jnp.max(d2_now, axis=1) < mcfg.nn_valid_dist)

    cx = jnp.mean(nx, axis=1)
    cy = jnp.mean(ny, axis=1)
    cz = jnp.mean(nz, axis=1)
    dx = nx - cx[:, None]
    dy = ny - cy[:, None]
    dz = nz - cz[:, None]
    a00 = jnp.mean(dx * dx, axis=1)
    a01 = jnp.mean(dx * dy, axis=1)
    a02 = jnp.mean(dx * dz, axis=1)
    a11 = jnp.mean(dy * dy, axis=1)
    a12 = jnp.mean(dy * dz, axis=1)
    a22 = jnp.mean(dz * dz, axis=1)
    comps = (a00, a01, a02, a11, a12, a22)
    lo, mid, hi = eigvals3x3_components(*comps)
    line_ok = hi > mcfg.line_ratio * mid
    vx, vy, vz = eigvec_extreme_components(comps, lo, mid)  # largest eigvec
    return cx, cy, cz, vx, vy, vz, ok & line_ok


def _corner_residuals(q, fit):
    """Pose-dependent corner residual vs the cached line fit
    (mapOptmization.cpp:1335-1377): pure (Q,)-plane arithmetic, runs every
    GN iteration.

    point-to-line for the segment c ± 0.1 v: with p = q - c,
    cr = (p - 0.1v) x (p + 0.1v) = 0.2 (p x v); dist = |p x v|;
    gradient n = v x (p x v)/|p x v| (unit, as in the reference algebra)."""
    cx, cy, cz, vx, vy, vz, ok = fit
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
    px = qx - cx
    py = qy - cy
    pz = qz - cz
    crx = py * vz - pz * vy
    cry = pz * vx - px * vz
    crz = px * vy - py * vx
    cn = jnp.sqrt(crx * crx + cry * cry + crz * crz)
    dist = cn
    inv = 1.0 / jnp.maximum(cn, 1e-12)
    ux, uy, uz = crx * inv, cry * inv, crz * inv  # unit p x v
    gx = vy * uz - vz * uy
    gy = vz * ux - vx * uz
    gz = vx * uy - vy * ux

    s = 1.0 - 0.9 * jnp.abs(dist)
    w = jnp.where(ok & (s > 0.1), s, 0.0)
    return (gx, gy, gz), dist, w


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


def _surf_fit(q, q_mask, idx, submap: MapState, cfg: LegoLoamConfig):
    """Pose-independent part of the surf residual: 5-NN PCA plane fit +
    planarity gate (mapOptmization.cpp:1390-1423), hoisted to refresh time
    (see _corner_fit). Returns (gx,gy,gz,d_off,ok) component planes."""
    mcfg = cfg.mapping
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
    nx, ny, nz = _nbr_components(submap.surf_xyz, idx)  # (Q, 5)

    d2_now = (nx - qx[:, None]) ** 2 + (ny - qy[:, None]) ** 2 + (nz - qz[:, None]) ** 2
    ok = q_mask & (jnp.max(d2_now, axis=1) < mcfg.nn_valid_dist)

    cx = jnp.mean(nx, axis=1)
    cy = jnp.mean(ny, axis=1)
    cz = jnp.mean(nz, axis=1)
    dx = nx - cx[:, None]
    dy = ny - cy[:, None]
    dz = nz - cz[:, None]
    comps = (
        jnp.sum(dx * dx, axis=1), jnp.sum(dx * dy, axis=1),
        jnp.sum(dx * dz, axis=1), jnp.sum(dy * dy, axis=1),
        jnp.sum(dy * dz, axis=1), jnp.sum(dz * dz, axis=1),
    )
    lo, mid, hi = eigvals3x3_components(*comps)
    gx, gy, gz = eigvec_extreme_components(comps, mid, hi)  # smallest eigvec
    d_off = -(gx * cx + gy * cy + gz * cz)

    plane_fit = jnp.abs(
        gx[:, None] * nx + gy[:, None] * ny + gz[:, None] * nz + d_off[:, None]
    )
    plane_ok = jnp.all(plane_fit < mcfg.plane_valid_dist, axis=1)
    return gx, gy, gz, d_off, ok & plane_ok


def _surf_residuals(q, fit, rn):
    """Pose-dependent surf residual vs the cached plane fit
    (mapOptmization.cpp:1425-1442): runs every GN iteration.

    rn: (Q,) SENSOR-frame point range. The reference scales the robust
    weight by the MAP-frame point magnitude (surfOptimization's pointSel
    norm) — a quirk that is harmless when the map stays near the origin but
    loosens the gate without bound as ‖t_map‖ grows (at 100 m from origin
    a 9 m plane residual still gets weight 0.1). Range-based scaling keeps
    the original intent (distant points are noisier) scale-invariantly."""
    gx, gy, gz, d_off, ok = fit
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
    pd = gx * qx + gy * qy + gz * qz + d_off
    s = 1.0 - 0.9 * jnp.abs(pd) / jnp.sqrt(jnp.maximum(rn, 1e-9))
    w = jnp.where(ok & (s > 0.1), s, 0.0)
    return (gx, gy, gz), pd, w


def _gn_normal_equations(qx, qy, qz, g, d, w):
    """Accumulate H (6,6) and g (6,) from component-plane residuals.

    J row = [q x n, n]; everything stays (Q,) until the final 21 scalar
    reductions (a (Q, 6) Jacobian array would pad 6 lanes to 128)."""
    gx, gy, gz = g
    jx = qy * gz - qz * gy
    jy = qz * gx - qx * gz
    jz = qx * gy - qy * gx
    cols = (jx * w, jy * w, jz * w, gx * w, gy * w, gz * w)
    r = d * w
    H = jnp.stack(
        [jnp.stack([jnp.sum(cols[a] * cols[b]) for b in range(6)]) for a in range(6)]
    )
    gvec = jnp.stack([jnp.sum(cols[a] * r) for a in range(6)])
    return H, gvec


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
    # Sensor-frame range of each surf point (pose-independent): feeds the
    # robust weight's range scaling (see _surf_residuals).
    surf_rn = jnp.linalg.norm(surf_xyz, axis=1)

    def cond(state):
        it, done = state[0], state[3]
        return (it < min(m.iter_count_thres, m.max_gn_iterations)) & ~done

    def body(state):
        it, R, t, _, _, _, fit_c, fit_s, P_proj, min_lam, _ = state
        qc = corner_xyz @ R.T + t
        qs = surf_xyz @ R.T + t

        def refresh(_):
            ic, _d = _nn5(qc, submap.corner_xyz, submap.corner_mask, cfg)
            isf, _d2 = _nn5(qs, submap.surf_xyz, submap.surf_mask, cfg)
            fc = _corner_fit(qc, corner_mask, jnp.maximum(ic, 0), submap, cfg)
            fs = _surf_fit(qs, surf_mask, jnp.maximum(isf, 0), submap, cfg)
            return fc, fs

        fit_c, fit_s = jax.lax.cond(
            (it % m.search_every) == 0, refresh, lambda x: x, (fit_c, fit_s)
        )
        nc, dc, wc = _corner_residuals(qc, fit_c)
        ns, ds_, ws = _surf_residuals(qs, fit_s, surf_rn)
        if m.corner_weight != 1.0:
            wc = wc * m.corner_weight

        Hc, gc = _gn_normal_equations(
            qc[:, 0], qc[:, 1], qc[:, 2], nc, dc, wc
        )
        Hs, gs = _gn_normal_equations(
            qs[:, 0], qs[:, 1], qs[:, 2], ns, ds_, ws
        )
        H = Hc + Hs
        g = gc + gs
        w_all = jnp.concatenate([wc, ws])
        r_abs = jnp.abs(jnp.concatenate([dc * wc, ds_ * ws]))

        # Degeneracy projection recomputed at every correspondence refresh
        # (the reference computes matP once per solve, mapOptmization.cpp:
        # 1506-1535 — but its pose barely moves; with live updates the
        # iteration-0 projection can certify directions the refreshed
        # correspondence set no longer constrains).
        def proj(_):
            evals, evecs = jnp.linalg.eigh(H)
            keep = (evals >= m.eigen_threshold).astype(H.dtype)
            P = evecs @ (evecs.T * keep[:, None])
            return P, evals[0]

        P_proj, min_lam = jax.lax.cond(
            (it % m.search_every) == 0, proj, lambda _: (P_proj, min_lam), None
        )
        step = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
        delta = -(P_proj @ step) * m.step_size

        # Per-iteration trust region: a GN step larger than this is never a
        # refinement — clamp rotation and translation norms independently.
        rot_n = jnp.linalg.norm(delta[:3])
        trans_n = jnp.linalg.norm(delta[3:])
        rot_cap = m.step_clamp_rot_deg * jnp.pi / 180.0
        r_scale = jnp.minimum(1.0, rot_cap / jnp.maximum(rot_n, 1e-12))
        t_scale = jnp.minimum(
            1.0, m.step_clamp_trans / jnp.maximum(trans_n, 1e-12)
        )
        scale = jnp.minimum(r_scale, t_scale)
        delta = delta * scale

        n_sel = jnp.sum(w_all > 0)
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
        cf_mean = jnp.sum(r_abs) / jnp.maximum(n_sel, 1)
        return (
            it + 1, R_new, t_new, done, min_lam, cf_mean, fit_c, fit_s,
            P_proj, min_lam, n_sel.astype(jnp.int32),
        )

    Qc = corner_xyz.shape[0]
    Qs = surf_xyz.shape[0]
    zc = jnp.zeros((Qc,))
    zs = jnp.zeros((Qs,))
    init = (
        jnp.int32(0), R0, t0, jnp.bool_(False), jnp.float32(0), jnp.float32(0),
        (zc, zc, zc, zc, zc, zc, jnp.zeros((Qc,), bool)),
        (zs, zs, zs, zs, jnp.zeros((Qs,), bool)),
        jnp.eye(6), jnp.float32(0), jnp.int32(0),
    )
    it, R, t, _, min_lambda, cf_mean, _, _, _, _, n_sel_last = (
        jax.lax.while_loop(cond, body, init)
    )

    # Whole-solve divergence gate: the map refinement of one 10 Hz frame is
    # a small correction on top of the odometry prior. A solve that landed
    # meters/tens-of-degrees away is divergence (degenerate submap, bad
    # correspondences) — keep the prior instead so garbage never enters the
    # keyframe store / submap cache downstream.
    dR_corr, dt_corr = se3.relative(R0, t0, R, t)
    corr_rot = jnp.linalg.norm(se3.log_so3(dR_corr))
    corr_trans = jnp.linalg.norm(dt_corr)
    rejected = (corr_rot > m.reject_rot_deg * jnp.pi / 180.0) | (
        corr_trans > m.reject_trans
    )
    R = jnp.where(rejected, R0, R)
    t = jnp.where(rejected, t0, t)

    diag = MapDiag(
        iterations=it,
        min_lambda=min_lambda,
        cf_mean=cf_mean,
        degenerate=min_lambda < m.eigen_threshold,
        n_corner=jnp.sum(corner_mask),
        n_surf=jnp.sum(surf_mask),
        rejected=rejected,
        n_submap_corner=jnp.sum(submap.corner_mask).astype(jnp.int32),
        n_submap_surf=jnp.sum(submap.surf_mask).astype(jnp.int32),
        n_sel=n_sel_last,
    )
    return R, t, diag


def map_prior(R_map_prev, t_map_prev, R_odom_prev, t_odom_prev, R_odom, t_odom):
    """Initial mapping guess from the latest odometry increment.

    ≙ transformAssociateToMap (mapOptmization.cpp:458-581), which composes the
    previous map correction with the new odometry delta via euler closed
    forms; here simply T_map_prior = T_map_prev ∘ (T_odom_prev⁻¹ ∘ T_odom)."""
    Rd, td = se3.relative(R_odom_prev, t_odom_prev, R_odom, t_odom)
    return se3.compose(R_map_prev, t_map_prev, Rd, td)

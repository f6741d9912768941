"""Loop-closure geometric verification: device-side point-to-point ICP.

Replaces PCL's `IterativeClosestPoint` used by `performLoopClosure`
(`mapOptmization.cpp:1000-1015`, 100 iterations, max correspondence distance
100, fitness = mean squared correspondence distance). Candidate *detection*
(radius + 30 s age gate over keyframe positions, `detectLoopClosure`
:894-981) is a host-side numpy scan in the pipeline — it is O(N) over a few
thousand keyframes.

The ICP inner loop is one jitted while_loop: NN correspondences from an
MXU-tiled top-1 search, rigid update from the closed-form weighted SVD
(Kabsch) — no per-point Python.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .math import se3
from .ops.knn import chunked_top_k


class ICPResult(NamedTuple):
    R: jax.Array  # (3,3) source -> target alignment
    t: jax.Array  # (3,)
    fitness: jax.Array  # mean squared correspondence distance
    converged: jax.Array
    iterations: jax.Array
    # Fraction of valid source points with a correspondence inside max_corr
    # at the final iterate: partial-overlap false positives (two different
    # walls glued together) show high fitness-only plausibility but low
    # coverage — gate on this too (pipeline._try_loop_closure).
    inlier_frac: jax.Array


def icp_point2point(
    src,  # (S, 3) source cloud (latest keyframe, map frame)
    src_mask,
    tgt,  # (T, 3) target cloud (history submap, map frame)
    tgt_mask,
    cfg: LegoLoamConfig,
    R0=None,
    t0=None,
    max_iters: int | None = None,
    max_corr: float | None = None,
) -> ICPResult:
    m = cfg.mapping
    max_iters = max_iters or m.icp_max_iterations
    max_d2 = (max_corr or m.icp_max_corr_dist) ** 2
    R0 = jnp.eye(3) if R0 is None else R0
    t0 = jnp.zeros(3) if t0 is None else t0

    def cond(state):
        it, _, _, done, _, _ = state
        return (it < max_iters) & ~done

    def body(state):
        it, R, t, _, _, _ = state
        p = src @ R.T + t
        idx, d2 = chunked_top_k(p, src_mask, tgt, tgt_mask, 1)
        d2 = d2[:, 0]
        q = tgt[idx[:, 0]]
        w = (src_mask & (d2 < max_d2)).astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)

        # Kabsch on correspondences
        mu_p = jnp.sum(p * w[:, None], axis=0) / wsum
        mu_q = jnp.sum(q * w[:, None], axis=0) / wsum
        P = (p - mu_p) * w[:, None]
        Q = q - mu_q
        H = P.T @ Q
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d, d]))
        dR = Vt.T @ D @ U.T
        dt = mu_q - dR @ mu_p

        R_new = dR @ R
        t_new = dR @ t + dt

        fit = jnp.sum(d2 * w) / wsum
        frac = jnp.sum(w) / jnp.maximum(jnp.sum(src_mask), 1)
        step = jnp.linalg.norm(dt) + jnp.linalg.norm(se3.log_so3(dR))
        # 0.1 mm step = converged for 0.2 m-leaf clouds (1e-6 made every
        # loop attempt burn its full iteration budget — measured 30/30
        # iterations and 440 ms per attempt on the campus run).
        done = step < 1e-4
        return it + 1, R_new, t_new, done, fit, frac

    it, R, t, done, fit, frac = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), R0, t0, jnp.bool_(False), jnp.float32(jnp.inf),
         jnp.float32(0)),
    )
    return ICPResult(
        R=R, t=t, fitness=fit,
        converged=fit < m.history_keyframe_fitness_score, iterations=it,
        inlier_frac=frac,
    )


def coarse_align_2d(
    src_xyz,  # (S, 3) structure points, cur-keyframe-centered
    src_mask,
    tgt_xyz,  # (T, 3) structure points, cand-keyframe-centered
    tgt_mask,
    n_yaw: int = 21,
    yaw_step: float = 1.5 * jnp.pi / 180.0,
    extent: float = 24.0,
    cell: float = 0.5,
    search: float = 12.0,
):
    """Coarse (yaw, dx, dy) alignment by 2-D occupancy correlation.

    Loop-closure ICP from identity fails once inter-lap drift exceeds the
    local structure scale: surf clouds are ground-dominated (laterally
    uninformative NN matches) and corner clouds are too sparse for wide
    basins (measured fitness 60-500 at 4 m true offsets). A dense global
    translation/yaw search has no basin problem: rasterize both structure
    clouds into occupancy grids and take the correlation argmax over
    +-search meters x n_yaw yaw hypotheses — one conv per yaw on the MXU.
    No reference equivalent (PCL ICP from identity, mapOptmization.cpp:
    1000-1015 — and its loop closure ships disabled).

    Returns (dx, dy, yaw, score): apply Rz(yaw) about the src center then
    translate by (dx, dy) to best overlay src onto tgt."""
    N = int(round(2 * extent / cell))
    S = int(round(search / cell))

    def grid_of(xy, mask):
        ij = jnp.floor((xy + extent) / cell).astype(jnp.int32)
        ok = mask & jnp.all((ij >= 0) & (ij < N), axis=-1)
        flat = jnp.where(ok, ij[:, 1] * N + ij[:, 0], N * N)
        g = jnp.zeros((N * N + 1,), jnp.float32).at[flat].max(
            ok.astype(jnp.float32)
        )
        return g[: N * N].reshape(N, N)

    tgt_g = grid_of(tgt_xyz[:, :2], tgt_mask)
    # 3x3 dilation: tolerate half-cell rasterization misalignment (an edge
    # landing one cell over would otherwise score zero).
    tgt_g = jax.lax.reduce_window(
        tgt_g, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )

    yaws = (jnp.arange(n_yaw) - (n_yaw - 1) / 2.0) * yaw_step

    def src_grid(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        xr = c * src_xyz[:, 0] - s * src_xyz[:, 1]
        yr = s * src_xyz[:, 0] + c * src_xyz[:, 1]
        return grid_of(jnp.stack([xr, yr], axis=-1), src_mask)

    src_gs = jax.vmap(src_grid)(yaws)  # (n_yaw, N, N)

    # Correlation over integer shifts as ONE matmul: an N x N kernel fed to
    # XLA's conv lowers to per-shift dot products of tiny operands (measured
    # 116 ms per attempt); instead gather the (2S+1)^2 shifted target
    # windows into an im2col matrix and hit the MXU once —
    # scores[d, yaw] = vec(tgt_window_d) . vec(src_yaw).
    tp = jnp.pad(tgt_g, S)
    win_rows = jnp.arange(2 * S + 1)[:, None] + jnp.arange(N)[None, :]
    rw = tp[win_rows]  # (2S+1, N, N+2S)
    cw = rw[:, :, win_rows]  # (2S+1, N, 2S+1, N)
    W = cw.transpose(0, 2, 1, 3).reshape((2 * S + 1) ** 2, N * N)
    scores = (W @ src_gs.reshape(n_yaw, -1).T).T.reshape(
        n_yaw, 2 * S + 1, 2 * S + 1
    )
    flat_idx = jnp.argmax(scores)
    iy = flat_idx // ((2 * S + 1) * (2 * S + 1))
    rem = flat_idx % ((2 * S + 1) * (2 * S + 1))
    r = rem // (2 * S + 1)
    c_ = rem % (2 * S + 1)
    # conv output index (r, c) corresponds to shifting src by
    # d = (r - S, c - S) cells in (row=y, col=x)
    dy = (r - S).astype(jnp.float32) * cell
    dx = (c_ - S).astype(jnp.float32) * cell
    # Normalizer: occupied src cells (a whole vertical edge is ONE xy cell,
    # so raw scores are small — gate on the matched FRACTION).
    c0, s0 = jnp.cos(yaws[iy]), jnp.sin(yaws[iy])
    xr = c0 * src_xyz[:, 0] - s0 * src_xyz[:, 1]
    yr = s0 * src_xyz[:, 0] + c0 * src_xyz[:, 1]
    n_src = jnp.sum(grid_of(jnp.stack([xr, yr], axis=-1), src_mask))
    return dx, dy, yaws[iy], scores.reshape(-1)[flat_idx], n_src


def compute_loopinfo(kf_t, kf_time, n_kf, t_query, cfg: LegoLoamConfig):
    """Device-side loop-candidate detection over the keyframe ring store.

    ≙ detectLoopClosure's kd-tree radius + age search (mapOptmization.cpp:
    906-935) — here one O(K) masked argmin per chunk, computed INSIDE the
    chunk program so the steady state costs zero host syncs (the host reads
    the packed result one check later, when the producing chunk has long
    finished). Returns a packed (4,) float32
    [cand_slot, cand_dist, n_kf, cur_slot] (slots exact in f32 below 2^24)."""
    K = kf_t.shape[0]
    m = cfg.mapping
    f32 = jnp.float32
    active = jnp.arange(K) < n_kf
    cur_slot = jnp.where(n_kf > 0, (n_kf - 1) % K, 0)
    t_now = kf_time[cur_slot]
    eligible = active & ((t_now - kf_time) > m.loop_time_gap)
    d = jnp.linalg.norm(kf_t - t_query[None, :], axis=1)
    d = jnp.where(eligible, d, jnp.inf)
    cand_slot = jnp.argmin(d)
    return jnp.stack(
        [
            cand_slot.astype(f32),
            d[cand_slot],
            n_kf.astype(f32),
            cur_slot.astype(f32),
        ]
    )


def attempt_loop_closure(
    kf_R,  # (K, 3, 3) keyframe ring store
    kf_t,  # (K, 3)
    kf_corner,  # (K, Nc, 3) sensor-frame corner clouds
    kf_corner_mask,  # (K, Nc)
    kf_surf,  # (K, Ns, 3)
    kf_surf_mask,  # (K, Ns)
    cand_slot,  # () int32 candidate keyframe slot
    cur_slot,  # () int32 current keyframe slot
    n_kf,  # () int32 total appended at detection time
    cfg: LegoLoamConfig,
):
    """One fused loop-closure attempt: coarse 2-D align -> gates -> surf ICP
    -> gates -> relative between-factor. ≙ performLoopClosure
    (mapOptmization.cpp:983-1094), restructured as ONE device program so the
    pipeline can dispatch it asynchronously and read the verdict a check
    later — no blocking device_get between the stages.

    Returns (flags, R_rel, t_rel): flags is a packed (8,) float32
    [accepted, i_abs, j_abs, fitness, coarse_score, coarse_frac, icp_iters,
    inlier_frac]; ids are ABSOLUTE keyframe ids (survive ring motion)."""
    m = cfg.mapping
    K = kf_t.shape[0]
    A_live = jnp.minimum(n_kf, K)
    start = jnp.where(n_kf > K, n_kf % K, 0)
    li_cand = (cand_slot - start) % K
    li_cur = (cur_slot - start) % K
    h = m.history_keyframe_search_num // 2
    win = jnp.clip(
        li_cand - h + jnp.arange(2 * h + 1), 0, jnp.maximum(A_live - 1, 0)
    )
    idx = (start + win) % K

    c_cur = kf_t[cur_slot]
    c_cand = kf_t[cand_slot]
    cur_R = kf_R[cur_slot]
    cand_R = kf_R[cand_slot]

    # Stage 1: global (yaw, dx, dy) from occupancy correlation of the CORNER
    # (structure) clouds, both centered on their keyframes.
    tgt_c = jnp.einsum("kij,knj->kni", kf_R[idx], kf_corner[idx]) + (
        kf_t[idx] - c_cand[None]
    )[:, None, :]
    src_c = jnp.einsum("ij,nj->ni", cur_R, kf_corner[cur_slot])
    dx, dy, yaw, score, n_src = coarse_align_2d(
        src_c,
        kf_corner_mask[cur_slot],
        tgt_c.reshape(-1, 3),
        kf_corner_mask[idx].reshape(-1),
        n_yaw=m.loop_coarse_n_yaw,
        yaw_step=m.loop_coarse_yaw_step_deg * jnp.pi / 180.0,
        extent=m.loop_coarse_extent,
        cell=m.loop_coarse_cell,
        search=m.loop_coarse_search,
    )
    frac = score / jnp.maximum(n_src, 1.0)
    pass1 = (score >= m.loop_coarse_min_score) & (
        frac >= m.loop_coarse_min_frac
    )

    st = max(m.loop_icp_src_stride, 1)
    src_s = (
        jnp.einsum("ij,nj->ni", cur_R, kf_surf[cur_slot, ::st]) + c_cur[None, :]
    )
    src_s_mask = kf_surf_mask[cur_slot, ::st]

    def do_icp(_):
        # Stage 2: surf ICP from the coarse init with a tight gate.
        tgt_s = (
            jnp.einsum("kij,knj->kni", kf_R[idx], kf_surf[idx])
            + kf_t[idx][:, None, :]
        )
        tgt_s_mask = kf_surf_mask[idx]
        # dz from the ground-dominated surf mean-z gap (yaw about z keeps z)
        ns = jnp.maximum(jnp.sum(src_s_mask), 1)
        nt = jnp.maximum(jnp.sum(tgt_s_mask), 1)
        dz = (
            jnp.sum(
                jnp.where(
                    tgt_s_mask.reshape(-1), tgt_s.reshape(-1, 3)[:, 2], 0.0
                )
            )
            / nt
            - jnp.sum(jnp.where(src_s_mask, src_s[:, 2], 0.0)) / ns
        )
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        R0 = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
        t0 = c_cand + jnp.stack([dx, dy, dz]) - R0 @ c_cur
        return icp_point2point(
            src_s,
            src_s_mask,
            tgt_s.reshape(-1, 3),
            tgt_s_mask.reshape(-1),
            cfg,
            R0,
            t0,
            max_iters=m.loop_icp_max_iterations,
            max_corr=m.loop_icp_corr_dist,
        )

    def skip(_):
        return ICPResult(
            R=jnp.eye(3),
            t=jnp.zeros(3),
            fitness=jnp.float32(jnp.inf),
            converged=jnp.bool_(False),
            iterations=jnp.int32(0),
            inlier_frac=jnp.float32(0.0),
        )

    res = jax.lax.cond(pass1, do_icp, skip, None)

    gate = min(
        m.history_keyframe_fitness_score,
        m.loop_fitness_leaf_scale * cfg.features.less_flat_leaf ** 2,
    )
    accepted = (
        pass1
        & (res.fitness <= gate)
        & (res.inlier_frac >= m.loop_min_inlier_frac)
    )

    Rc = res.R @ cur_R
    tc = res.R @ c_cur + res.t
    R_rel = cand_R.T @ Rc
    t_rel = cand_R.T @ (tc - c_cand)
    R_rel = jnp.where(accepted, R_rel, jnp.eye(3))
    t_rel = jnp.where(accepted, t_rel, 0.0)

    base = n_kf - A_live
    f32 = jnp.float32
    flags = jnp.stack(
        [
            accepted.astype(f32),
            (base + li_cand).astype(f32),
            (base + li_cur).astype(f32),
            res.fitness,
            score,
            frac,
            res.iterations.astype(f32),
            res.inlier_frac,
        ]
    )
    return flags, R_rel, t_rel


def detect_loop_candidate(
    positions, times, n_active, cur_idx, cfg: LegoLoamConfig,
    return_dist: bool = False,
):
    """Host-side candidate pick (numpy semantics; callable with numpy arrays).

    ≙ detectLoopClosure: nearest keyframe within
    history_keyframe_search_radius whose timestamp is > loop_time_gap older
    (mapOptmization.cpp:906-935). Returns index or -1; with return_dist also
    the nearest time-eligible candidate's distance (inf if none) for the
    per-check diagnostic trail."""
    import numpy as np

    m = cfg.mapping
    if n_active < 2:
        return (-1, float("inf")) if return_dist else -1
    pos = positions[:n_active]
    cur = positions[cur_idx]
    d = np.linalg.norm(pos - cur[None, :], axis=1)
    old = (times[cur_idx] - times[:n_active]) > m.loop_time_gap
    eligible = np.where(old)[0]
    nearest = float(d[eligible].min()) if len(eligible) else float("inf")
    cand = eligible[d[eligible] < m.history_keyframe_search_radius]
    if len(cand) == 0:
        return (-1, nearest) if return_dist else -1
    best = int(cand[np.argmin(d[cand])])
    return (best, nearest) if return_dist else best

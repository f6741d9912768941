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


def icp_point2point(
    src,  # (S, 3) source cloud (latest keyframe, map frame)
    src_mask,
    tgt,  # (T, 3) target cloud (history submap, map frame)
    tgt_mask,
    cfg: LegoLoamConfig,
    R0=None,
    t0=None,
    max_iters: int | None = None,
) -> ICPResult:
    m = cfg.mapping
    max_iters = max_iters or min(m.icp_max_iterations, 50)
    max_d2 = m.icp_max_corr_dist ** 2
    R0 = jnp.eye(3) if R0 is None else R0
    t0 = jnp.zeros(3) if t0 is None else t0

    def cond(state):
        it, _, _, done, _ = state
        return (it < max_iters) & ~done

    def body(state):
        it, R, t, _, _ = state
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
        step = jnp.linalg.norm(dt) + jnp.linalg.norm(se3.log_so3(dR))
        done = step < 1e-6
        return it + 1, R_new, t_new, done, fit

    it, R, t, done, fit = jax.lax.while_loop(
        cond, body, (jnp.int32(0), R0, t0, jnp.bool_(False), jnp.float32(jnp.inf))
    )
    return ICPResult(R=R, t=t, fitness=fit, converged=fit < m.history_keyframe_fitness_score, iterations=it)


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

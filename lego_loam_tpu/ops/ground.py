"""Ground segmentation — upstream slope test and the fork's "Ours" algorithm.

TPU-native rewrite of `ImageProjection::groundRemoval` (`imageProjection.cpp:
447-520`) and `groundRemovalOurs` (`:522-774`). The per-column sequential
reference-vector iteration becomes a `lax.scan` over the H rows with all W
columns vectorized; the sequential ADD sweeps become boolean-semiring
associative scans (log-depth instead of 1800 serial steps); the ELEVATION
carry across columns becomes a forward-fill; the near-field PCL RANSAC plane
recovery becomes a vectorized hypothesis-sampling RANSAC.

Ground codes (matching `_ground_mat`): -1 invalid, 0 non-ground, 1 ground,
2 unknown (above first obstacle, pending re-admission).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LegoLoamConfig
from ..types import ScanGrid


def ground_removal_upstream(grid: ScanGrid, cfg: LegoLoamConfig) -> jax.Array:
    """Per-column vertical-angle test between adjacent rows (rows 0..gsi).

    ≙ `groundRemoval` imageProjection.cpp:447-520. Returns (H, W) int8."""
    H, W = grid.range.shape
    gsi = cfg.laser.ground_scan_index
    xyz, valid = grid.xyz, grid.valid

    d = xyz[1:, :, :] - xyz[:-1, :, :]  # (H-1, W, 3)
    dxy = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2 + d[..., 2] ** 2)
    vert_angle = jnp.arctan2(d[..., 2], dxy)
    pair_ok = valid[1:, :] & valid[:-1, :]
    is_flat = pair_ok & (
        (vert_angle - cfg.laser.sensor_mount_angle)
        <= cfg.ground.upstream_angle_threshold
    )

    row_in_band = (jnp.arange(H - 1) < gsi)[:, None]
    flat_band = is_flat & row_in_band
    ground = jnp.zeros((H, W), jnp.bool_)
    ground = ground.at[:-1, :].set(flat_band)
    ground = ground.at[1:, :].set(ground[1:, :] | flat_band)

    invalid_pair = (~pair_ok) & row_in_band
    code = jnp.where(ground, 1, 0).astype(jnp.int8)
    code = code.at[:-1, :].set(
        jnp.where(invalid_pair & (code[:-1, :] == 0), -1, code[:-1, :])
    )
    return jnp.where(grid.valid, code, jnp.int8(-1))


def _main_pass(grid: ScanGrid, cfg: LegoLoamConfig) -> jax.Array:
    """Column-wise reference-vector iteration (imageProjection.cpp:531-608).

    lax.scan over rows; the carry holds, per column, the running reference
    vector, the previous accepted point, and whether the column is seeded.
    """
    H, W = grid.range.shape
    g = cfg.ground
    xyz, valid = grid.xyz, grid.valid

    if cfg.laser.use_kitti:
        thr_per_row = jnp.where(
            jnp.arange(H) < 16, g.angle_threshold_low, g.angle_threshold
        )
    else:
        thr_per_row = jnp.full((H,), g.angle_threshold)

    def step(carry, inp):
        rv, lower, seeded = carry  # rv (W,3), lower (W,3), seeded (W,)
        p, ok, thr = inp  # p (W,3), ok (W,), thr ()

        depth0 = jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
        init_rv = jnp.stack(
            [
                p[:, 0] / jnp.maximum(depth0, 1e-9),
                p[:, 1] / jnp.maximum(depth0, 1e-9),
                jnp.zeros_like(depth0),
            ],
            axis=-1,
        )

        tv = p - lower
        tv_n = jnp.linalg.norm(tv, axis=-1)
        rv_n = jnp.linalg.norm(rv, axis=-1)
        cosang = jnp.sum(tv * rv, axis=-1) / jnp.maximum(tv_n * rv_n, 1e-12)
        angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        accept = angle <= thr

        first = ok & ~seeded
        cont = ok & seeded

        code = jnp.where(
            first, jnp.int8(1), jnp.where(cont, jnp.where(accept, 1, 0), -1)
        ).astype(jnp.int8)

        rv_next = jnp.where(
            first[:, None], init_rv, jnp.where((cont & accept)[:, None], rv + tv, rv)
        )
        lower_next = jnp.where(ok[:, None], p, lower)
        seeded_next = seeded | ok
        return (rv_next, lower_next, seeded_next), code

    init = (
        jnp.zeros((W, 3)),
        jnp.zeros((W, 3)),
        jnp.zeros((W,), jnp.bool_),
    )
    _, codes = jax.lax.scan(step, init, (xyz, valid, thr_per_row))
    return codes  # (H, W) int8


def _filter_pass(code: jax.Array) -> jax.Array:
    """Above the first obstacle in each column, ground(1) -> unknown(2).

    ≙ imageProjection.cpp:620-628. `seen_obstacle` is a running OR down the
    rows — a cumulative max, no scan needed."""
    obstacle = (code == 0).astype(jnp.int32)
    seen = jnp.cumsum(obstacle, axis=0) > 0
    # A row's own obstacle triggers for rows strictly after it; the row where
    # code==0 stays 0 anyway, so >0 on the inclusive cumsum is equivalent.
    return jnp.where(seen & (code == 1), jnp.int8(2), code)


def _add_gate(grid: ScanGrid, code: jax.Array, shift: int, cfg: LegoLoamConfig):
    """Geometric re-admission gate vs the neighbor `shift` columns away.

    ≙ dr <= 0.061*r, dz <= 0.1 (imageProjection.cpp:644-647)."""
    g = cfg.ground
    xyz = grid.xyz
    nei = jnp.roll(xyz, shift, axis=1)
    d = xyz - nei
    dr = jnp.linalg.norm(d, axis=-1)
    r = jnp.linalg.norm(xyz, axis=-1)
    return (dr <= g.add_dr_ratio * r) & (d[..., 2] <= g.add_dz_max)


def _bool_affine_scan(orig1, gate, reverse):
    """Propagate ground membership along columns through gated 2-cells.

    Solves s[j] = orig1[j] | (gate[j] & (s[j-1] | s[j-2])) for all j in
    log-depth with an associative scan over 3x3 boolean-semiring matrices.
    (The reference does this with a serial left-to-right then right-to-left
    sweep, imageProjection.cpp:631-671.)
    """
    H, W = orig1.shape
    gm = gate & ~orig1  # only 2-cells propagate through the gate
    # state vector [s_j, s_{j-1}, 1]; M rows produce [s_j, s_{j-1}, 1] from
    # [s_{j-1}, s_{j-2}, 1].
    M = jnp.zeros((H, W, 3, 3), jnp.bool_)
    M = M.at[..., 0, 0].set(gm)
    M = M.at[..., 0, 1].set(gm)
    M = M.at[..., 0, 2].set(orig1)
    M = M.at[..., 1, 0].set(True)
    M = M.at[..., 2, 2].set(True)

    def combine(a, b):
        # boolean matmul (b @ a): b is the later element in scan order
        return jnp.any(b[..., :, :, None] & a[..., None, :, :], axis=-2)

    P = jax.lax.associative_scan(combine, M, axis=1, reverse=reverse)
    # initial state [0, 0, 1] -> s_j = P[..., 0, 2]
    return P[..., 0, 2]


def _add_pass(grid: ScanGrid, code: jax.Array, cfg: LegoLoamConfig) -> jax.Array:
    """Bidirectional neighbor re-admission of unknown(2) cells.

    ≙ imageProjection.cpp:631-671. The serial sweeps admit a 2-cell when
    either of its two predecessor columns is ground (original or newly
    admitted) and the dr/dz gates pass; we run the same recurrence as an
    associative scan in each direction and OR the results."""
    is2 = code == 2
    orig1 = code == 1

    gate_l = is2 & _add_gate(grid, code, 2, cfg)
    s_l = _bool_affine_scan(orig1, gate_l, reverse=False)
    gate_r = is2 & _add_gate(grid, code, -2, cfg)
    s_r = _bool_affine_scan(orig1, gate_r, reverse=True)

    admitted = is2 & (s_l | s_r)
    return jnp.where(admitted, jnp.int8(1), code)


def _elevation_pass(grid: ScanGrid, code: jax.Array, cfg: LegoLoamConfig) -> jax.Array:
    """Height-gate unknown cells against the last confirmed ground height.

    ≙ imageProjection.cpp:673-698: per column take the topmost ground z; if
    the column has >=5 ground cells it updates the running height, carried
    left-to-right across columns (forward fill)."""
    g = cfg.ground
    H, W = code.shape
    is1 = code == 1
    gnum = jnp.sum(is1, axis=0)  # (W,)
    rows = jnp.arange(H)[:, None]
    top_row = jnp.max(jnp.where(is1, rows, -1), axis=0)  # (W,)
    z_top = grid.xyz[jnp.clip(top_row, 0, H - 1), jnp.arange(W), 2]

    has = gnum >= g.elevation_min_ground_count
    # forward fill z_top where has, seeded with init height
    idx = jnp.where(has, jnp.arange(W), -1)
    last = jax.lax.cummax(idx)
    ele_h = jnp.where(last >= 0, z_top[jnp.clip(last, 0, W - 1)], g.elevation_init_height)

    is2 = code == 2
    pass_gate = grid.xyz[..., 2] < (ele_h[None, :] + g.elevation_margin)
    return jnp.where(is2, jnp.where(pass_gate, jnp.int8(1), jnp.int8(0)), code)


def _plane_from_3(p):
    """p: (..., 3, 3) -> unit normal (...,3), offset (...,)."""
    n = jnp.cross(p[..., 1, :] - p[..., 0, :], p[..., 2, :] - p[..., 0, :])
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-12)
    d = -jnp.sum(n * p[..., 0, :], axis=-1)
    return n, d


def _near_pass(
    grid: ScanGrid, code: jax.Array, cfg: LegoLoamConfig, key: jax.Array
) -> jax.Array:
    """Near-field RANSAC plane recovery (imageProjection.cpp:700-735).

    Ground cells with planar depth<=5 m are demoted, then re-admitted if they
    are inliers of the dominant plane fit over ground cells with depth<=10 m.
    """
    g = cfg.ground
    H, W = code.shape
    xyz = grid.xyz.reshape(-1, 3)
    flat_code = code.reshape(-1)
    depth = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    cand = (flat_code == 1) & (depth <= g.near_depth_max) & grid.valid.reshape(-1)
    near = cand & (depth <= g.near_reset_depth)

    n_iters = g.ransac_iterations
    # Random 3-subsets of candidate cells: per hypothesis, take top-3 by a
    # masked random score (uniform over candidates).
    scores = jax.random.uniform(key, (n_iters, cand.shape[0]))
    scores = jnp.where(cand[None, :], scores, -1.0)
    _, top_idx = jax.lax.top_k(scores, 3)  # (n_iters, 3)
    tri = xyz[top_idx]  # (n_iters, 3, 3)
    n, d = _plane_from_3(tri)

    dist = jnp.abs(xyz @ n.T + d[None, :])  # (HW, n_iters)
    inl = (dist <= g.ransac_distance_threshold) & cand[:, None]
    counts = jnp.sum(inl, axis=0)
    best = jnp.argmax(counts)
    best_inlier = inl[:, best]

    out = jnp.where(near, jnp.int8(0), flat_code)
    out = jnp.where(near & best_inlier, jnp.int8(1), out)
    return out.reshape(H, W)


def ground_removal_ours(
    grid: ScanGrid, cfg: LegoLoamConfig, key: jax.Array | None = None
) -> jax.Array:
    """Full fork ground pipeline: MAIN -> Filter -> ADD -> ELEVATION -> NEAR.

    ≙ `groundRemovalOurs` imageProjection.cpp:522-774. Returns (H, W) int8
    with codes {-1, 0, 1} (unknowns resolved by the ELEVATION pass)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    code = _main_pass(grid, cfg)
    code = _filter_pass(code)
    code = _add_pass(grid, code, cfg)
    code = _elevation_pass(grid, code, cfg)
    code = _near_pass(grid, code, cfg, key)
    return jnp.where(grid.valid, code, jnp.int8(-1))


def apply_ground(grid: ScanGrid, cfg: LegoLoamConfig, key=None) -> ScanGrid:
    if cfg.ground.use_ours:
        code = ground_removal_ours(grid, cfg, key)
    else:
        code = ground_removal_upstream(grid, cfg)
    return grid.replace(ground=code)

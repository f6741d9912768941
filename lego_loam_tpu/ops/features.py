"""Feature extraction: curvature, occlusion, edge/planar picking, shadows.

TPU-native rewrite of the FeatureAssociation feature path
(`featureAssociation.cpp:791-1316`): everything operates on the per-row packed
SegmentedScan layout with masks, so the whole stage is one fused jitted
program. The reference's sequential pick-then-suppress sweeps become local
extremum non-maximum suppression over the same windows (parallel; selects the
same local-extremum features, without the greedy tail).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..config import LegoLoamConfig
from ..types import FeatureCloud, ScanFeatures, SegmentedScan
from .dbscan import dbscan_edge_filter
from .voxel import voxel_downsample_masked

_BIG = np.float32(1e9)  # np: module-level jnp constants init the backend at import


def curvature_ours(seg: SegmentedScan, cfg: LegoLoamConfig):
    """3-D 11-point Laplacian norm normalized by range, /10.

    ≙ `calculateSmoothnessOurs` featureAssociation.cpp:817-848. Neighbors are
    the 5 packed points either side within the row. Returns (H, W) curvature
    and (H, W) computable mask."""
    xyz = seg.xyz
    H, W = seg.range.shape
    acc = -11.0 * xyz
    for k in range(-5, 6):
        acc = acc + jnp.roll(xyz, -k, axis=1)
    diff = jnp.linalg.norm(acc, axis=-1)
    rng = jnp.linalg.norm(xyz, axis=-1)
    c = diff / jnp.maximum(rng, 1e-6) / 10.0

    idx = jnp.arange(W)[None, :]
    in_window = (idx >= 5) & (idx < seg.count[:, None] - 5)
    return jnp.where(in_window & seg.valid, c, 0.0), in_window & seg.valid


def curvature_upstream(seg: SegmentedScan, cfg: LegoLoamConfig):
    """Range-difference curvature (sum of 10 neighbor ranges - 10 r_i)^2.

    ≙ `calculateSmoothness` featureAssociation.cpp:791-815."""
    rng = seg.range
    H, W = rng.shape
    acc = -10.0 * rng
    for k in range(-5, 6):
        if k == 0:
            continue
        acc = acc + jnp.roll(rng, -k, axis=1)
    c = acc * acc
    idx = jnp.arange(W)[None, :]
    in_window = (idx >= 5) & (idx < seg.count[:, None] - 5)
    return jnp.where(in_window & seg.valid, c, 0.0), in_window & seg.valid


def mark_occluded(seg: SegmentedScan, cfg: LegoLoamConfig):
    """Unpickable mask near depth discontinuities and parallel beams.

    ≙ `markOccludedPoints` featureAssociation.cpp:851-899: when adjacent
    packed points are <10 columns apart but differ >0.3 m in range, the 6
    points on the nearer side are blocked; points whose both neighbors differ
    >2% of range are blocked."""
    f = cfg.features
    rng, col = seg.range, seg.col
    d_next = jnp.roll(rng, -1, axis=1) - rng  # depth2 - depth1
    colgap = jnp.abs(jnp.roll(col, -1, axis=1) - col)
    near_pair = colgap < f.occlusion_column_gap

    # occluder on the right: depth1 - depth2 > 0.3 -> block i-5..i
    right_block = near_pair & (-d_next > f.occlusion_depth_gap)
    # occluder on the left: depth2 - depth1 > 0.3 -> block i+1..i+6
    left_block = near_pair & (d_next > f.occlusion_depth_gap)

    blocked = jnp.zeros_like(right_block)
    for k in range(0, 6):
        blocked = blocked | jnp.roll(right_block, k, axis=1)
    for k in range(1, 7):
        blocked = blocked | jnp.roll(left_block, k, axis=1)

    d_prev = jnp.abs(rng - jnp.roll(rng, 1, axis=1))
    d_nxt = jnp.abs(jnp.roll(rng, -1, axis=1) - rng)
    parallel = (d_prev > f.parallel_beam_ratio * rng) & (
        d_nxt > f.parallel_beam_ratio * rng
    )
    return (blocked | parallel) & seg.valid


def _suppression_reach(col, window: int, max_gap: int):
    """How far the pick-suppression window extends: the reference walks +-5
    packed neighbors but stops at column gaps >10 (featureAssociation.cpp:
    1186-1205). Returns boolean (H, W, 2*window+1) reach masks."""
    gaps_r = jnp.abs(jnp.roll(col, -1, axis=1) - col) > max_gap  # gap i..i+1
    reach = []
    run_ok_fwd = jnp.ones_like(col, dtype=bool)
    run_ok_bwd = jnp.ones_like(col, dtype=bool)
    for k in range(1, window + 1):
        run_ok_fwd = run_ok_fwd & ~jnp.roll(gaps_r, -(k - 1), axis=1)
        reach.append((k, run_ok_fwd))
        run_ok_bwd = run_ok_bwd & ~jnp.roll(gaps_r, k, axis=1)
        reach.append((-k, run_ok_bwd))
    return reach


def _nms_round(score, cand, col, window, max_gap, mode):
    """One round: candidates that are the window extremum among candidates."""
    filled = jnp.where(cand, score, -_BIG if mode == "max" else _BIG)
    best = filled
    for k, ok in _suppression_reach(col, window, max_gap):
        nei = jnp.roll(filled, -k, axis=1)
        nei = jnp.where(ok, nei, -_BIG if mode == "max" else _BIG)
        best = jnp.maximum(best, nei) if mode == "max" else jnp.minimum(best, nei)
    is_ext = cand & (filled == best)
    # plateau tie-break: drop later duplicates within the window
    earlier = jnp.zeros_like(is_ext)
    for k, ok in _suppression_reach(col, window, max_gap):
        if k < 0:
            nei = jnp.roll(is_ext & cand, -k, axis=1)
            same = jnp.roll(filled, -k, axis=1) == filled
            earlier = earlier | (nei & same & ok)
    return is_ext & ~earlier


def _nms_extremum(score, cand, col, window=5, max_gap=10, mode="max", rounds=2):
    """Iterated local-extremum suppression — parallel stand-in for the
    reference's greedy sort-and-suppress sweep (featureAssociation.cpp:
    1175-1206). Each round picks window extrema among remaining candidates
    and removes their suppression footprints; two rounds recover close to
    the greedy pick density (one local-max round alone is ~2x sparser)."""
    picked = jnp.zeros_like(cand)
    remaining = cand
    for _ in range(rounds):
        sel = _nms_round(score, remaining, col, window, max_gap, mode)
        picked = picked | sel
        # remove picks and their suppression reach from candidacy
        blocked = sel
        for k, ok in _suppression_reach(col, window, max_gap):
            blocked = blocked | (jnp.roll(sel, k, axis=1) & ok)
        remaining = remaining & ~blocked
    return picked


def _gather_rows(seg: SegmentedScan, pick, cap: int, extra=None):
    """Flatten row-packed picks into a fixed-capacity FeatureCloud.

    Boolean argsort = stable radix partition (fast on TPU; a cumsum+scatter
    variant serializes on duplicate overflow writes)."""
    H, W = pick.shape
    flat = pick.reshape(-1)
    order = jnp.argsort(~flat)[:cap]
    mask = flat[order]
    xyz = seg.xyz.reshape(-1, 3)[order]
    ring = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1)[order]
    rel = seg.rel_time.reshape(-1)[order]
    return FeatureCloud(
        xyz=jnp.where(mask[:, None], xyz, 0.0),
        ring=jnp.where(mask, ring, -1).astype(jnp.int32),
        rel_time=jnp.where(mask, rel, 0.0),
        mask=mask,
    )


def shadow_points(cfg: LegoLoamConfig) -> jax.Array:
    """Virtual floor grid under the robot (featureAssociation.cpp:412-450).

    Reference builds it in LOAM camera axes; here directly in the lidar frame
    (x fwd, y left, z up): a shadow_rows x shadow_cols grid ~8.5 cm below the
    sensor, FoV-shaped by the atan2 spans, offset by the lidar->body lever
    (0.008, 0, -0.035)."""
    import numpy as np

    f = cfg.features
    row_angle = (np.arctan2(0.120, 0.05) * 2) / (f.shadow_rows - 1)
    col_angle = (np.arctan2(0.077, 0.05) * 2) / (f.shadow_cols - 1)
    r = np.arange(f.shadow_rows)
    c = np.arange(f.shadow_cols)
    row_x = 0.05 * np.tan(((f.shadow_rows - 1) / 2.0) * row_angle - r * row_angle)
    col_y = 0.05 * np.tan(((f.shadow_cols - 1) / 2.0) * col_angle - c * col_angle)
    x = np.broadcast_to(row_x[:, None], (f.shadow_rows, f.shadow_cols)) + 0.008
    y = np.broadcast_to(col_y[None, :], (f.shadow_rows, f.shadow_cols)) + 0.0
    z = np.full_like(x, -(0.035 + 0.05) - 0.035)
    return jnp.asarray(
        np.stack([x, y, z], axis=-1).reshape(-1, 3), jnp.float32
    )


def _sector_rank(score, pick, count, n_sectors, descending=True):
    """Rank picked points by score within each (row, sector) segment.

    ≙ the reference's per-sector sort + capped take
    (featureAssociation.cpp:910-941). Returns (H, W) int32 rank (0 = best),
    W for unpicked."""
    H, W = score.shape
    pos = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
    sec = jnp.clip(
        (pos * n_sectors) // jnp.maximum(count[:, None], 1), 0, n_sectors - 1
    )
    key_score = jnp.where(pick, score if descending else -score, -_BIG)
    # curvature order first (stable argsorts compose to lexsort)
    perm1 = jnp.argsort(-key_score, axis=1)
    sec_p = jnp.take_along_axis(sec, perm1, axis=1)
    pick_p = jnp.take_along_axis(pick, perm1, axis=1)
    # group by sector, keeping curvature order within (argsort is stable)
    perm2 = jnp.argsort(jnp.where(pick_p, sec_p, n_sectors), axis=1)
    final = jnp.take_along_axis(perm1, perm2, axis=1)  # original cols ordered
    sec_f = jnp.take_along_axis(sec, final, axis=1)
    pick_f = jnp.take_along_axis(pick, final, axis=1)
    sec_f = jnp.where(pick_f, sec_f, n_sectors)
    new_seg = jnp.concatenate(
        [jnp.ones((H, 1), bool), sec_f[:, 1:] != sec_f[:, :-1]], axis=1
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, pos, 0), axis=1
    )
    rank_sorted = pos - seg_start
    # scatter rank back to original columns
    rank = jnp.zeros((H, W), jnp.int32).at[
        jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)), final
    ].set(jnp.where(pick_f, rank_sorted, W))
    return rank


def extract_features(seg: SegmentedScan, cfg: LegoLoamConfig) -> ScanFeatures:
    """Feature picking. `use_ours` selects the fork's active variant
    (whole-ring picking, unlimited flats, DBSCAN-refined sharp corners,
    shadow points — ≙ `extractFeaturesOurs` featureAssociation.cpp:1159-1316);
    otherwise the upstream per-sector capped picking (2 sharp / 20 less-sharp
    / 4 flat per ring sector, ≙ `extractFeatures` :901-1022)."""
    f = cfg.features
    if f.use_ours:
        curv, computable = curvature_ours(seg, cfg)
    else:
        curv, computable = curvature_upstream(seg, cfg)
    occluded = mark_occluded(seg, cfg)
    pickable = computable & ~occluded

    edge_cand = pickable & (curv > f.edge_threshold) & ~seg.ground
    flat_cand = pickable & (curv < f.surf_threshold) & seg.ground

    edge_pick = _nms_extremum(curv, edge_cand, seg.col, mode="max")
    flat_pick = _nms_extremum(curv, flat_cand, seg.col, mode="min")

    if not f.use_ours:
        # Upstream caps per ring sector
        e_rank = _sector_rank(curv, edge_pick, seg.count, f.num_sectors, True)
        f_rank = _sector_rank(curv, flat_pick, seg.count, f.num_sectors, False)
        sharp_pick = edge_pick & (e_rank < f.max_sharp_per_sector)
        edge_pick = edge_pick & (e_rank < f.max_less_sharp_per_sector)
        flat_pick = flat_pick & (f_rank < f.max_flat_per_sector)

    less_sharp = _gather_rows(seg, edge_pick, f.max_corner_less_sharp)
    flat = _gather_rows(seg, flat_pick, f.max_surf_flat)

    if f.use_ours:
        # Sharp corners: DBSCAN clusters of less-sharp with >= min_cluster
        sharp_keep = dbscan_edge_filter(less_sharp, cfg)
        sharp = FeatureCloud(
            xyz=less_sharp.xyz,
            ring=less_sharp.ring,
            rel_time=less_sharp.rel_time,
            mask=less_sharp.mask & sharp_keep,
        )
    else:
        sharp = _gather_rows(seg, sharp_pick, f.max_corner_sharp)

    # Less-flat: everything not picked as an edge, voxel-downsampled 0.2 m.
    # ring/rel_time ride the voxel reduction as pooled attribute channels —
    # indexing the pre-DS rows with post-DS positions would scramble the
    # per-point sweep times the odometry warp depends on. Ground and
    # structure are pooled in SEPARATE populations (see
    # ScanFeatures.surf_ground) and concatenated for the mapping cloud.
    less_flat_src = seg.valid & ~edge_pick

    def _pool(pick, cap):
        c = _gather_rows(seg, pick, cap)
        xyz, m, (rel, ring) = voxel_downsample_masked(
            c.xyz, c.mask, f.less_flat_leaf, cfg.pipeline.local_voxel_radius,
            extras=[c.rel_time, c.ring.astype(jnp.float32)],
        )
        return FeatureCloud(
            xyz=xyz,
            ring=jnp.where(m, jnp.rint(ring).astype(jnp.int32), -1),
            rel_time=jnp.where(m, rel, 0.0),
            mask=m,
        )

    n_struct = f.max_surf_less_flat - f.surf_ground_cap
    lf_ground = _pool(less_flat_src & seg.ground, f.surf_ground_cap)
    lf_struct = _pool(less_flat_src & ~seg.ground, n_struct)
    less_flat = FeatureCloud(
        xyz=jnp.concatenate([lf_ground.xyz, lf_struct.xyz]),
        ring=jnp.concatenate([lf_ground.ring, lf_struct.ring]),
        rel_time=jnp.concatenate([lf_ground.rel_time, lf_struct.rel_time]),
        mask=jnp.concatenate([lf_ground.mask, lf_struct.mask]),
    )

    # Append virtual shadow points to flat surfs (rel_time 1 == scan end,
    # pseudo-ring beyond the sensor's rows, featureAssociation.cpp:429-430).
    if f.use_shadow_points:
        sp = shadow_points(cfg)
        nsp = sp.shape[0]
        cap = flat.xyz.shape[0]
        n_flat = jnp.minimum(flat.count, cap - nsp)
        keep = jnp.arange(cap) < n_flat
        base = jnp.where(keep[:, None], flat.xyz, 0.0)
        # place shadows at positions n_flat..n_flat+nsp
        pos = jnp.arange(cap)
        sidx = pos - n_flat
        in_shadow = (sidx >= 0) & (sidx < nsp)
        sxyz = sp[jnp.clip(sidx, 0, nsp - 1)]
        flat = FeatureCloud(
            xyz=jnp.where(in_shadow[:, None], sxyz, base),
            ring=jnp.where(
                in_shadow, cfg.laser.num_vertical_scans + 1, jnp.where(keep, flat.ring, -1)
            ).astype(jnp.int32),
            rel_time=jnp.where(in_shadow, 1.0, jnp.where(keep, flat.rel_time, 0.0)),
            mask=keep | in_shadow,
        )

    return ScanFeatures(
        corner_sharp=sharp,
        corner_less_sharp=less_sharp,
        surf_flat=flat,
        surf_less_flat=less_flat,
        surf_ground=lf_ground,
    )

"""Oracle parity: numpy ports of the reference's sequential sweeps vs our
TPU-native reformulations (VERDICT round-1 item 6).

Each oracle is a faithful port of the reference algorithm (cited per
function); tests bound the divergence of the parallel reformulation with
numbers instead of comments.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops import segmentation as S


def _grid_for(seed, cfg, pose):
    R, t = pose
    pts = render_scan(R, t, cfg, noise=0.01, seed=seed)
    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    k = min(len(pts), n)
    buf[:k] = np.nan_to_num(pts[:k])
    m[:k] = np.isfinite(pts[:k]).all(axis=1)
    grid = jax.jit(lambda p, mm: project_point_cloud(p, mm, cfg))(
        jnp.asarray(buf), jnp.asarray(m)
    )
    return jax.jit(lambda g, kk: apply_ground(g, cfg, kk))(
        grid, jax.random.PRNGKey(seed)
    )


def oracle_label_components(rng, candidate, cfg, collapse_infeasible=True):
    """Numpy port of `labelComponents` (imageProjection.cpp:847-931) driven
    by the `cloudSegmentation` seed loop (:783-789): queue BFS over the
    4-neighborhood with wrap-around columns and the angle criterion
    tan(theta') = d2 sin(a) / (d1 - d2 cos(a)) > tan(segment_theta).

    Returns (labels, outlier_mask): labels > 0 for feasible segments,
    0 where infeasible (reference 999999), -1 for non-candidates.

    Reference quirk kept: lineCountFlag is set only for *pushed neighbors*
    (:904), so the seed pixel's row does not count unless another point of
    its row joined; feasibility is size>=30 or (size>=valid_point_num and
    >=valid_line_num flagged rows) (:915-926).
    """
    H, W = rng.shape
    thr = np.tan(cfg.segmentation.segment_theta)
    ax, ay = cfg.laser.ang_res_x, cfg.laser.ang_res_y
    labels = np.where(candidate, 0, -1).astype(np.int64)
    label_count = 1
    out = np.zeros((H, W), bool)

    def angle_ok(r1, r2, alpha):
        d1, d2 = max(r1, r2), min(r1, r2)
        return d2 * np.sin(alpha) / max(d1 - d2 * np.cos(alpha), 1e-12) > thr

    for si in range(H):
        for sj in range(W):
            if labels[si, sj] != 0:
                continue
            queue = [(si, sj)]
            pushed = [(si, sj)]
            labels[si, sj] = label_count
            line_flag = np.zeros(H, bool)
            while queue:
                i, j = queue.pop(0)
                for di, dj, alpha in ((0, -1, ax), (-1, 0, ay), (1, 0, ay), (0, 1, ax)):
                    ni, nj = i + di, (j + dj) % W
                    if ni < 0 or ni >= H or labels[ni, nj] != 0:
                        continue
                    if angle_ok(rng[i, j], rng[ni, nj], alpha):
                        labels[ni, nj] = label_count
                        line_flag[ni] = True
                        queue.append((ni, nj))
                        pushed.append((ni, nj))
            size = len(pushed)
            feasible = size >= cfg.segmentation.segment_large_point_num or (
                size >= cfg.segmentation.segment_valid_point_num
                and int(line_flag.sum()) >= cfg.segmentation.segment_valid_line_num
            )
            label_count += 1
            if not feasible:
                for (i, j) in pushed:
                    out[i, j] = True
                    if collapse_infeasible:
                        labels[i, j] = 0  # ≙ 999999
    return labels, out


def _partition_maps(a, b, mask):
    """Check the label partitions of a and b agree exactly on mask."""
    av = a[mask]
    bv = b[mask]
    for x, y in ((av, bv), (bv, av)):
        seen = {}
        for u, v in zip(x.tolist(), y.tolist()):
            if u in seen and seen[u] != v:
                return False
            seen[u] = v
    return True


@pytest.mark.parametrize("seed", [0, 7])
def test_label_components_matches_bfs_oracle(seed):
    cfg = vlp16()
    pose = straight_trajectory(seed + 1, speed=0.2, yaw_rate=0.02)[-1]
    grid = _grid_for(seed, cfg, pose)

    ours = np.asarray(jax.jit(lambda g: S.label_components(g, cfg))(grid))
    raw, _cand = jax.jit(lambda g: S.converged_labels(g, cfg))(grid)
    raw = np.asarray(raw)
    rng = np.asarray(grid.range)
    candidate = np.asarray(grid.valid & (grid.ground != 1))
    oracle, oracle_out = oracle_label_components(
        rng, candidate, cfg, collapse_infeasible=False
    )

    # 1) connected-component partitions agree exactly on all candidates
    #    (this also proves the label propagation converged).
    assert _partition_maps(
        np.where(candidate, raw, -1), oracle, candidate
    ), "component partitions diverge from the BFS oracle"

    # 2) feasibility decisions must match exactly (the production row count
    #    reproduces the reference's lineCountFlag seed-row quirk, :904).
    ours_out = candidate & (ours == S.OUTLIER)
    mismatch = np.sum(ours_out != oracle_out)
    assert mismatch == 0, (
        f"{mismatch} of {candidate.sum()} candidate pixels classified differently"
    )


def test_label_propagation_reaches_fixpoint():
    """One extra sweep after label_components must change nothing (the cap
    must not truncate convergence — round-1 cap of 24 truncated a scene
    needing 47 plain sweeps)."""
    cfg = vlp16()
    pose = straight_trajectory(1, speed=0.15, yaw_rate=np.deg2rad(1.0))[-1]
    grid = _grid_for(11, cfg, pose)
    labels = np.asarray(jax.jit(lambda g: S.label_components(g, cfg))(grid))

    candidate = np.asarray(grid.valid & (grid.ground != 1))
    # recompute connectivity and verify every connected pair shares a label
    left, right, up, down = jax.jit(
        lambda g: S._connectivity(g, g.valid & (g.ground != 1), cfg)
    )(grid)
    lab = np.where(candidate, labels, -999)
    for conn, shift, axis in (
        (np.asarray(left), 1, 1),
        (np.asarray(up), 1, 0),
    ):
        nb = np.roll(lab, shift, axis=axis)
        both = conn & candidate & (np.roll(candidate, shift, axis=axis))
        assert np.all(lab[both] == nb[both]), "connected pixels differ in label"


def test_pallas_cc_matches_xla_labeler():
    """The Pallas VMEM fixpoint kernel (interpret mode on CPU) must produce
    bit-identical converged labels to the XLA sweep+hook path."""
    from lego_loam_tpu.ops.pallas_cc import pallas_label_prop

    cfg = vlp16()
    for seed in (0, 7):
        pose = straight_trajectory(seed + 1, speed=0.2, yaw_rate=0.02)[-1]
        grid = _grid_for(seed, cfg, pose)
        xla_lab, _ = jax.jit(lambda g: S.converged_labels(g, cfg))(grid)
        candidate = grid.valid & (grid.ground != 1)
        l, r, u, d = S._connectivity(grid, candidate, cfg)
        pal = pallas_label_prop(l, r, u, d, candidate, interpret=True)
        assert bool(jnp.all(pal == xla_lab))

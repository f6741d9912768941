"""Stage-1 tests: projection, ground removal, segmentation on analytic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, World
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import (
    apply_ground,
    ground_removal_ours,
    ground_removal_upstream,
)
from lego_loam_tpu.ops.segmentation import label_components, segment_cloud


def _grid(cfg, pts):
    mask = np.isfinite(pts).all(axis=1)
    pts = np.nan_to_num(pts)
    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    k = min(len(pts), n)
    buf[:k] = pts[:k]
    m[:k] = mask[:k]
    return project_point_cloud(jnp.asarray(buf), jnp.asarray(m), cfg)


def test_projection_fills_grid(simple_scan, vlp16_cfg):
    grid = _grid(vlp16_cfg, simple_scan)
    H, W = grid.range.shape
    assert (H, W) == (16, 1800)
    frac = float(jnp.mean(grid.valid.astype(jnp.float32)))
    # Enclosed room: all downward/horizontal beams hit; steep upward beams
    # overshoot the 3 m walls.
    assert frac > 0.6
    low_fill = float(jnp.mean(grid.valid[:9].astype(jnp.float32)))
    assert low_fill > 0.97
    # Ranges consistent with |xyz|
    r = np.asarray(grid.range)
    xyz = np.asarray(grid.xyz)
    v = np.asarray(grid.valid)
    np.testing.assert_allclose(
        np.linalg.norm(xyz[v], axis=-1), r[v], rtol=1e-4, atol=1e-3
    )


def test_projection_row_col_consistency(vlp16_cfg):
    # A single point straight ahead on the horizon should land mid-grid.
    pts = np.full((vlp16_cfg.laser.max_points, 3), np.nan, np.float32)
    pts[0] = [10.0, 0.0, 0.0]  # x fwd, elevation 0 -> row 7 or 8
    grid = _grid(vlp16_cfg, pts)
    v = np.asarray(grid.valid)
    locs = np.argwhere(v)
    assert len(locs) == 1
    row, col = locs[0]
    assert row in (7, 8)
    # forward = azimuth atan2(x,y)=pi/2 -> col = W/2
    assert abs(int(col) - 900) <= 1


def test_ground_removal_flags_floor(simple_scan, vlp16_cfg):
    grid = _grid(vlp16_cfg, simple_scan)
    code = ground_removal_ours(grid, vlp16_cfg)
    code = np.asarray(code)
    xyz = np.asarray(grid.xyz)
    valid = np.asarray(grid.valid)
    # Sensor at 0.6 m: ground points near z=-0.6
    is_floor = valid & (np.abs(xyz[..., 2] + 0.6) < 0.12)
    is_high = valid & (xyz[..., 2] > -0.2)
    floor_marked = code[is_floor] == 1
    high_marked = code[is_high] == 1
    assert floor_marked.mean() > 0.85, f"floor recall {floor_marked.mean():.3f}"
    assert high_marked.mean() < 0.05, f"non-ground leak {high_marked.mean():.3f}"


def test_ground_removal_upstream_flags_floor(simple_scan, vlp16_cfg):
    grid = _grid(vlp16_cfg, simple_scan)
    code = np.asarray(ground_removal_upstream(grid, vlp16_cfg))
    xyz = np.asarray(grid.xyz)
    valid = np.asarray(grid.valid)
    is_floor = valid & (np.abs(xyz[..., 2] + 0.6) < 0.1)
    band = np.zeros_like(is_floor)
    band[: vlp16_cfg.laser.ground_scan_index + 1] = True
    rec = (code[is_floor & band] == 1).mean()
    assert rec > 0.8


def test_segmentation_separates_pillars(simple_scan, vlp16_cfg):
    cfg = vlp16
    grid = _grid(vlp16_cfg, simple_scan)
    grid = apply_ground(grid, vlp16_cfg)
    label = np.asarray(label_components(grid, vlp16_cfg))
    xyz = np.asarray(grid.xyz)
    valid = np.asarray(grid.valid)
    ground = np.asarray(grid.ground)

    # Points on two distinct pillars must carry different segment labels.
    def pillar_mask(cx, cy, r):
        d = np.sqrt((xyz[..., 0] - cx) ** 2 + (xyz[..., 1] - cy) ** 2)
        return valid & (ground != 1) & (d < r + 0.15) & (xyz[..., 2] > -0.3)

    m1 = pillar_mask(6.0, 4.0, 0.3)
    m2 = pillar_mask(-5.0, -6.0, 0.4)
    l1 = label[m1]
    l2 = label[m2]
    l1 = l1[l1 > 0]
    l2 = l2[l2 > 0]
    assert len(l1) > 0 and len(l2) > 0
    # Distinct objects never share a segment id.
    assert set(np.unique(l1)).isdisjoint(set(np.unique(l2)))


def test_segmentation_wall_is_large_component(simple_scan, vlp16_cfg):
    grid = _grid(vlp16_cfg, simple_scan)
    grid = apply_ground(grid, vlp16_cfg)
    label = np.asarray(label_components(grid, vlp16_cfg))
    import collections

    sizes = collections.Counter(label[label > 0].ravel().tolist())
    # The room walls produce at least one large smooth component.
    assert max(sizes.values()) > 500
    # Every surviving segment obeys the feasibility rule (>=5 px).
    assert min(sizes.values()) >= 5


def test_segment_cloud_packing(simple_scan, vlp16_cfg):
    grid = _grid(vlp16_cfg, simple_scan)
    grid = apply_ground(grid, vlp16_cfg)
    grid, seg = segment_cloud(grid, vlp16_cfg)
    count = np.asarray(seg.count)
    valid = np.asarray(seg.valid)
    assert (count > 0).all()
    # Packed: valid prefix per row
    for i in range(valid.shape[0]):
        assert valid[i, : count[i]].all()
        assert not valid[i, count[i]:].any()
    # Columns within each row are sorted (ring order preserved)
    col = np.asarray(seg.col)
    for i in range(valid.shape[0]):
        c = col[i, : count[i]]
        assert (np.diff(c) > 0).all()


def test_stage1_jits_end_to_end(simple_scan, vlp16_cfg):
    cfg = vlp16_cfg

    @jax.jit
    def stage1(pts, mask):
        grid = project_point_cloud(pts, mask, cfg)
        grid = apply_ground(grid, cfg)
        return segment_cloud(grid, cfg)

    mask = np.isfinite(simple_scan).all(axis=1)
    pts = np.nan_to_num(simple_scan)
    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    buf[: len(pts)] = pts[:n]
    m[: len(pts)] = mask[:n]
    grid, seg = stage1(jnp.asarray(buf), jnp.asarray(m))
    assert int(jnp.sum(seg.count)) > 1000

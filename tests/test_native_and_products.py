"""Native runtime bindings + map products tests."""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def test_native_prep_matches_numpy():
    from lego_loam_tpu import native

    rs = np.random.RandomState(0)
    pts = rs.randn(500, 3).astype(np.float32)
    pts[::7] = np.nan
    buf, mask = native.prep_cloud(pts, 600)
    assert buf.shape == (600, 3)
    ref_mask = np.isfinite(pts).all(axis=1)
    np.testing.assert_array_equal(mask[:500], ref_mask)
    assert not mask[500:].any()
    np.testing.assert_allclose(buf[:500][ref_mask], pts[ref_mask])
    assert (buf[:500][~ref_mask] == 0).all()


def test_native_feeder_streams_kitti(tmp_path):
    from lego_loam_tpu import native

    rs = np.random.RandomState(1)
    files = []
    clouds = []
    for i in range(3):
        pts = rs.randn(100, 4).astype(np.float32)
        f = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(f)
        files.append(f)
        clouds.append(pts[:, :3])

    feeder = native.ScanFeeder(files, cap=128)
    seen = []
    while True:
        item = feeder.next()
        if item is None:
            break
        idx, buf, mask, ts = item
        assert mask[:100].all() and not mask[100:].any()
        np.testing.assert_allclose(buf[:100], clouds[idx], rtol=1e-6)
        seen.append(idx)
    feeder.close()
    assert seen == [0, 1, 2]


@pytest.mark.slow
def test_save_map_products(tmp_path):
    import jax
    from lego_loam_tpu.io.synthetic import render_scan
    from lego_loam_tpu.mapproducts import global_map, load_high_dense_map, save_map
    from lego_loam_tpu.pipeline import LegoLoamPipeline
    from test_backend import small_cfg

    cfg = small_cfg()
    pipe = LegoLoamPipeline(cfg)
    for i in range(3):
        pipe.process_scan(
            render_scan(np.eye(3), np.array([0.3 * i, 0, 0]), cfg, seed=i)
        )

    out = save_map(pipe.bstate, str(tmp_path / "run"), cfg)
    for f in [
        "cornerMap.pcd",
        "surfaceMap.pcd",
        "finalCloud.pcd",
        "denseCloud.pcd",
        "trajectory.pcd",
        "pose.txt",
    ]:
        assert os.path.isfile(os.path.join(out, f)), f

    # HighDense reload round-trips
    xyz, _ = load_high_dense_map(os.path.join(out, "denseCloud.pcd"))
    assert len(xyz) > 100

    gm = global_map(pipe.bstate, np.zeros(3), 100.0, cfg)
    assert len(gm) > 50

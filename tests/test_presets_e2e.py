"""Short odometry+mapping e2e drives for the non-VLP-16 presets.

VERDICT r3 #9: the VLP-32c / HDL-64E presets were config- and projection-
tested but never driven through odometry+mapping. Render the same small
synthetic world at 32 and 64 rows (irregular VLP-32c beam table included)
and require a sane trajectory from the full per-scan path.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e drive


def _shrunk(cfg):
    """CPU-sized capacities (mirrors test_backend.small_cfg)."""
    feats = dataclasses.replace(
        cfg.features,
        max_corner_sharp=512,
        max_corner_less_sharp=1024,
        max_surf_flat=2048,
        max_surf_less_flat=4096,
    )
    mapping = dataclasses.replace(
        cfg.mapping,
        max_corner_scan=1024,
        max_surf_scan=4096,
        max_submap_corner=16384,
        max_submap_surf=32768,
        max_keyframes=64,
        enable_loop_closure=False,
    )
    dist = dataclasses.replace(
        cfg.distributed, shard_backend=False, use_sharded_posegraph=False
    )
    pipe = dataclasses.replace(cfg.pipeline, rigid_scans=True)
    return dataclasses.replace(
        cfg, features=feats, mapping=mapping, distributed=dist, pipeline=pipe
    )


@pytest.mark.parametrize("preset", ["vlp32c", "hdl64e"])
def test_preset_short_drive(preset):
    from lego_loam_tpu import config as cfgmod
    from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
    from lego_loam_tpu.pipeline import LegoLoamPipeline

    cfg = _shrunk(getattr(cfgmod, preset)())
    n = 10
    poses = straight_trajectory(n, speed=0.12, yaw_rate=np.deg2rad(0.5))
    pipe = LegoLoamPipeline(cfg)
    for i, (R, t) in enumerate(poses):
        pipe.process_scan(render_scan(R, t, cfg, noise=0.01, seed=40 + i))
    pipe.finalize()

    gt = np.stack([t for _, t in poses])
    est = np.asarray(pipe.trajectory["positions"])
    odom = np.asarray(pipe.odom_positions)
    assert np.isfinite(est).all() and np.isfinite(odom).all()
    err = np.linalg.norm(est - gt, axis=1)
    # Short drive: the mapped trajectory must track ground truth to well
    # under the per-frame motion (0.12 m) x n budget.
    assert err.max() < 0.5, err
    # and the solver must actually have engaged (some map iterations ran)
    assert sum(pipe.diagnostics["iterations"]) > 0

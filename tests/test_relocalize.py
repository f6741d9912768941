"""HighDense re-localization + /initialpose run-control + global-map cadence
(≙ mapOptmization.cpp:437-456 /initialpose, :775-892 publishGlobalMap,
publishHighDenseMap.cpp:13-67)."""

import dataclasses

import numpy as np
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.pipeline import LegoLoamPipeline
from lego_loam_tpu.relocalize import localize_scan, map_state_from_cloud

pytestmark = pytest.mark.slow  # multi-minute e2e drive


def _small(cfg):
    return dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping,
            max_submap_corner=4096,
            max_submap_surf=8192,
            surrounding_keyframe_search_num=8,
            max_keyframes=32,
        ),
        # fixtures are rigid renders: disable the mid-scan motion warp
        pipeline=dataclasses.replace(cfg.pipeline, rigid_scans=True),
        # single-device semantics for speed (sharded path covered elsewhere)
        distributed=dataclasses.replace(
            cfg.distributed, shard_backend=False, use_sharded_posegraph=False
        ),
    )


@pytest.fixture(scope="module")
def mapped_world(vlp16_cfg):
    """Short drive -> keyframe store -> dense map cloud."""
    cfg = _small(vlp16_cfg)
    poses = straight_trajectory(8, speed=0.3)
    pipe = LegoLoamPipeline(cfg)
    for i, (R, t) in enumerate(poses):
        pipe.process_scan(render_scan(R, t, cfg, noise=0.005, seed=50 + i))
    from lego_loam_tpu.mapproducts import gather_keyframe_clouds

    g = gather_keyframe_clouds(pipe.bstate)
    dense = np.concatenate([g["corner"], g["surf"]])
    return cfg, poses, dense


def test_localize_scan_in_saved_map(mapped_world):
    """A scan from a known pose, localized from a perturbed initial guess,
    recovers the true pose (HighDense re-mapping mode, concrete)."""
    cfg, poses, dense = mapped_world
    R_true, t_true = poses[4]
    scan = render_scan(R_true, t_true, cfg, noise=0.005, seed=99)

    submap = map_state_from_cloud(dense, cfg, center=t_true)
    # perturbed initial guess: 0.3 m offset + 3 deg yaw
    yaw = np.deg2rad(3.0)
    c, s = np.cos(yaw), np.sin(yaw)
    dR = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    R0 = dR @ R_true
    t0 = t_true + np.array([0.3, -0.2, 0.05], np.float32)

    R, t, diag = localize_scan(scan, submap, R0, t0, cfg)
    t = np.asarray(t)
    R = np.asarray(R)
    err_t = np.linalg.norm(t - t_true)
    err_R = np.rad2deg(
        np.arccos(np.clip((np.trace(R_true.T @ R) - 1) / 2, -1, 1))
    )
    t0_err = np.linalg.norm(t0 - t_true)
    assert err_t < 0.12, f"translation error {err_t:.3f} (init {t0_err:.3f})"
    assert err_R < 1.0, f"rotation error {err_R:.2f} deg"


def test_request_stop_ends_run(mapped_world):
    """≙ /initialpose flag ends the run loop."""
    cfg, poses, _ = mapped_world
    pipe = LegoLoamPipeline(cfg)
    scans = [
        render_scan(R, t, cfg, noise=0.005, seed=70 + i)
        for i, (R, t) in enumerate(poses[:4])
    ]
    orig = pipe.process_scan

    def hooked(*a, **k):
        out = orig(*a, **k)
        if pipe.frame_idx == 2:
            pipe.request_stop()
        return out

    pipe.process_scan = hooked
    pipe.run(scans)
    assert pipe.frame_idx == 2


def test_global_map_cadence(mapped_world):
    """global_map_every_n_frames drives host-side global-map assembly."""
    cfg, poses, _ = mapped_world
    cfg2 = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, publish_global_map=True),
        mapping=dataclasses.replace(cfg.mapping, global_map_every_n_frames=3),
    )
    pipe = LegoLoamPipeline(cfg2)
    for i, (R, t) in enumerate(poses[:7]):
        pipe.process_scan(render_scan(R, t, cfg2, noise=0.005, seed=80 + i))
    # 7 mapped frames at cadence 3 -> publishes at 3 and 6
    assert pipe.global_map_count == 2
    assert pipe.latest_global_map is not None
    assert len(pipe.latest_global_map) > 100

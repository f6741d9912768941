"""Motion-distortion end-to-end: swept synthetic scans through the flagship
path (VERDICT round-1 item 3 / weak #6).

Scans are rendered while the sensor moves (render_scan_swept), so each cloud
carries real rotational distortion. Verifies (a) the production
motion-estimate warp (TransformToStart parity) beats the rigid-scan
shortcut on distorted data, and (b) IMU undistortion measurably reduces
odometry ATE on a fast-spinning trajectory.
"""

import dataclasses

import numpy as np
import jax
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.pipeline import LegoLoamPipeline
from lego_loam_tpu.utils.metrics import ate_rmse

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
        # single-device semantics for speed (sharded path covered by
        # test_sharded_pipeline.py + __graft_entry__.dryrun_multichip)
        distributed=dataclasses.replace(
            cfg.distributed, shard_backend=False, use_sharded_posegraph=False
        ),
    )


def _drive(cfg, scans, poses, imu_fn=None):
    pipe = LegoLoamPipeline(cfg)
    for i, s in enumerate(scans):
        pipe.process_scan(
            s, imu_samples=None if imu_fn is None else imu_fn(i)
        )
    pipe.finalize()
    gt = np.stack([t for _, t in poses])
    return ate_rmse(np.asarray(pipe.trajectory["positions"]), gt, align=False)


def test_motion_warp_beats_rigid_shortcut_on_swept_scans():
    """On motion-distorted scans the production rel_time warp must beat the
    rigid_scans shortcut (which models every point at scan end)."""
    n = 8
    yaw_rate = np.deg2rad(3.0)
    poses = straight_trajectory(n, speed=0.1, yaw_rate=yaw_rate)
    cfg = _small(vlp16())
    scans = list(swept_scan_sequence(poses, cfg, noise=0.005, seed=5))

    ate_warp = _drive(cfg, scans, poses)
    cfg_rigid = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, rigid_scans=True)
    )
    ate_rigid = _drive(cfg_rigid, scans, poses)
    assert ate_warp < ate_rigid, (ate_warp, ate_rigid)
    assert ate_warp < 0.2, f"warped-path ATE {ate_warp:.3f}"


def test_imu_undistortion_reduces_ate_on_fast_spin():
    """Fast spin (6 deg/frame): rotational distortion is ~1 m at 10 m range.
    Feeding ground-truth-orientation IMU samples through the flagship path
    (cfg.pipeline.use_imu_undistortion) must cut odometry ATE vs no IMU."""
    n = 8
    yaw_rate = np.deg2rad(6.0)
    poses = straight_trajectory(n, speed=0.02, yaw_rate=yaw_rate)
    cfg = _small(vlp16())
    scans = list(swept_scan_sequence(poses, cfg, noise=0.005, seed=9))

    ate_noimu = _drive(cfg, scans, poses)

    cfg_imu = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, use_imu_undistortion=True),
    )
    sp = cfg.laser.scan_period
    S = 16

    def imu_fn(i):
        # scan i sweeps poses[i-1] -> poses[i]; ground-truth yaw interp
        yaw0 = yaw_rate * max(i - 1, 0)
        yaw1 = yaw_rate * i
        s = np.linspace(0.0, 1.0, S)
        rows = np.zeros((S, 7), np.float32)
        rows[:, 0] = s * sp
        rows[:, 3] = yaw0 * (1 - s) + yaw1 * s
        return rows

    ate_imu = _drive(cfg_imu, scans, poses, imu_fn)
    assert ate_imu < ate_noimu * 0.7, (ate_imu, ate_noimu)
    assert np.isfinite(ate_imu)


def test_chunked_runner_with_imu_and_odom_prior():
    """The device-resident chunked runner accepts per-frame IMU windows and
    wheel-odom poses (lax.scan xs) and stays finite/consistent with the
    per-frame path."""
    n = 8
    yaw_rate = np.deg2rad(2.0)
    poses = straight_trajectory(n, speed=0.1, yaw_rate=yaw_rate)
    cfg = _small(vlp16())
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, use_imu_undistortion=True,
                                     imu_window=16),
        odometry=dataclasses.replace(cfg.odometry, odom_prior_mode="init"),
    )
    scans = list(swept_scan_sequence(poses, cfg, noise=0.005, seed=3))

    sp = cfg.laser.scan_period
    S = cfg.pipeline.imu_window
    C = len(scans)
    imu = {
        "t": np.zeros((C, S), np.float32),
        "rpy": np.zeros((C, S, 3), np.float32),
        "acc": np.zeros((C, S, 3), np.float32),
        "mask": np.zeros((C, S), bool),
    }
    for i in range(C):
        s = np.linspace(0.0, 1.0, S)
        imu["t"][i] = s * sp
        yaw0 = yaw_rate * max(i - 1, 0)
        imu["rpy"][i, :, 2] = yaw0 * (1 - s) + yaw_rate * i * s
        imu["mask"][i] = True
    odR = np.stack([R for R, _ in poses]).astype(np.float32)
    odt = np.stack([t for _, t in poses]).astype(np.float32)

    pipe = LegoLoamPipeline(cfg)
    prep = pipe._prep_many(scans)
    pipe.process_chunk(prep, imu=imu, odom=(odR, odt))
    pipe.finalize()
    gt = np.stack([t for _, t in poses])
    ate = ate_rmse(np.asarray(pipe.trajectory["positions"]), gt, align=False)
    assert np.isfinite(ate) and ate < 0.2, ate

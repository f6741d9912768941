"""Product-surface end-to-end: `python -m lego_loam_tpu.run` driven on real
KITTI-format and rosbag2 inputs rendered from the synthetic world, plus
mid-run checkpoint/resume (VERDICT r4 #5 / #7a — the CLI and restartability
must be EXECUTED, not just format-tested)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow


def _fixture_scans(frames=10):
    from make_fixtures import render_fixture_scans

    from lego_loam_tpu.config import vlp16

    return render_fixture_scans(frames, vlp16())


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "lego_loam_tpu.run", "--platform", "cpu",
         *args],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=cwd,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return r


def _check_artifacts(out, min_frames, expect_x_motion=True):
    pose = np.loadtxt(os.path.join(out, "pose.txt"))
    assert pose.shape[0] >= min_frames
    assert np.isfinite(pose).all()
    if expect_x_motion:
        # the fixture course drives +x at 0.2 m/frame
        assert pose[-1, 0] > 0.1 * (pose.shape[0] - 1) * 0.2
        assert abs(pose[-1, 1]) < 1.0
    assert os.path.exists(os.path.join(out, "mapt.txt"))
    assert os.path.exists(os.path.join(out, "MapIterTimes.txt"))
    assert os.path.exists(os.path.join(out, "cornerMap.pcd"))


def test_cli_kitti_e2e(tmp_path):
    from make_fixtures import write_kitti

    scans, times, _ = _fixture_scans()
    seq = tmp_path / "kitti" / "00"
    write_kitti(str(seq), scans, times)
    out = tmp_path / "out_kitti"
    _run_cli(
        ["--kitti", str(seq), "--out", str(out), "--max-frames", "8"],
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    _check_artifacts(str(out), 7)


def test_cli_rosbag_e2e(tmp_path):
    from make_fixtures import write_rosbag2

    scans, times, _ = _fixture_scans()
    bag = tmp_path / "bag"
    write_rosbag2(str(bag), scans, times)
    out = tmp_path / "out_bag"
    _run_cli(
        ["--rosbag", str(bag), "--out", str(out), "--max-frames", "8"],
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    _check_artifacts(str(out), 7)


def test_checkpoint_midrun_resume(tmp_path):
    """Kill-and-resume parity: a run checkpointed at frame N and resumed in
    a FRESH pipeline must finish with the same trajectory as the
    uninterrupted run (elastic recovery, SURVEY §5)."""
    import dataclasses

    import jax

    sys.path.insert(0, os.path.dirname(__file__))
    from test_backend import small_cfg

    from lego_loam_tpu import checkpoint
    from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
    from lego_loam_tpu.pipeline import LegoLoamPipeline

    cfg = small_cfg()
    poses = straight_trajectory(12, speed=0.25, yaw_rate=np.deg2rad(2.0))
    scans = [
        render_scan(R, t, cfg, noise=0.005, seed=500 + i)
        for i, (R, t) in enumerate(poses)
    ]

    # uninterrupted reference run
    ref = LegoLoamPipeline(cfg)
    for s in scans:
        ref.process_scan(s)
    ref.finalize()
    ref_traj = np.asarray(ref.trajectory["positions"])

    # interrupted at frame 6, resumed in a fresh pipeline
    a = LegoLoamPipeline(cfg)
    for s in scans[:6]:
        a.process_scan(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save(a, ckpt)
    del a

    b = LegoLoamPipeline(cfg)
    checkpoint.load(b, ckpt)
    assert b.frame_idx == 6
    for s in scans[6:]:
        b.process_scan(s)
    b.finalize()
    # final mapped pose must match the uninterrupted run's
    t_ref = ref_traj[-1]
    t_res = np.asarray(jax.device_get(b.bstate.t_map))
    np.testing.assert_allclose(t_res, t_ref, atol=2e-2)

"""Multi-process execution: the pose-graph solve runs across JAX process
boundaries (2 processes x 4 CPU devices on one machine — JAX's documented
multi-host simulation) and matches the single-process result.

New capability vs the single-machine reference (SURVEY.md §2.2 last row)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e drive

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(ROOT, "tools", "multihost_child.py")


def test_two_process_posegraph_matches_single(tmp_path):
    from lego_loam_tpu.launch import spawn_local

    # reference: single process, 8 local devices
    out_single = str(tmp_path / "single.npy")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, CHILD, "--single", "--out", out_single],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    # distributed: 2 processes x 4 devices
    out_multi = str(tmp_path / "multi.npy")
    spawn_local(
        CHILD, n_processes=2, devices_per_process=4,
        extra_args=["--out", out_multi],
    )

    t_single = np.load(out_single)
    t_multi = np.load(out_multi)
    assert np.isfinite(t_multi).all()
    np.testing.assert_allclose(t_multi, t_single, atol=1e-4)

"""Pipeline loop closure through the mesh-sharded pose-graph solver."""

import dataclasses
import os
import sys

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # multi-minute e2e drive

sys.path.insert(0, os.path.dirname(__file__))


def test_pipeline_uses_sharded_solver():
    """Runs in a subprocess: constructing a Mesh poisons later jit programs
    in the same process on jax 0.9 (same family as the donation/buffer-count
    interaction noted in pipeline.py)."""
    import subprocess

    code = "import os; os.environ['JAX_PLATFORMS']='cpu'; "         "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'; "         "import jax; jax.config.update('jax_platforms','cpu'); "         "import sys; sys.path.insert(0, r'%s'); sys.path.insert(0, r'%s'); "         "from test_sharded_pipeline import _run_sharded_pipeline_check; "         "_run_sharded_pipeline_check()" % (
            os.path.dirname(__file__),
            os.path.dirname(os.path.dirname(__file__)),
        )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    assert r.returncode == 0, r.stdout + r.stderr


def _run_sharded_pipeline_check():
    assert len(jax.devices()) >= 8
    from test_backend import small_cfg
    from test_loopclosure_e2e import loop_cfg
    from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
    from lego_loam_tpu.pipeline import LegoLoamPipeline

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        distributed=dataclasses.replace(
            cfg.distributed, use_sharded_posegraph=True, cg_iterations=16
        ),
    )
    pipe = LegoLoamPipeline(cfg)
    assert pipe._mesh is not None

    # Drive a few frames, then force a graph optimization directly (the
    # sharded solve path) and check keyframe poses stay finite/consistent.
    poses = straight_trajectory(4, speed=0.2)
    for i, (R, t) in enumerate(poses):
        pipe.process_scan(render_scan(R, t, cfg, seed=70 + i))
    before = jax.device_get(pipe.bstate.kf_t)[: int(pipe.bstate.n_kf)]
    pipe._optimize_graph()
    after = jax.device_get(pipe.bstate.kf_t)[: int(pipe.bstate.n_kf)]
    assert np.isfinite(after).all()
    # chain-only graph: optimization must not move consistent poses far
    np.testing.assert_allclose(after, before, atol=0.05)
    # pipeline continues to run after the sharded correction
    out = pipe.process_scan(render_scan(*poses[-1], cfg, seed=99))
    assert np.isfinite(jax.device_get(out["t_map"])).all()

"""Elastic multi-host recovery (SURVEY §5: "multi-host BA must tolerate host
restart by re-sharding keyframes"): a run with the keyframe store sharded
over an 8-device mesh is checkpointed, then RESUMED in a fresh process with
a DIFFERENT device topology (4 devices) — the checkpoint is host-side npz,
so `checkpoint.load` re-shards the store onto whatever mesh the surviving
hosts form, and the continued trajectory matches the uninterrupted one."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_CHILD = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=%(ndev)d'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
sys.path.insert(0, r'%(root)s')
sys.path.insert(0, r'%(tests)s')
import dataclasses
import numpy as np
from test_backend import small_cfg
from lego_loam_tpu import checkpoint
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.pipeline import LegoLoamPipeline

cfg = small_cfg()
cfg = dataclasses.replace(
    cfg,
    mapping=dataclasses.replace(
        cfg.mapping,
        # capacities must divide the 8- and 4-device meshes
        max_keyframes=64,
    ),
    distributed=dataclasses.replace(
        cfg.distributed, shard_backend=True, use_sharded_posegraph=False,
    ),
)
poses = straight_trajectory(10, speed=0.25)
scans = [render_scan(R, t, cfg, noise=0.005, seed=800 + i)
         for i, (R, t) in enumerate(poses)]

pipe = LegoLoamPipeline(cfg)
assert pipe._mesh is not None and pipe._mesh.devices.size == %(ndev)d
mode = '%(mode)s'
if mode == 'first':
    for s in scans[:6]:
        pipe.process_scan(s)
    checkpoint.save(pipe, r'%(ckpt)s')
    for s in scans[6:]:
        pipe.process_scan(s)
else:
    checkpoint.load(pipe, r'%(ckpt)s')
    assert pipe.frame_idx == 6
    # the store is re-sharded onto THIS process's (smaller) mesh
    assert pipe.bstate.kf_t.sharding.mesh.devices.size == %(ndev)d
    for s in scans[6:]:
        pipe.process_scan(s)
import jax as _j
np.save(r'%(out)s', _j.device_get(pipe.bstate.t_map))
print('child ok', mode)
"""


def _run_child(ndev, mode, ckpt, out):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD % {
        "ndev": ndev,
        "root": root,
        "tests": os.path.join(root, "tests"),
        "mode": mode,
        "ckpt": ckpt,
        "out": out,
    }
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]


def test_restart_reshards_onto_smaller_mesh(tmp_path):
    ckpt = str(tmp_path / "state.npz")
    out8 = str(tmp_path / "final8.npy")
    out4 = str(tmp_path / "final4.npy")
    _run_child(8, "first", ckpt, out8)   # 8-device run, ckpt at frame 6
    _run_child(4, "resume", ckpt, out4)  # restart on a 4-device mesh
    t8 = np.load(out8)
    t4 = np.load(out4)
    assert np.isfinite(t4).all()
    np.testing.assert_allclose(t4, t8, atol=5e-3)

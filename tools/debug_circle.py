"""Debug the 40-frame circle loop-closure e2e failure."""

import dataclasses
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from test_loopclosure_e2e import loop_cfg

from lego_loam_tpu.io.synthetic import circle_trajectory, render_scan
from lego_loam_tpu.pipeline import LegoLoamPipeline


def run(enable_loop, tag):
    cfg = loop_cfg()
    cfg = dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping,
            loop_time_gap=1.5,
            loop_every_n_frames=1,
            enable_loop_closure=enable_loop,
        ),
    )
    poses = circle_trajectory(40, radius=5.0, step_deg=9.5)
    pipe = LegoLoamPipeline(cfg)
    scans = [
        render_scan(R, t, cfg, noise=0.01, seed=100 + i)
        for i, (R, t) in enumerate(poses)
    ]
    pipe.run_chunked(scans, chunk=8)

    gt = np.stack([t for _, t in poses])
    est = np.asarray(pipe.trajectory["positions"])
    odo = np.asarray(pipe.odom_positions)
    ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
    ate_o = float(np.sqrt(np.mean(np.sum((odo - gt) ** 2, axis=1))))
    print(f"[{tag}] map-ATE {ate:.3f}  odom-ATE {ate_o:.3f}  "
          f"loop_factors {len(pipe.loop_factors)}")
    err = np.linalg.norm(est - gt, axis=1)
    print(f"[{tag}] per-frame map err: {np.array2string(err, precision=2)}")
    for f in pipe.loop_factors:
        print(f"[{tag}] loop i={f.i} j={f.j} fitness={f.fitness:.3f} "
              f"|t|={np.linalg.norm(f.t):.3f}")
    return ate


if __name__ == "__main__":
    run(False, "no-loop")
    run(True, "loop")

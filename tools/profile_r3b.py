"""Stage bisect of the chunk runner with honest device_get sync.

Builds lax.scan runners with stages progressively enabled; the disabled
suffix is dead code XLA removes entirely, so successive differences give
per-stage cost:

  V1: frontend_prepass + downsample_current_scan
  V2: V1 + frontend_solve (scan-to-scan GN)
  V3: V2 + backend_step_ds (submap + scan-to-map GN + append)  [= product]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from functools import partial

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.backend import (
    backend_step_ds, downsample_current_scan, init_backend_state,
)
from lego_loam_tpu.frontend import (
    frontend_prepass, frontend_solve, init_odometry_state,
)
from lego_loam_tpu.pipeline import LegoLoamPipeline


def build_runner(cfg, level):
    def step(carry, inp):
        fstate, bstate, idx = carry
        pts = inp["pts"].astype(jnp.float32) * cfg.pipeline.feed_quant
        mask = inp["mask"]
        t_scan = idx.astype(jnp.float32) * cfg.laser.scan_period
        key = jax.random.fold_in(jax.random.PRNGKey(0), idx)
        _grid, seg, feats = frontend_prepass(pts, mask, cfg, key)
        ds = downsample_current_scan(feats, seg.outlier_xyz, seg.outlier_mask, cfg)
        probe = sum(jnp.sum(x.astype(jnp.float32)) for x in ds)
        if level >= 2:
            fstate, out = frontend_solve(feats, fstate, cfg, None)
            probe = probe + jnp.sum(out["t_world"])
        if level >= 3:
            bstate, _pose, diag = backend_step_ds(
                bstate, *ds, out["R_world"], out["t_world"], t_scan, cfg
            )
            probe = probe + jnp.sum(bstate.t_map)
        return (fstate, bstate, idx + 1), probe

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(fstate, bstate, idx0, xs):
        (fstate, bstate, idx), ys = jax.lax.scan(
            step, (fstate, bstate, idx0), xs
        )
        return fstate, bstate, idx, ys

    return run


def main():
    cfg = vlp16()
    chunk = 16
    n_warm, n_meas = 1, 4
    n = (n_warm + n_meas) * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))
    pipe = LegoLoamPipeline(cfg)  # only for _prep_many
    prepped = [pipe._prep_many(scans[s : s + chunk]) for s in range(0, n, chunk)]
    staged = [
        {"pts": jnp.asarray(p), "mask": jnp.asarray(m)} for p, m in prepped
    ]
    jax.device_get(staged[-1]["mask"][0][:1])

    prev = 0.0
    for level in (1, 2, 3):
        runner = build_runner(cfg, level)
        fstate = init_odometry_state(cfg)
        bstate = init_backend_state(cfg)
        idx = jnp.int32(0)
        t0 = time.perf_counter()
        fstate, bstate, idx, ys = runner(fstate, bstate, idx, staged[0])
        jax.device_get(ys[-1])
        print(f"V{level} compile+warm: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for c in range(n_warm, n_warm + n_meas):
            fstate, bstate, idx, ys = runner(fstate, bstate, idx, staged[c])
        jax.device_get(ys[-1])
        dt = time.perf_counter() - t0
        ms = dt * 1e3 / (n_meas * chunk)
        print(
            f"V{level}: {ms:.2f} ms/frame (delta {ms-prev:+.2f})", flush=True
        )
        prev = ms


if __name__ == "__main__":
    main()

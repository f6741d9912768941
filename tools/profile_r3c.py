"""Backend bisect: submap rebuild vs NN refresh vs GN iterations.

Variants (all full V3 runners, config-tweaked):
  B0: default                      (rebuild ~1/7 frames, 8 GN iters)
  B1: no rebuilds in steady state  (rebuild_dist/every = huge)
  B2: B1 + max_gn_iterations=1     (NN refresh + 1 iteration)
  B3: B1 + search per iteration    (what the reference does)
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.backend import init_backend_state
from lego_loam_tpu.frontend import init_odometry_state
from lego_loam_tpu.pipeline import LegoLoamPipeline

sys.path.insert(0, "tools")
from profile_r3b import build_runner


def measure(cfg, staged, label, n_warm=1):
    runner = build_runner(cfg, 3)
    fstate = init_odometry_state(cfg)
    bstate = init_backend_state(cfg)
    idx = jnp.int32(0)
    chunk = staged[0]["mask"].shape[0]
    t0 = time.perf_counter()
    for c in range(n_warm):
        fstate, bstate, idx, ys = runner(fstate, bstate, idx, staged[c])
    jax.device_get(ys[-1])
    warm = time.perf_counter() - t0
    n_meas = len(staged) - n_warm
    t0 = time.perf_counter()
    for c in range(n_warm, len(staged)):
        fstate, bstate, idx, ys = runner(fstate, bstate, idx, staged[c])
    jax.device_get(ys[-1])
    dt = time.perf_counter() - t0
    print(
        f"{label}: {dt*1e3/(n_meas*chunk):.2f} ms/frame (compile+warm {warm:.1f}s)",
        flush=True,
    )


def main():
    cfg = vlp16()
    chunk = 16
    n_chunks = 5
    n = n_chunks * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))
    pipe = LegoLoamPipeline(cfg)
    prepped = [pipe._prep_many(scans[s : s + chunk]) for s in range(0, n, chunk)]
    staged = [
        {"pts": jnp.asarray(p), "mask": jnp.asarray(m)} for p, m in prepped
    ]
    jax.device_get(staged[-1]["mask"][0][:1])

    measure(cfg, staged, "B0 default")

    no_rb = dataclasses.replace(
        cfg.mapping, submap_rebuild_dist=1e9, submap_rebuild_every=10**9
    )
    cfg1 = dataclasses.replace(cfg, mapping=no_rb)
    measure(cfg1, staged, "B1 no-rebuild")

    cfg2 = dataclasses.replace(
        cfg, mapping=dataclasses.replace(no_rb, max_gn_iterations=1)
    )
    measure(cfg2, staged, "B2 no-rebuild 1-iter")

    cfg3 = dataclasses.replace(
        cfg, mapping=dataclasses.replace(no_rb, search_every=1)
    )
    measure(cfg3, staged, "B3 no-rebuild search-every-iter")


if __name__ == "__main__":
    main()

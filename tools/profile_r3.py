"""Round-3 honest decomposition of the bench path on the real chip.

Every timed region ends with a jax.device_get of a small array — the only
operation that truly synchronizes on the relay-attached TPU
(block_until_ready has been observed to return early there).

Measures, per frame at the bench config (chunk=16):
  A. device compute only (all chunks pre-staged on device)
  B. host->device staging only (hot, repeated)
  C. full bench pattern (async stager overlap)
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

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.pipeline import LegoLoamPipeline


def sync(pipe):
    # device_get of a 3-vector: the only true sync on the relay
    return jax.device_get(pipe.bstate.t_map)


def main():
    cfg = vlp16()
    chunk = 16
    n_warm, n_meas = 2, 6
    n = (n_warm + n_meas) * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))

    pipe = LegoLoamPipeline(cfg)
    prepped = [pipe._prep_many(scans[s : s + chunk]) for s in range(0, n, chunk)]

    t0 = time.perf_counter()
    for c in range(n_warm):
        pipe.process_chunk(prepped[c])
    sync(pipe)
    print(f"warmup+compile: {time.perf_counter()-t0:.1f}s", flush=True)

    # B. staging cost, hot (before the big run so allocator state is clean)
    for rep in range(3):
        t0 = time.perf_counter()
        staged = [pipe.stage_chunk(prepped[c]) for c in range(n_warm, n_warm + n_meas)]
        jax.device_get(next(iter(staged[-1].values()))[0].ravel()[:1])
        dt = time.perf_counter() - t0
        print(
            f"B staging only rep{rep}: {dt*1e3/ (n_meas*chunk):.2f} ms/frame"
            f" ({dt*1e3/n_meas:.1f} ms/chunk)",
            flush=True,
        )

    # A. device compute only: inputs already on device
    t0 = time.perf_counter()
    for xs in staged:
        pipe.process_chunk(xs)
    sync(pipe)
    dt = time.perf_counter() - t0
    print(
        f"A device-only: {dt*1e3/(n_meas*chunk):.2f} ms/frame"
        f" -> {n_meas*chunk/dt:.1f} scans/s",
        flush=True,
    )

    # C. full bench pattern (fresh pipeline, async stager)
    pipe2 = LegoLoamPipeline(cfg)
    for c in range(n_warm):
        pipe2.process_chunk(prepped[c])
    sync(pipe2)
    t0 = time.perf_counter()
    nxt = pipe2.stage_chunk_async(prepped[n_warm])
    for c in range(n_warm, n_warm + n_meas):
        cur = nxt.result()
        if c + 1 < n_warm + n_meas:
            nxt = pipe2.stage_chunk_async(prepped[c + 1])
        pipe2.process_chunk(cur)
    sync(pipe2)
    dt = time.perf_counter() - t0
    print(
        f"C bench pattern: {dt*1e3/(n_meas*chunk):.2f} ms/frame"
        f" -> {n_meas*chunk/dt:.1f} scans/s",
        flush=True,
    )


if __name__ == "__main__":
    main()

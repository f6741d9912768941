"""Decompose the production chunk step: device-only runner vs process_chunk
(host transfer + log slicing included) vs bench loop. Real chip."""

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


def main():
    cfg = vlp16()
    chunk = 16
    n = 8 * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))
    pipe = LegoLoamPipeline(cfg)
    prepped = [pipe._prep_many(scans[s:s + chunk]) for s in range(0, n, chunk)]

    # warm: 2 chunks
    for c in range(2):
        pipe.process_chunk(*prepped[c])
    jax.block_until_ready(pipe.bstate.t_map)

    # --- A: full process_chunk (matches bench) -----------------------------
    t0 = time.perf_counter()
    for c in range(2, 8):
        pipe.process_chunk(*prepped[c])
    jax.block_until_ready(pipe.bstate.t_map)
    dtA = (time.perf_counter() - t0) / (6 * chunk) * 1e3
    print(f"A process_chunk (bench path)      {dtA:8.3f} ms/frame", flush=True)

    # --- B: raw chunk runner, inputs pre-staged on device ------------------
    runner = pipe._chunk_runner
    fstate, bstate = pipe.fstate, pipe.bstate
    xs_dev = []
    for c in range(2, 8):
        pts, m = prepped[c]
        ts = (np.arange(c * chunk, (c + 1) * chunk) * cfg.laser.scan_period)
        xs = {
            "pts": jax.device_put(jnp.asarray(pts)),
            "mask": jax.device_put(jnp.asarray(m)),
            "ts": jax.device_put(jnp.asarray(ts, jnp.float32)),
        }
        jax.block_until_ready(xs["pts"])
        xs_dev.append(xs)
    op = (jnp.eye(3), jnp.zeros(3))
    idx = jnp.int32(0)
    # one warm call (donation consumes fstate/bstate, returns new ones)
    fstate, bstate, idx, op, ys = runner(fstate, bstate, idx, xs_dev[0], op)
    jax.block_until_ready(bstate.t_map)
    t0 = time.perf_counter()
    for c in range(6):
        fstate, bstate, idx, op, ys = runner(
            fstate, bstate, idx, xs_dev[c], op
        )
    jax.block_until_ready(bstate.t_map)
    dtB = (time.perf_counter() - t0) / (6 * chunk) * 1e3
    print(f"B device-resident chunk runner    {dtB:8.3f} ms/frame", flush=True)

    # --- C: host->device staging cost only ----------------------------------
    t0 = time.perf_counter()
    for c in range(2, 8):
        pts, m = prepped[c]
        a = jnp.asarray(pts)
        b = jnp.asarray(m)
        jax.block_until_ready((a, b))
    dtC = (time.perf_counter() - t0) / (6 * chunk) * 1e3
    print(f"C host->device chunk staging      {dtC:8.3f} ms/frame", flush=True)

    print(f"overhead A - B - C                {dtA - dtB - dtC:8.3f} ms/frame")


if __name__ == "__main__":
    main()

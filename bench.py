"""Benchmark: full odometry+mapping throughput on one real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's mean map-optimization runtime of 50.16 ms/frame
(`Result/0318_test/mapt.txt`, BASELINE.md) -> 19.94 scans/s. The north-star
target is >=100 scans/s/chip (BASELINE.json).

The bench drives the complete per-scan path (projection, ground removal,
segmentation, feature extraction, two-step scan-to-scan GN, scan-to-map GN,
keyframe append) over a synthetic Jackal-like drive, steady-state timed after
warmup/compilation. Frames are processed strictly sequentially (scan t+1's
initial guess depends on scan t's pose) via the device-resident chunked
runner: `lax.scan` over chunks of scans, one host dispatch per chunk
(`pipeline.py::process_chunk`). Host->device feed (one bulk transfer per
chunk) is included in the timed region.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_SCANS_PER_SEC = 1000.0 / 50.16


def main():
    import jax

    # Persistent XLA compilation cache: recompiles on the relay-attached TPU
    # cost minutes; the disk cache cuts warm process startup to seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
    from lego_loam_tpu.pipeline import LegoLoamPipeline

    # FLAGSHIP configuration: loop closure ON (VERDICT r3 weak #2 — the
    # bench must measure the config the campus artifact runs). The straight
    # course never revisits, so no closure fires, but every per-chunk cost
    # of the loop machinery (snapshot copy, deferred device_get, host
    # candidate scan) is inside the timed region; the coarse/ICP/graph
    # compiles are pre-warmed exactly as tools/campus_run.py does.
    cfg = vlp16()
    cfg = dataclasses.replace(
        cfg, mapping=dataclasses.replace(cfg.mapping, enable_loop_closure=True)
    )
    chunk = int(os.environ.get("BENCH_CHUNK", "16"))
    n_warm_chunks = int(os.environ.get("BENCH_WARMUP_CHUNKS", "2"))
    n_meas_chunks = int(os.environ.get("BENCH_CHUNKS", "20"))
    n = (n_warm_chunks + n_meas_chunks) * chunk

    # Motion-distorted sweeps (each scan rendered while the sensor moves),
    # so the production rel_time warp path is what gets measured.
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))

    pipe = LegoLoamPipeline(cfg)

    # Host-side fixed-shape packing excluded from the timed region (the
    # reference's equivalent — DDS deserialize + pcl::fromROSMsg — is also
    # outside its 50.16 ms/frame mapping time).
    prepped = [
        pipe._prep_many(scans[s : s + chunk]) for s in range(0, n, chunk)
    ]

    pipe.warmup_loop_closure()
    for c in range(n_warm_chunks):
        pipe.process_chunk(prepped[c])
    # device_get, not block_until_ready: the latter has been observed to
    # return before execution completes on the relay-attached TPU, which
    # would silently shrink the timed region.
    jax.device_get(pipe.bstate.t_map)

    # Double-buffered feed: chunk c+1's host->device transfer runs in the
    # pipeline's stager thread while chunk c executes on device (a
    # main-thread jnp.asarray would block for the full transfer — no
    # overlap). The transfers stay inside the timed region; only their
    # latency is hidden, as any real deployment would.
    t0 = time.perf_counter()
    nxt = pipe.stage_chunk_async(prepped[n_warm_chunks])
    for c in range(n_warm_chunks, n_warm_chunks + n_meas_chunks):
        cur = nxt.result()
        if c + 1 < n_warm_chunks + n_meas_chunks:
            nxt = pipe.stage_chunk_async(prepped[c + 1])
        pipe.process_chunk(cur)
    jax.device_get(pipe.bstate.t_map)
    dt = time.perf_counter() - t0

    n_meas = n_meas_chunks * chunk
    scans_per_sec = n_meas / dt
    print(
        json.dumps(
            {
                "metric": "scans_per_sec_per_chip",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Where does the per-frame device time go? Steady-state chunked throughput
of the straight course under component ablations (each config = one jitted
runner; compiles land in the persistent cache).

    python tools/ablate_bench.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def measure(cfg, scans, chunk=32, warm=2, meas=10):
    import jax

    from lego_loam_tpu.pipeline import LegoLoamPipeline

    pipe = LegoLoamPipeline(cfg)
    prepped = [
        pipe._prep_many(scans[s: s + chunk])
        for s in range(0, (warm + meas) * chunk, chunk)
    ]
    pipe.warmup_loop_closure()
    for c in range(warm):
        pipe.process_chunk(prepped[c])
    jax.device_get(pipe.bstate.t_map)
    t0 = time.perf_counter()
    nxt = pipe.stage_chunk_async(prepped[warm])
    for c in range(warm, warm + meas):
        cur = nxt.result()
        if c + 1 < warm + meas:
            nxt = pipe.stage_chunk_async(prepped[c + 1])
        pipe.process_chunk(cur)
    jax.device_get(pipe.bstate.t_map)
    dt = time.perf_counter() - t0
    return meas * chunk / dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from scan_cache import get_or_render

    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.io.synthetic import (
        straight_trajectory, swept_scan_sequence,
    )

    base = vlp16()
    base = dataclasses.replace(
        base,
        mapping=dataclasses.replace(
            base.mapping, enable_loop_closure=True, max_keyframes=20480
        ),
    )
    n = 12 * 32
    poses = straight_trajectory(704, speed=0.15, yaw_rate=0.0)
    scans = get_or_render(
        "bench_straight", {"n": 704, "v": 2},
        lambda: list(swept_scan_sequence(poses, base, noise=0.01, seed=11)),
    )[:n]

    def m(cfg):
        return dataclasses.replace(base, mapping=dataclasses.replace(base.mapping, **cfg))

    def o(cfg):
        return dataclasses.replace(base, odometry=dataclasses.replace(base.odometry, **cfg))

    def p(cfg):
        return dataclasses.replace(base, pipeline=dataclasses.replace(base.pipeline, **cfg))

    variants = {
        "baseline": base,
        "loop_off": m(dict(enable_loop_closure=False)),
        "rigid_scans": p(dict(rigid_scans=True)),
        "map_gn4": m(dict(max_gn_iterations=4)),
        "odo_iters10": o(dict(max_iterations=10)),
        "map_div2": m(dict(mapping_frequency_divider=2)),
        "kf4096": m(dict(max_keyframes=4096)),
    }
    results = {}
    for name, cfg in variants.items():
        sps = measure(cfg, scans)
        results[name] = round(sps, 2)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

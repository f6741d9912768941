"""Campus-scale validation run: a multi-lap, multi-revisit drive with loop
closure enabled (≙ BASELINE.json config 4 / the Stevens 20K-scan workload,
/root/reference/README.md:108-111), sized for the single attached chip.

Runs the full flagship path (chunked device-resident runner, loop closure
on) over a building-dominated campus world, then writes the reference
artifact set plus CAMPUS_RUN.json with: completion, frame count, keyframes,
loop-closure count, steady-state scans/s (first chunk's compile excluded),
odometry-only drift vs map ATE vs post-closure keyframe ATE, and an explicit
`failed` divergence flag (ate_map must beat ate_odom and stay finite).

    python tools/campus_run.py [--laps 3] [--out out_campus]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--straight", type=int, default=150)
    ap.add_argument("--turn", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--out", default="out_campus")
    ap.add_argument("--max-keyframes", type=int, default=4096)
    ap.add_argument("--no-loop", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.io.synthetic import (
        campus_world, lap_trajectory, render_scan_swept,
    )
    from lego_loam_tpu.pipeline import LegoLoamPipeline
    from lego_loam_tpu.utils.metrics import ate_rmse

    cfg = vlp16()
    cfg = dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping,
            enable_loop_closure=not args.no_loop,
            max_keyframes=args.max_keyframes,
        ),
    )

    poses = lap_trajectory(args.laps, args.straight, args.turn)
    world = campus_world(poses)
    n = len(poses)
    print(f"rendering {n} swept scans ...", flush=True)
    t0 = time.perf_counter()

    def render():
        out = []
        for i in range(n):
            p0 = poses[i - 1] if i > 0 else poses[i]
            out.append(
                render_scan_swept(
                    p0, poses[i], cfg, world, noise=0.01, seed=100 + i
                )
            )
        return out

    from scan_cache import get_or_render

    scans = get_or_render(
        "campus",
        {"n": n, "straight": args.straight, "turn": args.turn,
         "laps": args.laps},
        render,
    )
    print(f"rendered in {time.perf_counter() - t0:.1f}s", flush=True)

    pipe = LegoLoamPipeline(cfg)
    # pre-pack chunks (host-side packing excluded from throughput, as in
    # bench.py — the reference's DDS deserialize is outside its timing too)
    C = args.chunk
    prepped = [
        pipe._prep_many(scans[s:s + C]) for s in range(0, n - n % C, C)
    ]

    print("warming loop-closure machinery ...", flush=True)
    t0 = time.perf_counter()
    pipe.warmup_loop_closure()
    print(f"warmed in {time.perf_counter() - t0:.1f}s", flush=True)

    t_start = time.perf_counter()
    t_warm = None  # set after the first chunk completes (compile excluded)
    nxt = pipe.stage_chunk_async(prepped[0])
    for c in range(len(prepped)):
        cur = nxt.result()
        if c + 1 < len(prepped):
            nxt = pipe.stage_chunk_async(prepped[c + 1])
        pipe.process_chunk(cur)
        if c == 0:
            jax.device_get(pipe.bstate.t_map)
            t_warm = time.perf_counter()
        if (c + 1) % 10 == 0:
            done = (c + 1) * C
            print(
                f"frame {done}/{n} kf={int(pipe.bstate.n_kf)} "
                f"loops={len(pipe.loop_factors)} "
                f"({(done - C) / (time.perf_counter() - t_warm):.1f} scans/s)",
                flush=True,
            )
    jax.device_get(pipe.bstate.t_map)  # true sync (block_until_ready lies
    t_end = time.perf_counter()        # on the relay transport)
    n_run = len(prepped) * C
    steady = (n_run - C) / (t_end - t_warm)
    total = n_run / (t_end - t_start)
    pipe.finalize()

    gt = np.stack([t for _, t in poses])[:n_run]
    est = np.asarray(pipe.trajectory["positions"])
    odom = np.asarray(pipe.odom_positions)
    # Pre-closure ATE: the per-frame log keeps each pose as processed
    # (before loop factors rewrote history). Post-closure: the corrected
    # keyframe store (what the reference's pose.txt records).
    ate_map = ate_rmse(est, gt, align=False)
    ate_odom = ate_rmse(odom, gt, align=False)
    _kR, kt, ktimes = pipe.keyframe_trajectory()
    kf_frames = np.clip(
        np.rint(ktimes / cfg.laser.scan_period).astype(int), 0, n_run - 1
    )
    ate_corrected = ate_rmse(kt, gt[kf_frames], align=False)
    finite = bool(np.isfinite(est).all()) and bool(np.isfinite(kt).all())
    # Explicit divergence detection: a working mapping back-end must beat
    # raw odometry; anything else is a loud failure, not a normal artifact.
    failed = (not finite) or not (ate_map < max(ate_odom, 1.0))

    pipe.save_artifacts(args.out)
    from lego_loam_tpu.mapproducts import save_map

    save_map(pipe.bstate, args.out, cfg)

    result = {
        "frames": n_run,
        "scans_per_sec": round(steady, 2),
        "scans_per_sec_incl_compile": round(total, 2),
        "keyframes_total": int(pipe.bstate.n_kf),
        "loop_closures": len(pipe.loop_factors),
        "rejected_frames": pipe.diagnostics.get("rejected_frames", 0),
        "ate_map_m": round(float(ate_map), 4),
        "ate_odom_only_m": round(float(ate_odom), 4),
        "ate_corrected_kf_m": round(float(ate_corrected), 4),
        "finite": finite,
        "failed": failed,
        "laps": args.laps,
    }
    print(json.dumps(result))
    with open("CAMPUS_RUN.json", "w") as f:
        json.dump(result, f, indent=1)
    # Per-check loop-closure diagnostic trail: makes "0 closures" explainable
    # (nearest candidate distance / ICP fitness per check).
    import os

    with open(os.path.join(args.out, "loop_diag.json"), "w") as f:
        json.dump(pipe.loop_diag, f, indent=0)
    checks = [d for d in pipe.loop_diag if d["cand"] >= 0]
    if checks:
        fits = [d.get("icp_fitness") for d in checks if "icp_fitness" in d]
        print(
            f"loop checks with candidate: {len(checks)}; "
            f"icp fitness min/median: "
            f"{(min(fits), sorted(fits)[len(fits)//2]) if fits else 'n/a'}"
        )


if __name__ == "__main__":
    main()

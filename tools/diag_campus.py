"""Diagnose campus-course odometry/mapping drift: run N frames of the lap
course, compare per-frame odometry pose vs ground truth, print error growth
by segment (straight vs turn) and mapping diagnostics.

    python tools/diag_campus.py [--frames 352] [--chunk 16]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=352)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--straight", type=int, default=150)
    ap.add_argument("--turn", type=int, default=25)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--no-map", action="store_true")
    ap.add_argument("--map-search-every", type=int, default=None)
    ap.add_argument("--rebuild-every", type=int, default=None)
    ap.add_argument("--corner-weight", type=float, default=None)
    ap.add_argument("--kf-gate", action="store_true")
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

    cfg = vlp16()
    mkw = dict(enable_loop_closure=args.loop)
    if args.map_search_every is not None:
        mkw["search_every"] = args.map_search_every
    if args.rebuild_every is not None:
        mkw["submap_rebuild_every"] = args.rebuild_every
        mkw["submap_rebuild_dist"] = 0.0
    if args.corner_weight is not None:
        mkw["corner_weight"] = args.corner_weight
    if args.kf_gate:
        mkw["keyframe_gate_always"] = False
    cfg = dataclasses.replace(
        cfg, mapping=dataclasses.replace(cfg.mapping, **mkw)
    )

    full = lap_trajectory(3, args.straight, args.turn)
    world = campus_world(full)
    poses = full[: args.frames]
    n = len(poses)
    print(f"rendering {n} swept scans ...", flush=True)

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
        {"n": n, "straight": args.straight, "turn": args.turn, "laps": 3},
        render,
    )

    pipe = LegoLoamPipeline(cfg)
    t0 = time.perf_counter()
    pipe.run_chunked(scans, chunk=args.chunk)
    dt = time.perf_counter() - t0
    print(f"{n / dt:.1f} scans/s (incl compile)")

    gt_t = np.stack([t for _, t in poses])
    gt_R = np.stack([R for R, _ in poses])
    odom = np.asarray(pipe.odom_positions)
    est = np.asarray(pipe.trajectory["positions"])

    # per-frame odometry error + yaw error
    per = args.straight + args.turn
    print("\nframe  seg        odom_err   map_err   z_odom   z_map  minlam  iters cf      sm_c  sm_s   nsel")
    recs = pipe.diagnostics["records"]
    for k in range(0, n, 8):
        seg = "turn" if (k % per) >= args.straight else "straight"
        oe = np.linalg.norm(odom[k] - gt_t[k])
        me = np.linalg.norm(est[k] - gt_t[k]) if k < len(est) else float("nan")
        r = recs[k] if k < len(recs) else {"min_lambda": np.nan, "iterations": -1, "cf_mean": np.nan, "rejected": False}
        print(
            f"{k:5d}  {seg:8s}  {oe:8.3f}  {me:8.3f}  {odom[k][2]:7.3f} "
            f"{est[k][2] if k < len(est) else np.nan:7.3f} "
            f"{r['min_lambda']:8.2f} {r['iterations']:3d} {r['cf_mean']:.4f}"
            f" {r.get('n_submap_corner', -1):5d} {r.get('n_submap_surf', -1):6d}"
            f" {r.get('n_sel', -1):5d}"
            f"{' REJ' if r.get('rejected') else ''}"
        )

    if args.loop:
        acc = [d for d in pipe.loop_diag if d.get("accepted")]
        print(f"\nloop checks: {len(pipe.loop_diag)}  accepted: {len(acc)}")
        for d in pipe.loop_diag:
            if d.get("cand", -1) >= 0:
                print("  ", {k: (round(v, 3) if isinstance(v, float) else v)
                             for k, v in d.items() if k != "graph_cost"})

    np.savez(
        "/tmp/diag_traj.npz",
        est=est, odom=odom, gt=gt_t,
        prior=np.asarray(pipe.prior_positions) if getattr(pipe, "prior_positions", None) is not None else np.zeros((0, 3)),
        minlam=np.array([r["min_lambda"] for r in recs]),
    )

    # relative per-frame odometry motion error (is the front-end locally good?)
    d_est = np.diff(odom, axis=0)
    d_gt = np.diff(gt_t, axis=0)
    step_err = np.linalg.norm(d_est - d_gt, axis=1)
    for lo, hi, name in [(1, args.straight, "straight1"),
                         (args.straight, per, "turn1"),
                         (per, per + args.straight, "straight2")]:
        hi = min(hi, n - 1)
        if lo >= hi:
            continue
        s = step_err[lo:hi]
        print(f"{name}: step err mean {s.mean()*100:.2f} cm  max {s.max()*100:.2f} cm")


if __name__ == "__main__":
    main()

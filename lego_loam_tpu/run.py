"""Command-line runner — the launch-layer equivalent.

≙ `ros2 launch lego_loam_sr run.launch.py lidar_type:=VLP-16`
(`launch/run.launch.py`) plus the offline KITTI service
(`imageProjection.cpp:224-299`):

    python -m lego_loam_tpu.run --preset VLP-16 --kitti /path/to/seq --out out/
    python -m lego_loam_tpu.run --preset VLP-16 --rosbag /path/to/bag --topic /velodyne_points
    python -m lego_loam_tpu.run --preset VLP-16 --synthetic 100

Writes the reference-parity artifact set (pose.txt, mapt.txt,
MapIterTimes.txt, LocalInfo.txt) plus the map PCDs to --out.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="VLP-16", choices=["VLP-16", "VLP-32c", "HDL-64E"])
    p.add_argument("--kitti", help="KITTI sequence dir (velodyne/*.bin)")
    p.add_argument("--rosbag", help="rosbag2 dir or .db3 file")
    p.add_argument("--topic", default="/velodyne_points")
    p.add_argument("--imu-topic", default=None,
                   help="IMU topic (enables scan undistortion, ≙ /imu_type)")
    p.add_argument("--odom-topic", default=None,
                   help="wheel-odometry topic (≙ /odom2)")
    p.add_argument("--odom-prior-mode", default="init",
                   choices=["init", "override"],
                   help="how the odom prior is used when --odom-topic is set")
    p.add_argument("--synthetic", type=int, help="run N synthetic frames")
    p.add_argument("--out", default="out")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--loop-closure", action="store_true")
    p.add_argument("--no-map-update", action="store_true",
                   help="reference's as-committed mapping ablation")
    p.add_argument("--checkpoint", help="save final state to this npz")
    p.add_argument("--resume", help="resume from a state npz")
    p.add_argument("--profile", action="store_true")
    # Re-localization mode (≙ ReMapping/HighDenseMapping launch flags +
    # /initialpose): localize the stream in a previously saved dense map.
    p.add_argument("--remap", help="saved map dir (denseCloud.pcd) to "
                   "re-localize in instead of mapping")
    # Multi-host entry (jax.distributed): join before building the pipeline
    # so the mesh spans every host's chips.
    p.add_argument("--coordinator", help="multi-host coordinator addr:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (the env's sitecustomize "
                        "overrides JAX_PLATFORMS, so use this flag)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if args.coordinator or args.num_processes:
        from .launch import init_from_args

        init_from_args(args.coordinator, args.num_processes, args.process_id)

    import dataclasses

    import numpy as np

    from .config import get_config
    from .pipeline import LegoLoamPipeline

    cfg = get_config(args.preset)
    mapping = cfg.mapping
    if args.loop_closure:
        mapping = dataclasses.replace(mapping, enable_loop_closure=True)
    if args.no_map_update:
        mapping = dataclasses.replace(mapping, enable_map_update=False)
    cfg = dataclasses.replace(cfg, mapping=mapping)
    if args.imu_topic:
        cfg = dataclasses.replace(
            cfg,
            pipeline=dataclasses.replace(cfg.pipeline, use_imu_undistortion=True),
        )
    if args.odom_topic:
        cfg = dataclasses.replace(
            cfg,
            odometry=dataclasses.replace(
                cfg.odometry, odom_prior_mode=args.odom_prior_mode
            ),
        )

    pipe = LegoLoamPipeline(cfg, profile=args.profile)
    if args.resume:
        from . import checkpoint

        checkpoint.load(pipe, args.resume)
        print(f"resumed at frame {pipe.frame_idx}")

    def scan_stream():
        if args.kitti:
            from .native import ScanFeeder
            import os

            vel = os.path.join(args.kitti, "velodyne")
            files = sorted(
                os.path.join(vel, f) for f in os.listdir(vel) if f.endswith(".bin")
            )
            feeder = ScanFeeder(files, cap=cfg.laser.max_points)
            while True:
                item = feeder.next()
                if item is None:
                    return
                idx, buf, mask, ts = item
                pts = np.where(mask[:, None], buf, np.nan)
                yield pts, ts, None, None
        elif args.rosbag:
            from .io.rosbag2 import Rosbag2Reader
            from .math import se3 as _se3
            import jax.numpy as _jnp

            rdr = Rosbag2Reader(args.rosbag)

            imu_rows = []
            if args.imu_topic:
                # (t_abs, roll, pitch, yaw, ax, ay, az) sorted by time
                for t, q, _w, acc in rdr.messages(args.imu_topic):
                    R = np.asarray(_se3.quat_to_matrix(_jnp.asarray(q)))
                    r_, p_, y_ = np.asarray(
                        _se3.matrix_to_euler_zyx(_jnp.asarray(R))
                    )
                    imu_rows.append((t, r_, p_, y_, *acc))
                imu_rows = np.asarray(imu_rows, np.float64)

            odom_rows = []
            if args.odom_topic:
                for t, pos, q, _v, _w in rdr.messages(args.odom_topic):
                    R = np.asarray(_se3.quat_to_matrix(_jnp.asarray(q)))
                    odom_rows.append((t, R, np.asarray(pos)))

            def imu_window(ts):
                if not args.imu_topic or not len(imu_rows):
                    return None
                sp = cfg.laser.scan_period
                sel = (imu_rows[:, 0] >= ts) & (imu_rows[:, 0] <= ts + sp)
                w = imu_rows[sel].copy()
                w[:, 0] -= ts  # times relative to scan start
                return w.astype(np.float32)

            def odom_at(ts):
                if not args.odom_topic or not odom_rows:
                    return None
                k = min(
                    range(len(odom_rows)),
                    key=lambda i: abs(odom_rows[i][0] - ts),
                )
                return odom_rows[k][1], odom_rows[k][2]

            for t, xyz in rdr.scan_stream(args.topic):
                yield xyz, t, imu_window(t), odom_at(t)
        elif args.synthetic:
            from .io.synthetic import render_scan, straight_trajectory

            poses = straight_trajectory(args.synthetic, speed=0.15,
                                        yaw_rate=np.deg2rad(1.0))
            for i, (R, t) in enumerate(poses):
                yield render_scan(R, t, cfg, noise=0.01, seed=i), i * 0.1, None, None
        else:
            p.error("one of --kitti/--rosbag/--synthetic required")

    if args.remap:
        # Localization-only session against the saved dense map
        # (≙ HighDense re-mapping, publishHighDenseMap.cpp:13-67).
        import os

        from .mapproducts import load_high_dense_map
        from .relocalize import localize_scan, map_state_from_cloud

        dense, _ = load_high_dense_map(
            os.path.join(args.remap, "denseCloud.pcd")
        )
        R_cur = np.eye(3, dtype=np.float32)
        t_cur = np.zeros(3, np.float32)
        traj = []
        n = 0
        t0 = time.perf_counter()
        submap = map_state_from_cloud(dense, cfg, center=t_cur)
        for pts, ts, _imu, _odom in scan_stream():
            R_cur, t_cur, diag = localize_scan(pts, submap, R_cur, t_cur, cfg)
            traj.append(np.asarray(t_cur))
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
        dt = time.perf_counter() - t0
        print(f"localized {n} scans in {dt:.1f} s "
              f"({n / max(dt, 1e-9):.1f} scans/s)")
        os.makedirs(args.out, exist_ok=True)
        np.savetxt(os.path.join(args.out, "relocalized.txt"), np.stack(traj))
        return

    t0 = time.perf_counter()
    n = 0
    for pts, ts, imu, odom in scan_stream():
        pipe.process_scan(pts, ts, imu_samples=imu, odom_pose=odom)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
        if n % 100 == 0:
            print(f"frame {n} ({n / (time.perf_counter() - t0):.1f} scans/s)")

    import jax

    jax.block_until_ready(pipe.bstate.t_map)
    dt = time.perf_counter() - t0
    print(f"processed {n} scans in {dt:.1f} s ({n / max(dt, 1e-9):.1f} scans/s)")

    pipe.save_artifacts(args.out)
    from .mapproducts import save_map

    save_map(pipe.bstate, args.out, cfg)
    print(f"artifacts written to {args.out}")

    if args.checkpoint:
        from . import checkpoint

        checkpoint.save(pipe, args.checkpoint)
        print(f"state saved to {args.checkpoint}")


if __name__ == "__main__":
    main()

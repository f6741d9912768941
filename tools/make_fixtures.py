"""Render a synthetic course into REAL product-surface input formats:

- a KITTI-format sequence dir (velodyne/%06d.bin float32 x,y,z,intensity +
  times.txt) — ≙ the reference's offline KITTI service input
  (`imageProjection.cpp:224-299`),
- a rosbag2 SQLite bag (bag_0.db3 with CDR-encoded
  sensor_msgs/msg/PointCloud2 rows) — ≙ the live `ros2 bag play` feed
  (`run.launch.py`).

Used by tests/test_cli_e2e.py to drive `python -m lego_loam_tpu.run --kitti/
--rosbag` end-to-end (VERDICT r4 #5: the actual product surface must be
executed, not just format-tested).

    python tools/make_fixtures.py --out /tmp/fixtures --frames 24
"""

import argparse
import os
import sqlite3
import struct

import numpy as np


def _cdr_string(s):
    b = s.encode() + b"\x00"
    return struct.pack("<I", len(b)) + b


def _pad(buf, align):
    return buf + b"\x00" * ((-len(buf)) % align)


def make_pointcloud2_blob(xyz, intensity, stamp_sec, stamp_nsec):
    """CDR-encoded sensor_msgs/PointCloud2 (x,y,z,intensity float32)."""
    n = len(xyz)
    body = b""
    body += struct.pack("<iI", stamp_sec, stamp_nsec)
    body += _cdr_string("velodyne")
    body = _pad(body, 4)
    body += struct.pack("<II", 1, n)  # height, width
    body += struct.pack("<I", 4)  # nfields
    for i, name in enumerate(["x", "y", "z", "intensity"]):
        body = _pad(body, 4)
        body += _cdr_string(name)
        body = _pad(body, 4)
        body += struct.pack("<I", i * 4)  # offset
        body += struct.pack("<B", 7)  # FLOAT32
        body = _pad(body, 4)
        body += struct.pack("<I", 1)  # count
    body += struct.pack("<B", 0)  # is_bigendian
    body = _pad(body, 4)
    body += struct.pack("<II", 16, 16 * n)  # point_step, row_step
    data = (
        np.concatenate([xyz, intensity[:, None]], axis=1)
        .astype("<f4")
        .tobytes()
    )
    body += struct.pack("<I", len(data)) + data
    return b"\x00\x01\x00\x00" + body


def write_kitti(seq_dir, scans, times):
    vel = os.path.join(seq_dir, "velodyne")
    os.makedirs(vel, exist_ok=True)
    for i, pts in enumerate(scans):
        finite = pts[np.isfinite(pts).all(axis=1)]
        arr = np.concatenate(
            [finite, np.ones((len(finite), 1), np.float32)], axis=1
        ).astype(np.float32)
        arr.tofile(os.path.join(vel, f"{i:06d}.bin"))
    np.savetxt(os.path.join(seq_dir, "times.txt"), np.asarray(times))


def write_rosbag2(bag_dir, scans, times, topic="/velodyne_points"):
    os.makedirs(bag_dir, exist_ok=True)
    db_path = os.path.join(bag_dir, "bag_0.db3")
    if os.path.exists(db_path):
        os.remove(db_path)
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE topics (id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
        " serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    con.execute(
        "CREATE TABLE messages (id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    con.execute(
        f"INSERT INTO topics VALUES (1, '{topic}',"
        " 'sensor_msgs/msg/PointCloud2', 'cdr', '')"
    )
    for i, (pts, t) in enumerate(zip(scans, times)):
        finite = pts[np.isfinite(pts).all(axis=1)].astype(np.float32)
        inten = np.ones((len(finite),), np.float32)
        blob = make_pointcloud2_blob(
            finite, inten, int(t), int((t - int(t)) * 1e9)
        )
        con.execute(
            "INSERT INTO messages VALUES (?, 1, ?, ?)",
            (i + 1, int(t * 1e9), blob),
        )
    con.commit()
    con.close()
    return db_path


def render_fixture_scans(frames, cfg=None, noise=0.005):
    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory

    cfg = cfg or vlp16()
    poses = straight_trajectory(frames, speed=0.2)
    scans = [
        render_scan(R, t, cfg, noise=noise, seed=300 + i)
        for i, (R, t) in enumerate(poses)
    ]
    times = [i * cfg.laser.scan_period for i in range(frames)]
    return scans, times, poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lego_fixtures")
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    scans, times, _poses = render_fixture_scans(args.frames)
    seq = os.path.join(args.out, "kitti", "00")
    write_kitti(seq, scans, times)
    bag = os.path.join(args.out, "bag")
    write_rosbag2(bag, scans, times)
    print(f"kitti: {seq}\nrosbag2: {bag}")


if __name__ == "__main__":
    main()

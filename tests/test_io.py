"""IO tests: PCD roundtrip, rosbag2 CDR parsing, KITTI bin, checkpoint."""

import os
import sqlite3
import struct
import tempfile

import numpy as np
import pytest


def test_pcd_roundtrip():
    from lego_loam_tpu.io.pcd import load_pcd, save_pcd

    rs = np.random.RandomState(0)
    xyz = rs.randn(100, 3).astype(np.float32)
    inten = rs.rand(100).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.pcd")
        save_pcd(p, xyz, inten, binary=True)
        x2, i2 = load_pcd(p)
        np.testing.assert_allclose(x2, xyz, rtol=1e-6)
        np.testing.assert_allclose(i2, inten, rtol=1e-6)

        p2 = os.path.join(d, "b.pcd")
        save_pcd(p2, xyz, binary=False)
        x3, i3 = load_pcd(p2)
        np.testing.assert_allclose(x3, xyz, atol=1e-5)
        assert i3 is None


def _cdr_string(s):
    b = s.encode() + b"\x00"
    out = struct.pack("<I", len(b)) + b
    return out


def _pad(buf, align, base=0):
    pad = (-(len(buf) - base)) % align
    return buf + b"\x00" * pad


def _make_pointcloud2_blob(xyz, intensity):
    """Build a CDR-encoded sensor_msgs/PointCloud2 (x,y,z,intensity f32)."""
    n = len(xyz)
    body = b""
    # header: stamp (sec, nsec) + frame_id
    body += struct.pack("<iI", 7, 500)
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
    data = np.concatenate([xyz, intensity[:, None]], axis=1).astype("<f4").tobytes()
    body += struct.pack("<I", len(data)) + data
    return b"\x00\x01\x00\x00" + body


def test_rosbag2_pointcloud_roundtrip():
    from lego_loam_tpu.io.rosbag2 import Rosbag2Reader

    rs = np.random.RandomState(1)
    xyz = rs.randn(50, 3).astype(np.float32)
    inten = rs.rand(50).astype(np.float32)
    blob = _make_pointcloud2_blob(xyz, inten)

    with tempfile.TemporaryDirectory() as d:
        db_path = os.path.join(d, "bag_0.db3")
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
            "INSERT INTO topics VALUES (1, '/velodyne_points',"
            " 'sensor_msgs/msg/PointCloud2', 'cdr', '')"
        )
        con.execute(
            "INSERT INTO messages VALUES (1, 1, 123456789, ?)", (blob,)
        )
        con.commit()
        con.close()

        rdr = Rosbag2Reader(d)
        msgs = list(rdr.scan_stream("/velodyne_points"))
        assert len(msgs) == 1
        t, got = msgs[0]
        np.testing.assert_allclose(got, xyz, rtol=1e-6)
        assert abs(t - (7 + 500e-9)) < 1e-6


def test_kitti_bin(tmp_path):
    from lego_loam_tpu.io.kitti import KittiSequence

    rs = np.random.RandomState(2)
    seq = tmp_path / "00"
    (seq / "velodyne").mkdir(parents=True)
    pts = rs.randn(3, 200, 4).astype(np.float32)
    for i in range(3):
        pts[i].tofile(seq / "velodyne" / f"{i:06d}.bin")
    np.savetxt(seq / "times.txt", [0.0, 0.1, 0.2])

    ks = KittiSequence(str(seq))
    assert len(ks) == 3
    scans = list(ks.scans())
    np.testing.assert_allclose(scans[1][0], pts[1][:, :3], rtol=1e-6)
    assert scans[2][1] == pytest.approx(0.2)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    import dataclasses
    from lego_loam_tpu import checkpoint
    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.io.synthetic import render_scan
    from lego_loam_tpu.pipeline import LegoLoamPipeline
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_backend import small_cfg

    cfg = small_cfg()
    pipe = LegoLoamPipeline(cfg)
    for i in range(2):
        pipe.process_scan(
            render_scan(np.eye(3), np.array([0.2 * i, 0, 0]), cfg, seed=i)
        )

    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(pipe, p)

    pipe2 = LegoLoamPipeline(cfg)
    checkpoint.load(pipe2, p)
    assert pipe2.frame_idx == pipe.frame_idx
    import jax

    np.testing.assert_allclose(
        jax.device_get(pipe2.bstate.t_map), jax.device_get(pipe.bstate.t_map)
    )
    assert int(pipe2.bstate.n_kf) == int(pipe.bstate.n_kf)
    # resumed pipeline keeps processing
    out = pipe2.process_scan(render_scan(np.eye(3), np.array([0.4, 0, 0]), cfg, seed=9))
    assert np.isfinite(jax.device_get(out["t_map"])).all()

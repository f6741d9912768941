"""Map products: /save_map equivalents, global map assembly, HighDense reload.

≙ MapOptimization's artifact surface (`mapOptmization.cpp:344-434`
saveMapService, `:775-892` publishGlobalMap, `:737-773`
publishKeyPosesAndFrames) and the PCDPublisher re-localization node
(`publishHighDenseMap.cpp:13-67`). Outputs use `io/pcd.py`; voxel filtering
for the big exports runs on host numpy (one-shot, not in the hot loop).
"""

from __future__ import annotations

import os

import numpy as np
import jax

from .config import LegoLoamConfig
from .io.pcd import load_pcd, save_pcd
from .utils.metrics import write_pose_txt


def _host_voxel_ds(xyz: np.ndarray, leaf: float) -> np.ndarray:
    if len(xyz) == 0 or leaf <= 0:
        return xyz
    keys = np.floor(xyz / leaf).astype(np.int64)
    # lexicographic unique
    _, idx = np.unique(keys, axis=0, return_index=True)
    return xyz[np.sort(idx)]


def gather_keyframe_clouds(bstate, max_kf=None):
    """Pull keyframe clouds+poses to host, transformed to map frame.

    Returns dict with 'corner', 'surf' (N,3) arrays and poses."""
    slots = bstate.ordered_slots()  # resident keyframes, oldest -> newest
    if max_kf:
        slots = slots[-max_kf:]
    n = len(slots)
    sel = np.asarray(slots)
    host = jax.device_get(
        {
            "R": bstate.kf_R[sel],
            "t": bstate.kf_t[sel],
            "c": bstate.kf_corner_view()[sel],
            "cm": bstate.kf_corner_mask[sel],
            "s": bstate.kf_surf_view()[sel],
            "sm": bstate.kf_surf_mask[sel],
            "time": bstate.kf_time[sel],
        }
    )
    corners = []
    surfs = []
    for k in range(n):
        cw = host["c"][k][host["cm"][k]] @ host["R"][k].T + host["t"][k]
        sw = host["s"][k][host["sm"][k]] @ host["R"][k].T + host["t"][k]
        corners.append(cw)
        surfs.append(sw)
    return {
        "corner": np.concatenate(corners) if corners else np.zeros((0, 3)),
        "surf": np.concatenate(surfs) if surfs else np.zeros((0, 3)),
        "corner_per_kf": corners,
        "surf_per_kf": surfs,
        "poses_R": host["R"],
        "poses_t": host["t"],
        "times": host["time"],
    }


def save_map(bstate, out_dir: str, cfg: LegoLoamConfig, dense: bool = True):
    """≙ saveMapService (mapOptmization.cpp:344-434): writes cornerMap.pcd,
    surfaceMap.pcd, finalCloud.pcd, denseCloud.pcd, trajectory.pcd, pose.txt."""
    os.makedirs(out_dir, exist_ok=True)
    g = gather_keyframe_clouds(bstate)
    m = cfg.mapping

    corner = _host_voxel_ds(g["corner"], m.corner_leaf)
    surf = _host_voxel_ds(g["surf"], m.surf_leaf)
    final = np.concatenate([corner, surf]) if len(corner) + len(surf) else np.zeros((0, 3))

    save_pcd(os.path.join(out_dir, "cornerMap.pcd"), corner)
    save_pcd(os.path.join(out_dir, "surfaceMap.pcd"), surf)
    save_pcd(os.path.join(out_dir, "finalCloud.pcd"), final)
    if dense:
        dense_cloud = np.concatenate([g["corner"], g["surf"]]) if len(g["corner"]) + len(g["surf"]) else np.zeros((0, 3))
        save_pcd(os.path.join(out_dir, "denseCloud.pcd"), dense_cloud)
    save_pcd(os.path.join(out_dir, "trajectory.pcd"), g["poses_t"])

    from .math import se3
    import jax.numpy as jnp

    rpys = np.stack(
        jax.device_get(se3.matrix_to_euler_zyx(jnp.asarray(g["poses_R"]))), axis=-1
    ) if len(g["poses_R"]) else np.zeros((0, 3))
    write_pose_txt(
        os.path.join(out_dir, "pose.txt"), g["poses_t"], rpys, g["times"]
    )
    return out_dir


def global_map(bstate, center, radius: float, cfg: LegoLoamConfig):
    """≙ publishGlobalMap (mapOptmization.cpp:775-892): keyframes within
    `radius` of `center`, concatenated and 1.0 m voxel-filtered."""
    g = gather_keyframe_clouds(bstate)
    if len(g["poses_t"]) == 0:
        return np.zeros((0, 3))
    d = np.linalg.norm(g["poses_t"] - np.asarray(center)[None, :], axis=1)
    keep = d < radius
    sel = [
        c
        for k in range(len(keep))
        if keep[k]
        for c in (g["corner_per_kf"][k], g["surf_per_kf"][k])
    ]
    cloud = np.concatenate(sel) if sel else np.zeros((0, 3))
    return _host_voxel_ds(cloud, cfg.mapping.global_leaf)


def load_high_dense_map(pcd_path: str, rotate: bool = False):
    """≙ PCDPublisher (publishHighDenseMap.cpp:13-67): load a saved dense
    map for re-localization. The reference applies Rz(90°)·Rx(90°) to undo
    the LOAM camera-axis convention; our maps are already lidar-frame, so
    rotation is off by default."""
    xyz, inten = load_pcd(pcd_path)
    if rotate:
        Rz = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        Rx = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])
        xyz = xyz @ (Rz @ Rx).T
    return xyz, inten

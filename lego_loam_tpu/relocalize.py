"""Re-localization against a saved map (≙ the reference's /initialpose +
HighDense re-mapping mode).

The reference's flow: `/initialpose` sets a flag that terminates the mapping
run loop (`mapOptmization.cpp:437-456`, `:1922-1924`); a new session then
starts with `ReMapping:=true`, where PCDPublisher republishes the saved
`denseCloud.pcd` (`publishHighDenseMap.cpp:13-67`) and the stack localizes
inside it. Here that becomes concrete host API:

- `LegoLoamPipeline.request_stop()` ≙ the /initialpose flag (honored by
  `run()` / `run_chunked()`),
- `map_state_from_cloud()` turns a loaded dense cloud into a fixed `MapState`
  submap,
- `localize_scan()` runs the front-end feature extraction plus the scan-to-map
  GN against that fixed submap — localization without mapping.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .mapping import scan_to_map
from .types import MapState


def map_state_from_cloud(
    map_xyz: np.ndarray, cfg: LegoLoamConfig, center=None
) -> MapState:
    """Build a fixed localization submap from a dense map cloud.

    The HighDense map is an undifferentiated point cloud (no corner/surf
    split), so the cropped cloud feeds BOTH residual channels: scan corner
    features find their lines where the dense map has edge structure (the
    line-fit eigen gate rejects non-edge neighborhoods), scan surf features
    fit planes. Points are cropped to `surrounding_keyframe_search_radius`
    around `center` and voxel-filtered at the submap leaves on host
    (one-shot)."""
    m = cfg.mapping
    pts = np.asarray(map_xyz, np.float32)
    if center is not None:
        d = np.linalg.norm(pts - np.asarray(center, np.float32)[None], axis=1)
        pts = pts[d < m.surrounding_keyframe_search_radius]

    def ds(cloud, leaf, cap):
        if leaf > 0 and len(cloud):
            keys = np.floor(cloud / leaf).astype(np.int64)
            _, idx = np.unique(keys, axis=0, return_index=True)
            cloud = cloud[np.sort(idx)]
        buf = np.zeros((cap, 3), np.float32)
        k = min(len(cloud), cap)
        buf[:k] = cloud[:k]
        msk = np.zeros((cap,), bool)
        msk[:k] = True
        return jnp.asarray(buf), jnp.asarray(msk)

    s_xyz, s_m = ds(pts, m.submap_surf_leaf, m.max_submap_surf)
    c_xyz, c_m = ds(pts, m.corner_leaf, m.max_submap_corner)
    return MapState(
        corner_xyz=c_xyz, corner_mask=c_m, surf_xyz=s_xyz, surf_mask=s_m
    )


def localize_scan(
    points: np.ndarray,
    submap: MapState,
    R0,
    t0,
    cfg: LegoLoamConfig,
    key=None,
):
    """Localize one raw scan in a fixed map: front-end feature extraction
    (projection -> ground -> segmentation -> features -> scan DS) then the
    scan-to-map GN against `submap` from the initial guess (R0, t0).

    Returns (R, t, MapDiag). Pure function of its inputs — jit-cacheable."""
    from .backend import downsample_current_scan
    from .frontend import frontend_prepass

    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    msk = np.zeros((n,), bool)
    k = min(len(points), n)
    finite = np.isfinite(points[:k]).all(axis=1)
    buf[:k] = np.nan_to_num(points[:k])
    msk[:k] = finite

    if key is None:
        key = jax.random.PRNGKey(0)

    @jax.jit
    def _loc(pts, mask, R0, t0, key):
        _grid, seg, feats = frontend_prepass(pts, mask, cfg, key)
        c_xyz, c_m, s_xyz, s_m = downsample_current_scan(
            feats, seg.outlier_xyz, seg.outlier_mask, cfg
        )
        return scan_to_map(c_xyz, c_m, s_xyz, s_m, R0, t0, submap, cfg)

    return _loc(
        jnp.asarray(buf), jnp.asarray(msk),
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32), key,
    )

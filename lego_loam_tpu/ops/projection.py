"""Range-image projection: unordered cloud -> (H, W) polar grid.

TPU-native rewrite of `ImageProjection::projectPointCloud`
(`imageProjection.cpp:301-428`): one vectorized scatter over a fixed-size
padded point array instead of a per-point loop. Also covers the VLP-32c
irregular-row mapping (`imageProjection.cpp:349-427`) via a dense-bin
presence/cumsum instead of host-side sort+unique.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LegoLoamConfig
from ..types import ScanGrid

_INVALID_RANGE = jnp.inf


def _vlp32c_rows(elev, ang_bottom, quant, max_bins=256):
    """Map quantized elevation bins to dense row indices.

    The reference sorts the observed bins, uniques them, and linearly scans to
    find each point's row (`imageProjection.cpp:365-404`). Here: mark observed
    bins in a fixed table, prefix-sum to get dense indices, gather.
    """
    bins = jnp.floor((elev + ang_bottom) / quant).astype(jnp.int32)
    ok = bins >= 0
    clamped = jnp.clip(bins, 0, max_bins - 1)
    present = jnp.zeros((max_bins,), jnp.int32).at[clamped].max(ok.astype(jnp.int32))
    dense = jnp.cumsum(present) - 1  # row index per bin
    return jnp.where(ok, dense[clamped], -1), ok


def project_point_cloud(points, mask, cfg: LegoLoamConfig) -> ScanGrid:
    """points: (N, 3) float32 lidar-frame xyz; mask: (N,) bool valid points.

    Returns a ScanGrid with range/xyz/valid/rel_time populated; ground and
    label are initialized to -1 and filled by later stages.
    """
    laser = cfg.laser
    H, W = laser.num_vertical_scans, laser.num_horizontal_scans

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    rng = jnp.sqrt(x * x + y * y + z * z)
    ok = mask & (rng > 0.1) & jnp.isfinite(rng)

    elev = jnp.arcsin(jnp.where(ok, z / jnp.maximum(rng, 1e-12), 0.0))
    if laser.use_vlp32c:
        row, row_ok = _vlp32c_rows(elev, laser.ang_bottom, laser.vlp32c_row_quant)
        ok = ok & row_ok
    else:
        # Nearest-beam assignment. (The reference truncates, imageProjection
        # .cpp:316 — identical for exact beam angles, but truncation flips
        # rows on epsilon noise at bin edges.)
        row = jnp.round((elev + laser.ang_bottom) / laser.ang_res_y).astype(jnp.int32)
    ok = ok & (row >= 0) & (row < H)

    # Column from azimuth, 0 at -y (rear), increasing clockwise when viewed
    # from above — matches `columnIdn = -round((atan2(x,y) - pi/2)/res) + W/2`
    # (imageProjection.cpp:321-323).
    az = jnp.arctan2(x, y)
    col = (
        -jnp.round((az - jnp.pi / 2.0) / laser.ang_res_x).astype(jnp.int32) + W // 2
    )
    col = jnp.where(col >= W, col - W, col)
    ok = ok & (col >= 0) & (col < W)

    # Scatter into the grid; duplicate hits on a cell resolve by min range
    # (the reference keeps whichever point came last in the packet — min range
    # is the deterministic, physically-sensible tie-break).
    flat = jnp.where(ok, row * W + col, H * W)  # overflow slot for invalid
    grid_rng = jnp.full((H * W + 1,), jnp.float32(_INVALID_RANGE))
    grid_rng = grid_rng.at[flat].min(jnp.where(ok, rng, _INVALID_RANGE))

    # Winner-take-all xyz: re-scatter point index where this point's range
    # equals the cell min (ties: min index).
    won = ok & (rng <= grid_rng[flat] + 0.0)
    idx_src = jnp.where(won, jnp.arange(points.shape[0], dtype=jnp.int32), 0)
    grid_idx = jnp.zeros((H * W + 1,), jnp.int32).at[
        jnp.where(won, flat, H * W)
    ].max(idx_src)

    valid = (grid_rng[: H * W] < _INVALID_RANGE).reshape(H, W)
    xyz = jnp.where(
        valid.reshape(H * W, 1), points[grid_idx[: H * W]], 0.0
    ).reshape(H, W, 3)
    rng_grid = grid_rng[: H * W].reshape(H, W)

    # In-scan relative time from column position (one sweep = scan_period);
    # replaces the start/end-orientation interpolation of `adjustDistortion`
    # (featureAssociation.cpp:565-789).
    rel = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.float32) / float(W))[None, :], (H, W)
    )

    return ScanGrid(
        xyz=xyz,
        range=rng_grid,
        valid=valid,
        ground=jnp.full((H, W), -1, jnp.int8),
        label=jnp.full((H, W), -1, jnp.int32),
        rel_time=jnp.where(valid, rel, 0.0),
    )


# ---------------------------------------------------------------------------
# Range-image feed: the host packs each scan into a (H, W) uint16 range grid
# (+ int8 azimuth residuals + per-row beam elevations); the device
# reconstructs xyz analytically. 3x fewer feed bytes than int16 xyz and no
# device-side scatter — the grid IS the projection. Quantization is radial
# only (feed_quant meters), so surfaces don't snap to a cartesian lattice
# the way whole-point quantization makes them.
# ---------------------------------------------------------------------------


def host_pack_range_image(points, cfg: LegoLoamConfig):
    """numpy: (N, 3) raw cloud -> (rimg uint16 (H,W), az_resid int8 (H,W),
    elev_resid int8 (H,W), row_elev float32 (H,)). Same row/col formulas and
    min-range tie-break as project_point_cloud; NaN rows = misses. The int8
    residual planes recover each point's exact azimuth AND elevation vs the
    bin centers — without the elevation plane, irregular-beam sensors
    (real VLP-32c) reconstruct with up to bin-width elevation error when
    adjacent beams share a quantization bin."""
    import numpy as np

    laser = cfg.laser
    H, W = laser.num_vertical_scans, laser.num_horizontal_scans
    q = cfg.pipeline.feed_quant or 0.004

    pts = np.asarray(points, np.float32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    with np.errstate(invalid="ignore"):
        rng = np.sqrt(x * x + y * y + z * z)
        ok = np.isfinite(rng) & (rng > 0.1)
        elev = np.arcsin(np.where(ok, z / np.maximum(rng, 1e-12), 0.0))

    if laser.use_vlp32c:
        quant = laser.vlp32c_row_quant
        bins = np.floor((elev + laser.ang_bottom) / quant).astype(np.int64)
        ok = ok & (bins >= 0)
        ubins = np.unique(bins[ok])
        lut = {b: i for i, b in enumerate(ubins)}
        row = np.array([lut.get(b, -1) for b in bins], np.int64)
        row_elev = ((ubins.astype(np.float32) + 0.5) * quant - laser.ang_bottom)
        row_elev = np.pad(
            row_elev.astype(np.float32), (0, max(0, H - len(row_elev)))
        )[:H]
    else:
        row = np.round((elev + laser.ang_bottom) / laser.ang_res_y).astype(
            np.int64
        )
        row_elev = (
            np.arange(H, dtype=np.float32) * laser.ang_res_y - laser.ang_bottom
        )
    ok = ok & (row >= 0) & (row < H)

    az = np.arctan2(np.nan_to_num(x), np.nan_to_num(y))
    col = (
        -np.round((az - np.pi / 2.0) / laser.ang_res_x).astype(np.int64)
        + W // 2
    )
    col = np.where(col >= W, col - W, col)
    ok = ok & (col >= 0) & (col < W)

    flat = np.where(ok, row * W + col, H * W)
    order = np.lexsort((np.where(ok, rng, np.inf), flat))
    f_s = flat[order]
    first = np.concatenate([[True], f_s[1:] != f_s[:-1]]) & (f_s < H * W)
    win = order[first]

    rimg = np.zeros((H * W,), np.uint16)
    rimg[flat[win]] = np.clip(np.rint(rng[win] / q), 1, 65535).astype(
        np.uint16
    )
    # azimuth residual vs the column-center ray, in half-bin units
    az_c = (W // 2 - col[win]) * laser.ang_res_x + np.pi / 2.0
    resid = np.arctan2(np.sin(az[win] - az_c), np.cos(az[win] - az_c))
    azr = np.zeros((H * W,), np.int8)
    azr[flat[win]] = np.clip(
        np.rint(resid / (laser.ang_res_x / 2.0) * 127.0), -127, 127
    ).astype(np.int8)
    # elevation residual vs the row-center beam, in half-row-spacing units
    e_scale = (
        laser.vlp32c_row_quant if laser.use_vlp32c else laser.ang_res_y
    ) / 2.0
    resid_e = elev[win] - row_elev[row[win]]
    elr = np.zeros((H * W,), np.int8)
    elr[flat[win]] = np.clip(
        np.rint(resid_e / e_scale * 127.0), -127, 127
    ).astype(np.int8)
    return rimg.reshape(H, W), azr.reshape(H, W), elr.reshape(H, W), row_elev


def grid_from_range_image(
    rimg, az_resid, elev_resid, row_elev, cfg: LegoLoamConfig
) -> ScanGrid:
    """Device: reconstruct a ScanGrid from the packed range image."""
    laser = cfg.laser
    H, W = rimg.shape
    q = cfg.pipeline.feed_quant or 0.004

    valid = rimg > 0
    rng = rimg.astype(jnp.float32) * q
    col = jnp.arange(W, dtype=jnp.float32)[None, :]
    az = (
        (W // 2 - col) * laser.ang_res_x
        + jnp.pi / 2.0
        + az_resid.astype(jnp.float32) * (laser.ang_res_x / 2.0 / 127.0)
    )
    e_scale = (
        laser.vlp32c_row_quant if laser.use_vlp32c else laser.ang_res_y
    ) / 2.0
    elev = row_elev[:, None] + elev_resid.astype(jnp.float32) * (
        e_scale / 127.0
    )
    hor = rng * jnp.cos(elev)
    xyz = jnp.stack(
        [hor * jnp.sin(az), hor * jnp.cos(az), rng * jnp.sin(elev)], axis=-1
    )
    rel = jnp.broadcast_to((col / float(W)), (H, W))
    return ScanGrid(
        xyz=jnp.where(valid[..., None], xyz, 0.0),
        range=jnp.where(valid, rng, jnp.inf),
        valid=valid,
        ground=jnp.full((H, W), -1, jnp.int8),
        label=jnp.full((H, W), -1, jnp.int32),
        rel_time=jnp.where(valid, rel, 0.0),
    )

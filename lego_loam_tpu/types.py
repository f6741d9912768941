"""Fixed-shape pytree containers flowing between pipeline stages.

These replace the reference's `ProjectionOut` / `AssociationOut` structs and
`CloudInfo` message (`utility.h:63-83`, `cloud_msgs/msg/CloudInfo.msg`): every
stage output is a pad-and-mask array bundle with static shapes so the whole
pipeline jits once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class _Base(struct.PyTreeNode):
    pass


class ScanGrid(_Base):
    """Stage-1 output: the 16x1800 range-image view of one scan.

    ≙ `_range_mat`/`_ground_mat`/`_label_mat` + `CloudInfo` per-point fields.
    """

    xyz: jax.Array  # (H, W, 3) point position, 0 where invalid
    range: jax.Array  # (H, W) range, +inf where invalid
    valid: jax.Array  # (H, W) bool
    ground: jax.Array  # (H, W) int8: -1 unknown/invalid, 0 non-ground, 1 ground
    label: jax.Array  # (H, W) int32 segment label, -1 invalid, 0 outlier, >0 segment id
    rel_time: jax.Array  # (H, W) in-scan relative time in [0, 1]


class SegmentedScan(_Base):
    """Per-row compacted segmented cloud (≙ segmented_cloud + CloudInfo rings).

    Points of each row are packed to the front, preserving column order; this
    reproduces the reference's ring-contiguous layout that feature picking and
    the adjacent-ring correspondence search rely on.
    """

    xyz: jax.Array  # (H, W, 3)
    range: jax.Array  # (H, W)
    col: jax.Array  # (H, W) int32 original column index
    ground: jax.Array  # (H, W) bool ground flag
    valid: jax.Array  # (H, W) bool
    count: jax.Array  # (H,) valid points per row
    rel_time: jax.Array  # (H, W)
    outlier_xyz: jax.Array  # (No, 3) downsampled outlier cloud
    outlier_mask: jax.Array  # (No,)
    outlier_rel: jax.Array  # (No,) sweep-relative capture time of outliers


class FeatureCloud(_Base):
    """A padded feature point set with per-point ring id and relative time."""

    xyz: jax.Array  # (N, 3)
    ring: jax.Array  # (N,) int32
    rel_time: jax.Array  # (N,)
    mask: jax.Array  # (N,) bool

    @property
    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


class ScanFeatures(_Base):
    """Stage-2 feature sets (≙ AssociationOut clouds)."""

    corner_sharp: FeatureCloud
    corner_less_sharp: FeatureCloud
    surf_flat: FeatureCloud
    surf_less_flat: FeatureCloud
    # Ground-only slice of the less-flat cloud, voxel-pooled SEPARATELY from
    # structure so no centroid mixes ground with wall points (a mixed
    # centroid near a building base sits off the ground plane and biases the
    # odometry surf stage's pitch — measured -0.03 deg/frame). This is the
    # odometry surf-stage target; mapping uses the full surf_less_flat.
    surf_ground: FeatureCloud


class OdometryState(_Base):
    """Frame-to-frame odometry accumulator (≙ transformCur/transformSum)."""

    R_prev_cur: jax.Array  # (3,3) last inter-frame motion (for seeding)
    t_prev_cur: jax.Array  # (3,)
    R_world: jax.Array  # (3,3) accumulated odometry pose
    t_world: jax.Array  # (3,)
    last_corner: FeatureCloud  # previous scan's less-sharp corners (scan-end frame)
    last_surf: FeatureCloud  # previous scan's less-flat surfs (scan-end frame)
    initialized: jax.Array  # () bool


class MapState(_Base):
    """Device-side submap buffers for scan-to-map refinement."""

    corner_xyz: jax.Array  # (Nc, 3)
    corner_mask: jax.Array  # (Nc,)
    surf_xyz: jax.Array  # (Ns, 3)
    surf_mask: jax.Array  # (Ns,)


def pad_cloud(xyz, n, ring=None, rel_time=None, dtype=jnp.float32) -> FeatureCloud:
    """Build a FeatureCloud from a possibly-short (m,3) array, padded to n."""
    xyz = jnp.asarray(xyz, dtype)
    m = xyz.shape[0]
    out = jnp.zeros((n, 3), dtype)
    out = out.at[: min(m, n)].set(xyz[:n])
    mask = jnp.arange(n) < m
    r = jnp.zeros((n,), jnp.int32)
    if ring is not None:
        r = r.at[: min(m, n)].set(jnp.asarray(ring[:n], jnp.int32))
    t = jnp.zeros((n,), dtype)
    if rel_time is not None:
        t = t.at[: min(m, n)].set(jnp.asarray(rel_time[:n], dtype))
    return FeatureCloud(xyz=out, ring=r, rel_time=t, mask=mask)

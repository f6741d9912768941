"""Device-side voxel-grid downsampling (replaces pcl::VoxelGrid).

The reference leans on PCL VoxelGrid filters at 0.2/0.4/1.0 m leaves
(`featureAssociation.h`, `mapOptimization.h` downSizeFilter members). Here a
fixed-shape sort-based reduction: quantize to a local grid packed into one
int32 key (10 bits/axis covers +-radius at the given leaf), sort, and average
points sharing a voxel with segment sums. Everything is O(N log N) vector ops
— no hash tables, no collisions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_keys(xyz, leaf: float, radius: float, origin=None):
    """Pack voxel coords into int32 keys; points outside +-radius of origin
    get the sentinel key (treated as invalid). 10 bits per axis."""
    if origin is not None:
        xyz = xyz - origin
    n_half = int(radius / leaf)
    assert n_half <= 512, "radius/leaf must fit 10 bits per axis"
    v = jnp.floor(xyz / leaf).astype(jnp.int32) + n_half
    ok = jnp.all((v >= 0) & (v < 1024), axis=-1)
    key = (v[..., 0] << 20) | (v[..., 1] << 10) | v[..., 2]
    return jnp.where(ok, key, jnp.int32(0x3FFFFFFF)), ok


def voxel_downsample_masked(xyz, mask, leaf: float, radius: float, origin=None):
    """(N,3), (N,) -> (N,3), (N,): voxel-centroid cloud, one point per
    occupied voxel, packed to the front of the output arrays."""
    N = xyz.shape[0]
    key, inb = voxel_keys(xyz, leaf, radius, origin)
    key = jnp.where(mask & inb, key, jnp.int32(0x7FFFFFFF))

    order = jnp.argsort(key)
    key_s = key[order]
    xyz_s = xyz[order]
    valid_s = key_s != jnp.int32(0x7FFFFFFF)

    first = jnp.concatenate(
        [jnp.array([True]), key_s[1:] != key_s[:-1]]
    ) & valid_s
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # compacted voxel index
    seg_id = jnp.where(valid_s, seg_id, N)

    sums = jax.ops.segment_sum(
        jnp.where(valid_s[:, None], xyz_s, 0.0), seg_id, num_segments=N + 1
    )
    cnts = jax.ops.segment_sum(
        valid_s.astype(jnp.float32), seg_id, num_segments=N + 1
    )
    centroids = sums[:N] / jnp.maximum(cnts[:N], 1.0)[:, None]

    n_vox = jnp.sum(first.astype(jnp.int32))
    out_mask = jnp.arange(N) < n_vox
    return jnp.where(out_mask[:, None], centroids, 0.0), out_mask


def voxel_downsample_concat(clouds, masks, leaf: float, radius: float, cap: int, origin=None):
    """Downsample the concatenation of several padded clouds into a buffer of
    size cap (used for submap assembly, ≙ mapOptmization.cpp:1199-1213)."""
    xyz = jnp.concatenate(clouds, axis=0)
    mask = jnp.concatenate(masks, axis=0)
    out, om = voxel_downsample_masked(xyz, mask, leaf, radius, origin)
    return out[:cap], om[:cap]

"""DBSCAN edge-feature refinement as dense connected components.

TPU-native rewrite of `FeatureAssociation::DBSCAN_EdgeFeature`
(`featureAssociation.cpp:1318-1387`): the reference's O(N^2) sequential
label-merge clustering over less-sharp corners with an anisotropic,
range-dependent epsilon. Its merge rule makes the result exactly the
connected components of the (symmetrized) epsilon-neighborhood graph, so here
the graph is built as one dense masked distance computation (MXU-friendly)
and components come from log-depth min-label propagation. Clusters with
>= dbscan_min_cluster members survive (`featureAssociation.cpp:1296-1305`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LegoLoamConfig
from ..types import FeatureCloud


def _aniso_scales(xyz, cfg: LegoLoamConfig):
    """kxy, kz per point (featureAssociation.cpp:1325-1334), lidar frame."""
    f = cfg.features
    rxy = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    elev = jnp.arctan2(xyz[:, 2], jnp.maximum(rxy, 1e-9))
    kxy = rxy * jnp.sin(cfg.laser.ang_res_x) * f.dbscan_ratio_xy
    kz = (
        (rxy * jnp.tan(elev + cfg.laser.ang_res_y) - rxy * jnp.tan(elev - cfg.laser.ang_res_y))
        / 2.0
        * f.dbscan_ratio_z
    )
    return jnp.maximum(kxy, 1e-6), jnp.maximum(jnp.abs(kz), 1e-6)


def dbscan_edge_filter(cloud: FeatureCloud, cfg: LegoLoamConfig) -> jax.Array:
    """Returns (N,) bool: point belongs to a cluster of >= min_cluster."""
    f = cfg.features
    xyz, mask = cloud.xyz, cloud.mask
    N = xyz.shape[0]

    kxy, kz = _aniso_scales(xyz, cfg)
    # normalized squared distance d_j(i, j): scales of the *neighbor* j
    dx = xyz[:, None, 0] - xyz[None, :, 0]
    dy = xyz[:, None, 1] - xyz[None, :, 1]
    dz = xyz[:, None, 2] - xyz[None, :, 2]
    d2 = (dx * dx + dy * dy) / (kxy[None, :] ** 2) + dz * dz / (kz[None, :] ** 2)
    adj = d2 <= f.dbscan_radius ** 2
    adj = adj | adj.T  # symmetrize the direction-dependent epsilon
    adj = adj & mask[:, None] & mask[None, :]

    big = jnp.int32(N)
    label = jnp.where(mask, jnp.arange(N, dtype=jnp.int32), big)

    def sweep(lab, _):
        nei = jnp.min(jnp.where(adj, lab[None, :], big), axis=1)
        m = jnp.minimum(lab, nei)
        ext = jnp.concatenate([m, jnp.array([big], jnp.int32)])
        m = ext[m]
        ext = jnp.concatenate([m, jnp.array([big], jnp.int32)])
        m = ext[m]
        return jnp.where(mask, m, big), None

    # N nodes, graph diameter shrinks ~4x/sweep with pointer jumping
    import math

    iters = max(4, int(math.ceil(math.log2(max(N, 2)))))
    label, _ = jax.lax.scan(sweep, label, None, length=iters)

    sizes = jax.ops.segment_sum(
        mask.astype(jnp.int32), label, num_segments=N + 1
    )
    return mask & (sizes[label] >= f.dbscan_min_cluster)

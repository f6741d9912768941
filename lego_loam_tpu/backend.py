"""Mapping back-end state machine: keyframe store + scan-to-map step.

≙ MapOptimization's run loop (`mapOptmization.cpp:1854-1930`) minus loop
closure (see `loopclosure.py` / `posegraph.py`). TPU-first design decisions:

- The keyframe store lives in device HBM as fixed-capacity ring arrays; the
  whole mapping step (submap selection, assembly, GN refinement, keyframe
  append) is ONE jitted program — no host round trip per scan.
- Keyframe selection = nearest surrounding_keyframe_search_num active
  keyframes within the search radius by top-k over distances (≙ the kd-tree
  radius search + downsample of extractSurroundingKeyFrames,
  mapOptmization.cpp:1096-1232).
- The keyframe gate reproduces saveKeyFramesAndFactor's 0.3 m rule including
  the fork's always-true override (mapOptmization.cpp:1624-1629).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .config import LegoLoamConfig
from .mapping import MapDiag, assemble_submap, map_prior, scan_to_map
from .math import se3
from .ops.voxel import voxel_downsample_masked
from .types import MapState, ScanFeatures


class BackendState(struct.PyTreeNode):
    kf_R: jax.Array  # (K, 3, 3)
    kf_t: jax.Array  # (K, 3)
    kf_time: jax.Array  # (K,)
    # Keyframe clouds are stored FLAT, point-major: row k = [x0,y0,z0,x1,...].
    # A (K, N, 3) buffer tiles its trailing dim 3 up to a full 128-lane TPU
    # tile whenever XLA materializes a copy (e.g. the lax.scan carry in the
    # chunked pipeline) — a 43x HBM blowup that OOMs the chip. The flat
    # (K, 3N) layout copies at its true size; use kf_corner_view()/
    # kf_surf_view() for the (K, N, 3) logical shape.
    kf_corner: jax.Array  # (K, 3*Nc) sensor-frame corner cloud per keyframe
    kf_corner_mask: jax.Array  # (K, Nc)
    kf_surf: jax.Array  # (K, 3*Ns) sensor-frame surf+outlier cloud
    kf_surf_mask: jax.Array  # (K, Ns)
    # Odometry-chain measurement from keyframe k-1 to k, recorded at append
    # time (feeds the pose-graph BetweenFactor chain, ≙ mapOptmization.cpp:
    # 1661-1673). Identity for k=0.
    kf_rel_R: jax.Array  # (K, 3, 3)
    kf_rel_t: jax.Array  # (K, 3)
    # Total keyframes ever appended (NOT clamped to capacity). The store is
    # a true ring: slot(i) = i % K, so once full the oldest keyframe is
    # retired per append and the pose graph slides over the last K
    # keyframes (the reference grows unboundedly, mapOptmization.cpp:
    # 1612-1755; a fixed window is the honest fixed-shape equivalent).
    n_kf: jax.Array  # () int32
    R_map: jax.Array  # (3,3) latest mapped pose
    t_map: jax.Array  # (3,)
    R_odom: jax.Array  # (3,3) odometry pose at latest mapping
    t_odom: jax.Array  # (3,)
    # Cached assembled submap (rebuilt per the submap_rebuild policy)
    submap: MapState
    submap_center: jax.Array  # (3,) position at last rebuild
    submap_n_kf: jax.Array  # () n_kf at last rebuild

    def kf_corner_view(self):
        K = self.kf_corner.shape[0]
        return self.kf_corner.reshape(K, -1, 3)

    def kf_surf_view(self):
        K = self.kf_surf.shape[0]
        return self.kf_surf.reshape(K, -1, 3)

    @property
    def capacity(self) -> int:
        return self.kf_t.shape[0]

    def n_active(self):
        """Keyframes currently resident (<= capacity)."""
        return jnp.minimum(self.n_kf, self.capacity)

    def ordered_slots(self):
        """Host helper: resident slots oldest -> newest (numpy int array)."""
        import numpy as np

        K = self.capacity
        n = int(self.n_kf)
        a = min(n, K)
        start = (n - a) % K if K else 0
        return (start + np.arange(a)) % K


# Per-keyframe cloud capacities (post-voxel-DS).
KF_CORNER_CAP = 1024
KF_SURF_CAP = 4096


def init_backend_state(cfg: LegoLoamConfig) -> BackendState:
    import numpy as np

    K = cfg.mapping.max_keyframes

    # Distinct device buffers per field: jnp constant folding can alias equal
    # small constants (two jnp.eye(3) fields -> one buffer), which breaks
    # buffer donation of the state pytree.
    def eye3():
        return jnp.asarray(np.eye(3, dtype=np.float32))

    def zeros(shape):
        return jnp.asarray(np.zeros(shape, np.float32))

    def dev_zeros(shape, dtype=jnp.float32):
        # Large zero arrays are created ON DEVICE (one jit call each, so
        # every call owns a distinct donation-safe buffer). A single big
        # host->device upload here (~1 GB at default capacity) permanently
        # degrades the relay transport: every later transfer — including the
        # per-chunk 6 MB scan feed — jumps from ~5 ms to ~130 ms (measured).
        return jax.jit(lambda: jnp.zeros(shape, dtype))()

    return BackendState(
        kf_R=jnp.tile(eye3()[None], (K, 1, 1)),
        kf_t=zeros((K, 3)),
        kf_time=zeros((K,)),
        kf_corner=dev_zeros((K, KF_CORNER_CAP * 3)),
        kf_corner_mask=dev_zeros((K, KF_CORNER_CAP), bool),
        kf_surf=dev_zeros((K, KF_SURF_CAP * 3)),
        kf_surf_mask=dev_zeros((K, KF_SURF_CAP), bool),
        kf_rel_R=jnp.tile(eye3()[None], (K, 1, 1)),
        kf_rel_t=zeros((K, 3)),
        n_kf=jnp.asarray(np.int32(0)),
        R_map=eye3(),
        t_map=zeros((3,)),
        R_odom=eye3(),
        t_odom=zeros((3,)),
        submap=MapState(
            corner_xyz=zeros((cfg.mapping.max_submap_corner, 3)),
            corner_mask=jnp.asarray(np.zeros((cfg.mapping.max_submap_corner,), bool)),
            surf_xyz=zeros((cfg.mapping.max_submap_surf, 3)),
            surf_mask=jnp.asarray(np.zeros((cfg.mapping.max_submap_surf,), bool)),
        ),
        submap_center=jnp.asarray(np.full((3,), 1e9, np.float32)),
        submap_n_kf=jnp.asarray(np.int32(-1)),
    )


def downsample_current_scan(features: ScanFeatures, outlier_xyz, outlier_mask, cfg):
    """≙ downsampleCurrentScan (mapOptmization.cpp:1234-1267): corners at
    corner_leaf, surf+outlier at surf_leaf."""
    m = cfg.mapping
    # radial_pack: output is truncated to max_corner_scan below — keep the
    # voxels nearest the sensor, not the lowest-x slab (see ops/voxel.py).
    c_xyz, c_m = voxel_downsample_masked(
        features.corner_less_sharp.xyz,
        features.corner_less_sharp.mask,
        m.corner_leaf,
        cfg.pipeline.local_voxel_radius,
        radial_pack=True,
    )
    s_all = jnp.concatenate([features.surf_less_flat.xyz, outlier_xyz], axis=0)
    s_mask = jnp.concatenate([features.surf_less_flat.mask, outlier_mask], axis=0)
    # The less-flat cloud is already voxel-filtered at 0.2 m in the front end;
    # the reference re-filters at 0.4 m only to shrink its kd-tree
    # (mapOptmization.cpp:1251-1256). Our search cost is fixed by padding, so
    # a validity partition to the cap replaces the second (expensive) sort;
    # the 0.4 m leaf still applies to the assembled submap.
    order = jnp.argsort(~s_mask)[: m.max_surf_scan]
    return (
        c_xyz[: m.max_corner_scan],
        c_m[: m.max_corner_scan],
        jnp.where(s_mask[order][:, None], s_all[order], 0.0),
        s_mask[order],
    )


def _select_keyframes(state: BackendState, center, cfg: LegoLoamConfig):
    """Submap keyframe selection (≙ extractSurroundingKeyFrames,
    mapOptmization.cpp:1096-1232): nearest active keyframes within the
    search radius.

    This radius search is the system's primary drift anchor: on a lap
    revisit the submap contains PREVIOUS-lap keyframes, so scan-to-map
    re-locks onto the old map instead of integrating on its own recent
    history. (An r3/r4 "temporal window" variant used only the most-recent
    keyframes under loop closure to avoid mixing drifted laps — measured
    on the campus course it turns the mapping chain into a positive-
    feedback integrator: map ATE crossed odometry ATE by frame ~570 and
    diverged. Inter-lap drift larger than the 1 m NN gate makes old-lap
    points unmatched, not harmful, and once the pose graph corrects them
    they re-anchor the solve — the reference's loop-closure branch rebuilds
    its submap from corrected poses the same way,
    mapOptmization.cpp:1123-1151.)"""
    m = cfg.mapping
    K = state.kf_t.shape[0]
    sel = min(m.surrounding_keyframe_search_num, K)
    # Feedback damper: anchor to keyframes at least `lag` appends old (see
    # MappingConfig.submap_recency_lag); disabled while the store is young.
    lag = jnp.where(
        state.n_kf > 2 * m.submap_recency_lag + 5, m.submap_recency_lag, 0
    )
    # Slot age = appends since the slot's last write; excludes the lag-newest
    # slots correctly even after ring wrap.
    age = (state.n_kf - 1 - jnp.arange(K)) % K
    active = (jnp.arange(K) < state.n_kf) & (age >= lag)
    d = jnp.linalg.norm(state.kf_t - center[None, :], axis=1)
    d = jnp.where(active & (d < m.surrounding_keyframe_search_radius), d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, sel)
    valid = jnp.isfinite(-neg)
    return idx, valid


def backend_step(
    state: BackendState,
    features: ScanFeatures,
    outlier_xyz,
    outlier_mask,
    R_odom, t_odom,  # current odometry pose (front-end frame)
    time,  # scan timestamp (scalar)
    cfg: LegoLoamConfig,
):
    """One mapping iteration. Returns (new_state, (R_map, t_map), MapDiag)."""
    c_xyz, c_m, s_xyz, s_m = downsample_current_scan(
        features, outlier_xyz, outlier_mask, cfg
    )
    return backend_step_ds(
        state, c_xyz, c_m, s_xyz, s_m, R_odom, t_odom, time, cfg
    )


def backend_step_ds(
    state: BackendState,
    c_xyz, c_m,  # downsampled current-scan corners (≙ downsampleCurrentScan)
    s_xyz, s_m,  # downsampled current-scan surf+outlier cloud
    R_odom, t_odom,  # current odometry pose (front-end frame)
    time,  # scan timestamp (scalar)
    cfg: LegoLoamConfig,
):
    """Mapping iteration on a pre-downsampled scan. The scan DS has no
    dependence on the mapping state, so the pipeline hoists it into the
    batched per-frame prepass."""
    m = cfg.mapping

    R_prior, t_prior = map_prior(
        state.R_map, state.t_map, state.R_odom, state.t_odom, R_odom, t_odom
    )

    # Rebuild the cached submap only when the vehicle moved far enough or
    # enough new keyframes landed (see MappingConfig.submap_rebuild_*).
    moved_far = (
        jnp.linalg.norm(t_prior - state.submap_center) > m.submap_rebuild_dist
    )
    stale = (state.n_kf - state.submap_n_kf) >= m.submap_rebuild_every
    need_rebuild = moved_far | stale | (state.n_kf < 5)

    def rebuild(_):
        idx, valid = _select_keyframes(state, t_prior, cfg)
        sm = assemble_submap(
            state.kf_corner[idx].reshape(-1, KF_CORNER_CAP, 3),
            state.kf_corner_mask[idx],
            state.kf_surf[idx].reshape(-1, KF_SURF_CAP, 3),
            state.kf_surf_mask[idx],
            state.kf_R[idx],
            state.kf_t[idx],
            valid,
            t_prior,
            cfg,
        )
        return sm, t_prior, state.n_kf

    def cached(_):
        return state.submap, state.submap_center, state.submap_n_kf

    submap, sm_center, sm_nkf = jax.lax.cond(need_rebuild, rebuild, cached, None)
    state = state.replace(
        submap=submap, submap_center=sm_center, submap_n_kf=sm_nkf
    )

    R_new, t_new, diag = scan_to_map(
        c_xyz, c_m, s_xyz, s_m, R_prior, t_prior, submap, cfg
    )
    # Keep the committed map rotation ON SO(3): the pose chain is thousands
    # of f32 3x3 products deep and non-orthogonality feeds back through the
    # prior composition (see se3.orthonormalize).
    R_new = se3.orthonormalize(R_new)

    # Keyframe gate (mapOptmization.cpp:1612-1630). Ring semantics: slot
    # n_kf % K, overwriting the oldest keyframe once the store is full.
    K = state.kf_t.shape[0]
    last_idx = jnp.where(state.n_kf > 0, (state.n_kf - 1) % K, 0)
    moved = jnp.linalg.norm(state.kf_t[last_idx] - t_new) > m.keyframe_gate_distance
    is_kf = (state.n_kf == 0) | moved | bool(m.keyframe_gate_always)
    slot = state.n_kf % K

    # Masked single-row writes instead of lax.cond(append, identity) over the
    # whole state: the identity branch makes XLA materialize a select over
    # every store buffer (a full O(K) HBM copy per frame — ~4 ms at the
    # default 1.37 GB capacity). Writing row `slot` back to itself when the
    # gate is closed touches one row per array instead.
    rel_R, rel_t = se3.relative(
        state.kf_R[last_idx], state.kf_t[last_idx], R_new, t_new
    )
    first = state.n_kf == 0
    rel_R = jnp.where(first, jnp.eye(3), rel_R)
    rel_t = jnp.where(first, jnp.zeros(3), rel_t)

    def row(new, cur):
        return jnp.where(is_kf, new, cur)

    state = state.replace(
        kf_rel_R=state.kf_rel_R.at[slot].set(row(rel_R, state.kf_rel_R[slot])),
        kf_rel_t=state.kf_rel_t.at[slot].set(row(rel_t, state.kf_rel_t[slot])),
        kf_R=state.kf_R.at[slot].set(row(R_new, state.kf_R[slot])),
        kf_t=state.kf_t.at[slot].set(row(t_new, state.kf_t[slot])),
        kf_time=state.kf_time.at[slot].set(row(time, state.kf_time[slot])),
        kf_corner=state.kf_corner.at[slot].set(
            row(c_xyz[:KF_CORNER_CAP].reshape(-1), state.kf_corner[slot])
        ),
        kf_corner_mask=state.kf_corner_mask.at[slot].set(
            row(c_m[:KF_CORNER_CAP], state.kf_corner_mask[slot])
        ),
        kf_surf=state.kf_surf.at[slot].set(
            row(s_xyz[:KF_SURF_CAP].reshape(-1), state.kf_surf[slot])
        ),
        kf_surf_mask=state.kf_surf_mask.at[slot].set(
            row(s_m[:KF_SURF_CAP], state.kf_surf_mask[slot])
        ),
        n_kf=state.n_kf + is_kf.astype(state.n_kf.dtype),
    )
    state = state.replace(
        R_map=R_new, t_map=t_new, R_odom=R_odom, t_odom=t_odom
    )
    return state, (R_new, t_new), diag

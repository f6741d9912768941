"""Host orchestrator: the whole SLAM system as one object over array inputs.

Replaces the reference's process layer (`main.cpp:9-43`: five ROS nodes, two
Channel<T>s, a MultiThreadedExecutor) with a pure array pipeline: the
front-end and back-end are single jitted device programs; the host thread
only feeds scans and pulls poses. JAX's async dispatch provides the same
overlap the reference gets from its per-stage std::threads — the front-end
of scan t+1 is enqueued while the back-end of scan t is still on device.

Latest-wins semantics of the FA->MO channel (`main.cpp:11`) map to
`mapping_frequency_divider`: mapping runs every Nth scan, odometry every
scan, and `fuse_pose` provides odometry-rate fused output (≙ TransformFusion,
/integrated_to_init).

PERFORMANCE CONTRACT: `process_scan` performs ZERO device->host reads in the
steady state — per-frame outputs are retained as device arrays (async
futures) and materialized in bulk via `jax.device_get` only when
`finalize()` / `run()` / `save_artifacts()` is called. (On a relay-attached
TPU a single blocking scalar read costs ~8 ms and `np.asarray` on device
arrays takes a pathological path; `jax.device_get` is the only fast exit.)
Loop closure, which needs host decisions, syncs only every
`loop_every_n_frames` frames when enabled.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .backend import BackendState, backend_step, init_backend_state
from .config import LegoLoamConfig
from .frontend import frontend_step, init_odometry_state
from .fusion import fuse_pose
from .loopclosure import attempt_loop_closure, compute_loopinfo
from .math import se3
from .posegraph import Factors, reduced_solve
from .types import OdometryState


@dataclass
class LoopFactor:
    i: int
    j: int
    R: np.ndarray
    t: np.ndarray
    fitness: float


class LegoLoamPipeline:
    """End-to-end odometry + mapping (+ optional loop closure)."""

    def __init__(self, cfg: LegoLoamConfig, seed: int = 0, profile: bool = False):
        self.cfg = cfg
        self.profile = profile
        self._key = jax.random.PRNGKey(seed)

        from .frontend import frontend_step_fused

        # IMU undistortion / wheel-odometry prior extend the per-scan jit
        # signature only when enabled — the plain path stays untouched.
        self._use_imu = cfg.pipeline.use_imu_undistortion
        self._use_odom = cfg.odometry.odom_prior_mode != "off"
        self._last_odom = None  # (R, t) of the latest wheel-odom pose

        def _fused(pts, mask, state, idx, Rm, tm, Ro, to, imu=None, odom=None):
            return frontend_step_fused(
                pts, mask, state, idx, Rm, tm, Ro, to, cfg,
                imu=imu, odom=odom,
            )

        self._frontend = jax.jit(_fused)
        # NOTE: donating the state pytree trips an XLA buffer-count mismatch
        # when a sharded program ran earlier in the process (jax 0.9); the
        # un-donated copy of the keyframe store costs ~3 ms/frame at full
        # capacity — revisit when that interaction is fixed.
        self._backend = jax.jit(
            lambda state, feats, oxyz, omask, R, t, tm: backend_step(
                state, feats, oxyz, omask, R, t, tm, cfg
            )
        )
        # Loop-closure device programs (all dispatched asynchronously; the
        # host reads their outputs one check later, when they have long
        # finished — see _try_loop_closure).
        self._attempt = jax.jit(
            lambda bs, cand, cur, nkf: attempt_loop_closure(
                bs.kf_R, bs.kf_t,
                bs.kf_corner_view(), bs.kf_corner_mask,
                bs.kf_surf_view(), bs.kf_surf_mask,
                cand, cur, nkf, cfg,
            )
        )
        self._loopinfo_probe = jax.jit(
            lambda bs: compute_loopinfo(
                bs.kf_t, bs.kf_time, bs.n_kf, bs.t_map, cfg
            )
        )

        from functools import partial as _partial

        @_partial(jax.jit, donate_argnums=(0, 1))
        def _solve(kf_R, kf_t, rel_R, rel_t, n_kf, R_map, t_map, sc, sn, loop):
            newR, newt, (ok, c0, c1, moved) = reduced_solve(
                kf_R, kf_t, rel_R, rel_t, n_kf, loop, cfg
            )
            K = newR.shape[0]
            newest = jnp.where(n_kf > 0, (n_kf - 1) % K, 0)
            R_map2 = jnp.where(ok, newR[newest], R_map)
            t_map2 = jnp.where(ok, newt[newest], t_map)
            # corrected keyframe poses invalidate the cached submap
            sc2 = jnp.where(ok, jnp.full((3,), 1e9, sc.dtype), sc)
            sn2 = jnp.where(ok, jnp.int32(-1), sn)
            diag = jnp.stack([ok.astype(jnp.float32), c0, c1, moved])
            return newR, newt, R_map2, t_map2, sc2, sn2, diag

        self._solve_reduced = _solve

        @_partial(jax.jit, donate_argnums=(0,))
        def _append(buf: Factors, k, i, j, R, t, info, valid):
            return Factors(
                i=buf.i.at[k].set(i),
                j=buf.j.at[k].set(j),
                R=buf.R.at[k].set(R),
                t=buf.t.at[k].set(t),
                info=buf.info.at[k].set(info),
                mask=buf.mask.at[k].set(valid),
            )

        self._append_loop = _append
        self._mesh = None
        if len(jax.devices()) > 1 and (
            cfg.distributed.use_sharded_posegraph or cfg.distributed.shard_backend
        ):
            from .distributed import make_mesh

            self._mesh = make_mesh()
        if self._mesh is not None and cfg.distributed.use_sharded_posegraph:
            from .distributed import sharded_pose_graph_solver

            self._solve_graph_sharded = sharded_pose_graph_solver(self._mesh, cfg)
        else:
            self._solve_graph_sharded = None
        # Chunked device-resident runner (built lazily; one cache entry per
        # chunk length). On a relay-attached TPU each per-frame dispatch
        # costs more than the device programs themselves — lax.scan over a
        # chunk of scans runs C frames per host round trip.
        self._chunk_runner = None
        # Hoisted identity odom_prev: building jnp.eye/zeros per chunk
        # dispatches two eager device ops whose relay round-trips cost more
        # than the whole chunk program (measured ~10 ms/frame).
        self._identity_prev = (
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.zeros(3, np.float32)),
        )
        # Device-resident frame counter for the chunk runner (donated through
        # each call — zero steady-state scalar uploads). None = out of sync
        # with self.frame_idx; re-uploaded at the next process_chunk.
        self._idx_dev = None
        # Single-worker stager thread: jnp.asarray BLOCKS the calling thread
        # for the full host->device transfer on the relay link, so staging
        # chunk c+1 from the main thread serializes with chunk c's compute.
        # A background thread makes the overlap real (GIL released during
        # the transfer).
        self._stager = None

        self.fstate: OdometryState = init_odometry_state(cfg)
        self.bstate: BackendState = init_backend_state(cfg)
        if self._mesh is not None and cfg.distributed.shard_backend:
            # Keyframe store + submap sharded over the mesh: every jitted
            # program touching the state is GSPMD-partitioned from the input
            # shardings (the north star's "keyframes/map blocks sharded",
            # replacing nothing in the single-machine reference).
            from .distributed import shard_backend_state

            self.bstate = shard_backend_state(self._mesh, self.bstate)
        self.loop_factors: list[LoopFactor] = []
        # Device-resident loop-factor buffer (fixed max_loop_factors
        # capacity, ABSOLUTE keyframe ids) — the reduced solver's input;
        # self.loop_factors is the host mirror for artifacts/checkpoints.
        self._loop_buf = self._empty_loop_buf()
        self._loop_write = 0
        # Asynchronous loop-closure pipeline state (see _try_loop_closure):
        # candidate infos produced by past chunk programs, the in-flight
        # attempt program's outputs, and the in-flight solve's diagnostic.
        self._linfo_q: list = []
        self._attempt_pending = None
        self._solve_pending = None
        self._check_seq = 0
        self._solved_at = 0  # len(loop_factors) at the last graph solve
        # Per-check diagnostics trail (nearest-candidate distance etc.), so
        # "0 closures" in a run artifact is explainable.
        self.loop_diag: list[dict] = []
        self._loop_cooldown_until = 0
        self.frame_idx = 0
        # Device-array logs (materialized lazily in finalize()).
        self._dev_log = {
            "odom_t": [],
            "map_R": [],
            "map_t": [],
            "fused_t": [],
            "diag": [],
            "map_time": [],
        }
        self.diagnostics = {"mapping_ms": [], "iterations": [], "records": []}
        # Amortized per-frame timing for the chunked path (fills mapt.txt,
        # ≙ mapOptmization.cpp:413-434): wall time between successive chunk
        # dispatches (the donated state serializes them against device
        # completion) divided by the chunk's mapped frames. The first
        # inter-chunk gap includes compile and is dropped.
        self._chunk_t_prev = None
        self._chunk_mapped_prev = 0
        self._chunks_timed = 0
        self.trajectory = {"positions": [], "rpys": [], "times": []}
        self._finalized = False
        self._last_loop_check = -(10 ** 9)
        # ≙ /initialpose run-control flag (mapOptmization.cpp:437-456):
        # request_stop() ends run()/run_chunked() at the next frame/chunk
        # boundary so a re-localization session can take over (relocalize.py).
        self._stop_requested = False
        # Global-map cadence (≙ publishGlobalMap every-5th-frame thread).
        self.latest_global_map = None
        self.global_map_count = 0
        self._mapped_frames = 0
        self._next_global_map = cfg.mapping.global_map_every_n_frames

    # -- input prep ---------------------------------------------------------

    def _prep(self, points: np.ndarray):
        """points: (N,3) raw cloud, NaN rows = misses."""
        n = self.cfg.laser.max_points
        mask = np.isfinite(points).all(axis=1)
        buf = np.zeros((n, 3), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(points), n)
        buf[:k] = np.nan_to_num(points[:k])
        m[:k] = mask[:k]
        return jnp.asarray(buf), jnp.asarray(m)

    # -- main entry ---------------------------------------------------------

    def _pack_imu(self, imu_samples):
        """(S_raw, 7) rows [t_rel, roll, pitch, yaw, ax, ay, az] -> fixed
        (S, ...) window dict (pad-and-mask)."""
        S = self.cfg.pipeline.imu_window
        buf = np.zeros((S, 7), np.float32)
        m = np.zeros((S,), bool)
        if imu_samples is not None and len(imu_samples):
            k = min(len(imu_samples), S)
            buf[:k] = np.asarray(imu_samples, np.float32)[:k]
            m[:k] = True
        return {
            "t": jnp.asarray(buf[:, 0]),
            "rpy": jnp.asarray(buf[:, 1:4]),
            "acc": jnp.asarray(buf[:, 4:7]),
            "mask": jnp.asarray(m),
        }

    def _pack_odom(self, odom_pose):
        """Current wheel-odom pose -> {R_prev, t_prev, R_cur, t_cur} dict,
        carrying the previous pose host-side (identity motion on frame 0 or
        when the stream has a gap)."""
        if odom_pose is None:
            cur = self._last_odom
        else:
            cur = (
                np.asarray(odom_pose[0], np.float32),
                np.asarray(odom_pose[1], np.float32),
            )
        if cur is None:
            cur = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        prev = self._last_odom if self._last_odom is not None else cur
        self._last_odom = cur
        return {
            "R_prev": jnp.asarray(prev[0]), "t_prev": jnp.asarray(prev[1]),
            "R_cur": jnp.asarray(cur[0]), "t_cur": jnp.asarray(cur[1]),
        }

    def process_scan(
        self, points: np.ndarray, timestamp: Optional[float] = None,
        imu_samples=None, odom_pose=None,
    ):
        """Process one scan.

        imu_samples: optional (S, 7) [t_rel_to_scan_start, roll, pitch, yaw,
        ax, ay, az] raw IMU rows over this scan's period (used when
        cfg.pipeline.use_imu_undistortion). odom_pose: optional (R, t) wheel
        odometry pose at this scan (used when odom_prior_mode != 'off')."""
        cfg = self.cfg
        t_scan = (
            timestamp
            if timestamp is not None
            else self.frame_idx * cfg.laser.scan_period
        )
        self._finalized = False

        pts, mask = self._prep(points)
        kw = {}
        if self._use_imu:
            kw["imu"] = self._pack_imu(imu_samples)
        if self._use_odom:
            kw["odom"] = self._pack_odom(odom_pose)
        # Fusion uses the latest *available* map pose — one frame stale, the
        # same asynchronous semantics as the reference's TransformFusion node.
        self.fstate, out = self._frontend(
            pts, mask, self.fstate, jnp.int32(self.frame_idx),
            self.bstate.R_map, self.bstate.t_map,
            self.bstate.R_odom, self.bstate.t_odom, **kw,
        )
        self._dev_log["odom_t"].append(out["t_world"])

        run_mapping = (
            self.frame_idx % cfg.mapping.mapping_frequency_divider
        ) == 0
        if run_mapping:
            if self.profile:
                jax.block_until_ready(out["t_world"])
                t0 = _time.perf_counter()
            # Mapping consumes the DE-SKEWED (scan-end) clouds, like the
            # reference's TransformToEnd hand-off (featureAssociation.cpp:
            # 2660-2740); see frontend_solve's map_* outputs.
            map_feats = out["features"].replace(
                corner_less_sharp=out["map_corner"],
                surf_less_flat=out["map_surf"],
            )
            self.bstate, (R_map, t_map), diag = self._backend(
                self.bstate,
                map_feats,
                out["map_outlier_xyz"],
                out["segmented"].outlier_mask,
                out["R_world"],
                out["t_world"],
                jnp.float32(t_scan),
            )
            if self.profile:
                jax.block_until_ready(t_map)
                self.diagnostics["mapping_ms"].append(
                    (_time.perf_counter() - t0) * 1e3
                )
            self._dev_log["map_R"].append(R_map)
            self._dev_log["map_t"].append(t_map)
            self._dev_log["diag"].append(diag)
            self._dev_log["map_time"].append(t_scan)

            if (
                cfg.mapping.enable_loop_closure
                and self.frame_idx - self._last_loop_check
                >= cfg.mapping.loop_every_n_frames
            ):
                self._last_loop_check = self.frame_idx
                self._linfo_q.append(self._loopinfo_probe(self.bstate))
                self._try_loop_closure()
            self._mapped_frames += 1
            self._maybe_publish_global_map()

        self._dev_log["fused_t"].append(out["t_fused"])

        self.frame_idx += 1
        self._idx_dev = None  # chunk runner's device counter now stale
        return {
            "R_odom": out["R_world"],
            "t_odom": out["t_world"],
            "R_map": self.bstate.R_map,
            "t_map": self.bstate.t_map,
            "R_fused": out["R_fused"],
            "t_fused": out["t_fused"],
        }

    # -- chunked device-resident driver --------------------------------------

    def _build_chunk_runner(self):
        """jit(lax.scan) over a chunk of scans: C frames per host dispatch.

        On a relay-attached TPU the per-frame host dispatch + scalar uploads
        cost far more than the device programs themselves; scanning a chunk
        on device removes all of it. (A vmapped batched prepass across the
        chunk was tried and measured SLOWER per frame than the per-frame
        path — 16.3 vs 12.3 ms/frame on the v5e — batched sorts/scatters
        lower worse than their per-frame forms, so everything stays inside
        the scan.) The keyframe store rides the scan carry — kept
        copy-friendly by the flat cloud layout (see BackendState) — and
        buffer donation keeps it in place between chunks."""
        from functools import partial

        from .backend import backend_step_ds, downsample_current_scan
        from .frontend import frontend_prepass, frontend_solve
        from .fusion import fuse_pose
        from .mapping import MapDiag

        cfg = self.cfg
        div = cfg.mapping.mapping_frequency_divider

        use_imu = self._use_imu
        use_odom = self._use_odom

        def step(carry, inp):
            fstate, bstate, idx, odom_prev = carry
            grid_in = None
            pts = mask = None
            if "rimg" in inp:
                from .ops.projection import grid_from_range_image

                grid_in = grid_from_range_image(
                    inp["rimg"], inp["azr"], inp["elr"], inp["rowe"], cfg
                )
            else:
                pts, mask = inp["pts"], inp["mask"]
                if jnp.issubdtype(pts.dtype, jnp.integer):
                    pts = pts.astype(jnp.float32) * cfg.pipeline.feed_quant
            # Timestamps ride the feed when the source has real ones
            # (rosbag/KITTI); otherwise derived on device from the frame
            # counter — zero per-chunk scalar uploads.
            t_scan = inp.get(
                "ts", idx.astype(jnp.float32) * cfg.laser.scan_period
            )
            key = jax.random.fold_in(jax.random.PRNGKey(0), idx)

            imu_track = None
            if use_imu:
                from .imu import integrate_imu

                im = inp["imu"]
                imu_track = integrate_imu(
                    im["t"], im["rpy"], im["acc"], mask=im["mask"]
                )
            odom_prior = None
            if use_odom:
                from .imu import odom_prior_motion

                odom_prior = odom_prior_motion(
                    fstate.R_world, fstate.t_world,
                    odom_prev[0], odom_prev[1],
                    inp["odom_R"], inp["odom_t"],
                    cfg.odometry.odom_lever_arm,
                )
                odom_prev = (inp["odom_R"], inp["odom_t"])

            _grid, seg, feats = frontend_prepass(
                pts, mask, cfg, key, imu_track=imu_track, grid=grid_in
            )
            imu_att = None
            if imu_track is not None:
                last = jnp.maximum(jnp.sum(imu_track.mask) - 1, 0)
                imu_att = (imu_track.R[last], jnp.any(imu_track.mask))
            fstate, out = frontend_solve(
                feats, fstate, cfg, odom_prior, imu_att
            )
            # Mapping consumes DE-SKEWED (scan-end) clouds — see
            # frontend_solve's map_* outputs.
            from .frontend import deskew_outliers

            map_feats = feats.replace(
                corner_less_sharp=out["map_corner"],
                surf_less_flat=out["map_surf"],
            )
            o_xyz = deskew_outliers(seg, out["M_R_avg"], out["M_t_avg"], cfg)
            ds = downsample_current_scan(
                map_feats, o_xyz, seg.outlier_mask, cfg
            )

            # TransformFusion output at odometry rate, using the latest
            # *available* map pose — one frame stale, the same asynchronous
            # semantics as the reference node.
            Rf, tf = fuse_pose(
                bstate.R_map, bstate.t_map, bstate.R_odom, bstate.t_odom,
                out["R_world"], out["t_world"],
            )

            def do_map(bs):
                bs, _pose, diag = backend_step_ds(
                    bs, *ds, out["R_world"], out["t_world"], t_scan, cfg
                )
                return bs, diag

            if div == 1:
                bstate, diag = do_map(bstate)
            else:
                def skip(bs):
                    z = jnp.float32(0)
                    zi = jnp.int32(0)
                    return bs, MapDiag(
                        zi, z, z, jnp.bool_(False),
                        zi, zi, jnp.bool_(False), zi, zi, zi,
                    )

                bstate, diag = jax.lax.cond(
                    (idx % div) == 0, do_map, skip, bstate
                )

            from .mapping import map_prior as _map_prior

            _, t_prior_dbg = _map_prior(
                carry[1].R_map, carry[1].t_map, carry[1].R_odom,
                carry[1].t_odom, out["R_world"], out["t_world"],
            )
            ys = {
                "t_world": out["t_world"],
                "t_fused": tf,
                "R_map": bstate.R_map,
                "t_map": bstate.t_map,
                "t_prior": t_prior_dbg,
                "diag": diag,
            }
            return (fstate, bstate, idx + 1, odom_prev), ys

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def run(fstate, bstate, idx0, xs, odom_prev):
            (fstate, bstate, idx, odom_prev), ys = jax.lax.scan(
                step, (fstate, bstate, idx0, odom_prev), xs
            )
            # Loop-candidate detection rides the chunk program (≙ the
            # reference's async detectLoopClosure thread): one O(K) masked
            # argmin — the host reads the packed 4 floats one check later,
            # so the steady state costs zero dispatch-queue drains.
            if cfg.mapping.enable_loop_closure:
                from .loopclosure import compute_loopinfo

                linfo = compute_loopinfo(
                    bstate.kf_t, bstate.kf_time, bstate.n_kf, bstate.t_map,
                    cfg,
                )
            else:
                linfo = jnp.zeros((4,), jnp.float32)
            return fstate, bstate, idx, odom_prev, ys, linfo

        return run

    def _prep_many(self, scans):
        """Pack raw clouds into the chunk feed dict (see stage_chunk).

        feed_mode "range": each scan becomes a (H, W) uint16 range image +
        int8 azimuth residuals + per-row beam elevations — 3x fewer bytes
        than int16 xyz and the device-side projection scatter disappears.
        feed_mode "points": fixed-shape (C, max_points, 3) int16 (or f32
        when feed_quant == 0) + mask; the chunk runner projects on device.
        feed_quant == 0 forces the points feed (the range image is
        inherently range-quantized, so "range" cannot honor a lossless
        request)."""
        C = len(scans)
        if self.cfg.pipeline.feed_mode == "range" and self.cfg.pipeline.feed_quant > 0:
            from .ops.projection import host_pack_range_image

            H = self.cfg.laser.num_vertical_scans
            W = self.cfg.laser.num_horizontal_scans
            rimg = np.zeros((C, H, W), np.uint16)
            azr = np.zeros((C, H, W), np.int8)
            elr = np.zeros((C, H, W), np.int8)
            rowe = np.zeros((C, H), np.float32)
            for c, points in enumerate(scans):
                rimg[c], azr[c], elr[c], rowe[c] = host_pack_range_image(
                    points, self.cfg
                )
            return {"rimg": rimg, "azr": azr, "elr": elr, "rowe": rowe}
        n = self.cfg.laser.max_points
        buf = np.zeros((C, n, 3), np.float32)
        m = np.zeros((C, n), bool)
        for c, points in enumerate(scans):
            k = min(len(points), n)
            finite = np.isfinite(points[:k]).all(axis=1)
            buf[c, :k] = np.nan_to_num(points[:k])
            m[c, :k] = finite
        q = self.cfg.pipeline.feed_quant
        if q > 0:
            buf = np.clip(np.rint(buf * (1.0 / q)), -32767, 32767).astype(
                np.int16
            )
        return {"pts": buf, "mask": m}

    def stage_chunk(self, pts, masks=None, timestamps=None, imu=None, odom=None):
        """Move one chunk's inputs to the device WITHOUT processing them.

        pts: a prep dict from _prep_many ({"rimg","azr","rowe"} or
        {"pts","mask"}) or a raw (C, N, 3) array with masks. Returns the
        staged xs dict for process_chunk. Call this for chunk c+1 right
        after dispatching chunk c: the transfer then overlaps the device
        execution (double buffering) instead of serializing with it."""
        cfg = self.cfg
        if isinstance(pts, dict):
            C = int(next(iter(pts.values())).shape[0])
            xs = {k: jnp.asarray(v) for k, v in pts.items()}
        else:
            C = int(pts.shape[0])
            xs = {"pts": jnp.asarray(pts), "mask": jnp.asarray(masks)}
        if timestamps is not None:
            xs["ts"] = jnp.asarray(timestamps, jnp.float32)
        if self._use_imu:
            S = cfg.pipeline.imu_window
            if imu is None:
                imu = {
                    "t": np.zeros((C, S), np.float32),
                    "rpy": np.zeros((C, S, 3), np.float32),
                    "acc": np.zeros((C, S, 3), np.float32),
                    "mask": np.zeros((C, S), bool),
                }
            xs["imu"] = jax.tree.map(jnp.asarray, dict(imu))
        if self._use_odom:
            if odom is None:
                R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
                t = np.zeros((C, 3), np.float32)
            else:
                R, t = np.asarray(odom[0], np.float32), np.asarray(odom[1], np.float32)
            xs["odom_R"] = jnp.asarray(R)
            xs["odom_t"] = jnp.asarray(t)
        return xs

    def stage_chunk_async(self, pts, masks=None, timestamps=None, imu=None, odom=None):
        """stage_chunk from a background thread; returns a Future of the
        staged xs dict. Call for chunk c+1 right after dispatching chunk c —
        unlike a main-thread stage_chunk call (which blocks until the
        transfer completes), this genuinely overlaps the transfer with the
        device execution."""
        if self._stager is None:
            from concurrent.futures import ThreadPoolExecutor

            self._stager = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="lego-stage"
            )
        return self._stager.submit(
            self.stage_chunk, pts, masks, timestamps, imu, odom
        )

    def process_chunk(self, pts, masks=None, timestamps=None, imu=None, odom=None):
        """Process C scans in one device dispatch.

        pts: (C, max_points, 3) float32, masks: (C, max_points) bool —
        host or device arrays, OR pts = a staged xs dict from stage_chunk()
        (then masks is ignored). imu: optional per-frame sample windows
        {"t": (C,S), "rpy": (C,S,3), "acc": (C,S,3), "mask": (C,S)}; odom:
        optional ((C,3,3), (C,3)) wheel-odom poses. Loop closure (host
        decision) is checked once per chunk, not per frame; pass smaller
        chunks if tighter loop-closure latency is needed.

        Steady state performs ZERO eager host->device uploads: the frame
        counter lives on device (donated through the runner), timestamps are
        derived on device unless real ones are provided, and the odom_prev
        pose is either device-carried or the hoisted identity."""
        cfg = self.cfg
        if self._chunk_runner is None:
            self._chunk_runner = self._build_chunk_runner()
        if isinstance(pts, dict) and isinstance(
            next(iter(pts.values())), jax.Array
        ):
            xs = pts  # already staged (stage_chunk / stage_chunk_async)
        else:
            xs = self.stage_chunk(pts, masks, timestamps, imu, odom)
        C = int(xs["rimg" if "rimg" in xs else "pts"].shape[0])
        self._finalized = False
        f0 = self.frame_idx
        if self._use_odom:
            R = np.asarray(xs["odom_R"])
            t = np.asarray(xs["odom_t"])
            prev = self._last_odom
            if prev is None:
                prev = (R[0], t[0])
            odom_prev = (jnp.asarray(prev[0]), jnp.asarray(prev[1]))
            self._last_odom = (R[-1], t[-1])
        else:
            odom_prev = self._identity_prev
        if self._idx_dev is None:
            self._idx_dev = jnp.int32(f0)
        timestamps = xs.get("ts")
        if timestamps is None:
            timestamps = (np.arange(f0, f0 + C) * cfg.laser.scan_period).astype(
                np.float32
            )
        now = _time.perf_counter()
        if self._chunk_t_prev is not None and self._chunk_mapped_prev:
            self._chunks_timed += 1
            if self._chunks_timed > 1:  # first gap carries compile time
                per = (now - self._chunk_t_prev) * 1e3 / self._chunk_mapped_prev
                self.diagnostics["mapping_ms"].extend(
                    [per] * self._chunk_mapped_prev
                )
        self._chunk_t_prev = now
        self.fstate, self.bstate, self._idx_dev, _odom_prev, ys, linfo = (
            self._chunk_runner(
                self.fstate, self.bstate, self._idx_dev, xs, odom_prev
            )
        )
        self._dev_log["odom_t"].append(ys["t_world"])
        self._dev_log["fused_t"].append(ys["t_fused"])
        self._dev_log.setdefault("prior_t", []).append(ys["t_prior"])
        div = cfg.mapping.mapping_frequency_divider
        frames = np.arange(f0, f0 + C)
        mapped = (frames % div) == 0
        if div == 1:
            mR, mt, diag = ys["R_map"], ys["t_map"], ys["diag"]
        else:
            sel = jnp.asarray(np.nonzero(mapped)[0])
            mR = ys["R_map"][sel]
            mt = ys["t_map"][sel]
            diag = jax.tree.map(lambda x: x[sel], ys["diag"])
        self._dev_log["map_R"].append(mR)
        self._dev_log["map_t"].append(mt)
        self._dev_log["diag"].append(diag)
        # timestamps may live on device (staged chunk): defer the read to
        # finalize() — no blocking device_get in the steady state.
        if isinstance(timestamps, np.ndarray):
            self._dev_log["map_time"].extend(
                float(t) for t in timestamps[mapped]
            )
        else:
            self._dev_log["map_time"].append(timestamps[jnp.asarray(mapped)])
        self.frame_idx += C

        if cfg.mapping.enable_loop_closure and (
            self.frame_idx - self._last_loop_check
            >= cfg.mapping.loop_every_n_frames
        ):
            self._last_loop_check = self.frame_idx
            self._linfo_q.append(linfo)
            self._try_loop_closure()
        self._chunk_mapped_prev = int(np.count_nonzero(mapped))
        self._mapped_frames += self._chunk_mapped_prev
        self._maybe_publish_global_map()

    def _empty_loop_buf(self) -> Factors:
        L = self.cfg.mapping.max_loop_factors
        import numpy as _np

        return Factors(
            i=jnp.asarray(_np.zeros((L,), _np.int32)),
            j=jnp.asarray(_np.zeros((L,), _np.int32)),
            R=jnp.asarray(
                _np.tile(_np.eye(3, dtype=_np.float32), (L, 1, 1))
            ),
            t=jnp.asarray(_np.zeros((L, 3), _np.float32)),
            info=jnp.asarray(_np.ones((L, 6), _np.float32)),
            mask=jnp.asarray(_np.zeros((L,), bool)),
        )

    def _sync_loop_buf(self):
        """Rebuild the device loop-factor buffer from the host mirror
        (checkpoint load, manual _optimize_graph calls)."""
        import numpy as _np

        m = self.cfg.mapping
        live = self.loop_factors[-m.max_loop_factors:]
        buf = self._empty_loop_buf()
        if not live:
            self._loop_buf = buf
            self._loop_write = 0
            return
        L = m.max_loop_factors
        i = _np.zeros((L,), _np.int32)
        j = _np.zeros((L,), _np.int32)
        R = _np.tile(_np.eye(3, dtype=_np.float32), (L, 1, 1))
        t = _np.zeros((L, 3), _np.float32)
        info = _np.ones((L, 6), _np.float32)
        mask = _np.zeros((L,), bool)
        for k, f in enumerate(live):
            i[k], j[k] = f.i, f.j
            R[k], t[k] = f.R, f.t
            info[k] = 1.0 / max(f.fitness * m.loop_noise_scale, m.loop_var_floor)
            mask[k] = True
        self._loop_buf = Factors(
            i=jnp.asarray(i), j=jnp.asarray(j), R=jnp.asarray(R),
            t=jnp.asarray(t), info=jnp.asarray(info), mask=jnp.asarray(mask),
        )
        self._loop_write = len(live)

    def warmup_loop_closure(self):
        """Compile the loop-closure machinery at production shapes.

        First-touch compiles of the candidate probe, the fused
        coarse+ICP attempt program, and the reduced pose-graph solve cost
        minutes on the relay-attached TPU and must not land mid-run on the
        first candidate chunk. Call once before the timed region; no-op when
        loop closure is disabled."""
        cfg = self.cfg
        if not cfg.mapping.enable_loop_closure:
            return
        jax.block_until_ready(self._loopinfo_probe(self.bstate))
        out = self._attempt(
            self.bstate, jnp.int32(0), jnp.int32(0), jnp.int32(1)
        )
        jax.block_until_ready(out)
        # Append a masked-out row (valid=False): compiles the donating
        # append without perturbing the (empty) factor set.
        self._loop_buf = self._append_loop(
            self._loop_buf, jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.eye(3), jnp.zeros(3), jnp.ones(6), jnp.bool_(False),
        )
        if self._solve_graph_sharded is not None:
            self._optimize_graph()  # compiles the sharded path end-to-end
        else:
            # The reduced solve donates kf_R/kf_t and returns equivalent
            # buffers (empty factor set -> cost gate rejects, poses kept),
            # so warming it is a real dispatch whose outputs replace the
            # state.
            self._dispatch_solve(None)
            self._pickup_solve()
        jax.block_until_ready(self.bstate.kf_R)

    def request_stop(self):
        """≙ the /initialpose callback (mapOptmization.cpp:437-456): flags the
        run loop to end so a re-localization session can start."""
        self._stop_requested = True

    def _maybe_publish_global_map(self):
        """≙ publishGlobalMap every global_map_every_n_frames mapped frames
        (mapOptmization.cpp:775-892, signal :1919-1921). Host-side gather;
        only when cfg.pipeline.publish_global_map."""
        cfg = self.cfg
        if not cfg.pipeline.publish_global_map:
            return
        if self._mapped_frames < self._next_global_map:
            return
        self._next_global_map = (
            self._mapped_frames + cfg.mapping.global_map_every_n_frames
        )
        from .mapproducts import global_map

        center = jax.device_get(self.bstate.t_map)
        self.latest_global_map = global_map(
            self.bstate, center,
            cfg.mapping.global_map_visualization_search_radius, cfg,
        )
        self.global_map_count += 1

    def run_chunked(self, scans, chunk: int = 16, timestamps=None):
        """Batch driver over chunks; ragged tail falls back to process_scan.
        Honors request_stop() at chunk boundaries (≙ /initialpose ending the
        reference's run loop)."""
        T = len(scans)
        s = 0

        def prep_and_stage(s0):
            prep = self._prep_many(scans[s0 : s0 + chunk])
            ts = None if timestamps is None else np.asarray(
                timestamps[s0 : s0 + chunk], np.float32
            )
            return self.stage_chunk(prep, None, ts)

        if self._stager is None and T >= chunk:
            from concurrent.futures import ThreadPoolExecutor

            self._stager = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="lego-stage"
            )
        # Pack + upload chunk c+1 in the stager thread while the device runs
        # chunk c (jnp.asarray blocks its calling thread for the transfer).
        fut = self._stager.submit(prep_and_stage, 0) if T >= chunk else None
        while s + chunk <= T and not self._stop_requested:
            xs = fut.result()
            if s + 2 * chunk <= T:
                fut = self._stager.submit(prep_and_stage, s + chunk)
            self.process_chunk(xs)
            s += chunk
        for k in range(s, T):
            if self._stop_requested:
                break
            self.process_scan(scans[k], None if timestamps is None else timestamps[k])
        self.finalize()
        return {
            "map_positions": np.asarray(self.trajectory["positions"]),
            "odom_positions": self.odom_positions,
            "fused_positions": self.fused_positions,
        }

    # -- materialization ----------------------------------------------------

    def finalize(self):
        """Pull all per-frame device logs to host in one bulk device_get."""
        if self._finalized:
            return
        self._drain_loop_closure()
        log = self._dev_log

        def cat(entries, base_ndim, empty_shape):
            """Concat per-frame (base rank) and per-chunk (+1 rank) entries."""
            if not entries:
                return jnp.zeros(empty_shape)
            parts = [
                e if e.ndim > base_ndim else e[None] for e in entries
            ]
            return jnp.concatenate(parts, axis=0)

        stacked = {
            "odom_t": cat(log["odom_t"], 1, (0, 3)),
            "fused_t": cat(log["fused_t"], 1, (0, 3)),
        }
        if log.get("prior_t"):
            stacked["prior_t"] = cat(log["prior_t"], 1, (0, 3))
        map_t = cat(log["map_t"], 1, (0, 3))
        n_map = map_t.shape[0]
        if n_map:
            stacked["map_t"] = map_t
            mR = cat(log["map_R"], 2, (0, 3, 3))
            rpys = se3.matrix_to_euler_zyx(mR)
            stacked["map_rpy"] = jnp.stack(rpys, axis=-1)
            stacked["iters"] = cat(
                [d.iterations for d in log["diag"]], 0, (0,)
            )
            stacked["min_lambda"] = cat(
                [d.min_lambda for d in log["diag"]], 0, (0,)
            )
            stacked["cf_mean"] = cat(
                [d.cf_mean for d in log["diag"]], 0, (0,)
            )
            stacked["rejected"] = cat(
                [d.rejected.astype(jnp.int32) for d in log["diag"]], 0, (0,)
            )
            for f in ("n_submap_corner", "n_submap_surf", "n_sel"):
                stacked[f] = cat(
                    [getattr(d, f) for d in log["diag"]], 0, (0,)
                )
        host = jax.device_get(stacked)

        self.odom_positions = host["odom_t"]
        self.fused_positions = host["fused_t"]
        self.prior_positions = host.get("prior_t")
        if n_map:
            # map_time entries are floats (host path) or device arrays
            # (staged-chunk path) — flatten in one pass here.
            times: list = []
            for t in log["map_time"]:
                if isinstance(t, float):
                    times.append(t)
                else:
                    times.extend(float(v) for v in jax.device_get(t))
            self.trajectory = {
                "positions": list(host["map_t"]),
                "rpys": list(host["map_rpy"]),
                "times": times,
            }
            self.diagnostics["iterations"] = [int(v) for v in host["iters"]]
            self.diagnostics["rejected_frames"] = int(host["rejected"].sum())
            self.diagnostics["records"] = [
                {
                    "iterations": int(host["iters"][k]),
                    "min_lambda": float(host["min_lambda"][k]),
                    "cf_mean": float(host["cf_mean"][k]),
                    "rejected": bool(host["rejected"][k]),
                    "n_submap_corner": int(host["n_submap_corner"][k]),
                    "n_submap_surf": int(host["n_submap_surf"][k]),
                    "n_sel": int(host["n_sel"][k]),
                    "frame": k,
                }
                for k in range(n_map)
            ]
        self._finalized = True

    # -- loop closure -------------------------------------------------------

    def _try_loop_closure(self, draining: bool = False):
        """≙ performLoopClosure (mapOptmization.cpp:983-1094) + correctPoses,
        restructured as a zero-sync asynchronous device pipeline (the
        reference's loop thread is asynchronous by design,
        mapOptmization.cpp:317-328):

        1. Candidate detection runs INSIDE the chunk program
           (loopclosure.compute_loopinfo) — the host holds the packed (4,)
           result and reads it one check LATER, when the producing chunk has
           long finished: the read never drains the dispatch queue.
        2. A firing candidate dispatches ONE fused attempt program
           (coarse 2-D align -> gates -> surf ICP -> gates -> factor),
           whose outputs are likewise picked up at the NEXT check.
        3. An accepted attempt appends the factor to the device buffer and
           dispatches the reduced anchor-segment graph solve
           (posegraph.reduced_solve), which applies its own cost-decrease
           gate ON DEVICE — zero host reads on the apply path; its
           diagnostic is picked up at a later check.

        The steady-state cost (no candidate in radius) is ONE deferred
        4-float device_get per check. Every pickup is deferred TWO checks
        (not one): the host runs ahead of the device by about a chunk, so a
        result produced at the end of chunk N-1 is typically still executing
        when chunk N is dispatched — reading it then would cap the host's
        run-ahead at one chunk and stall the device between chunks. Two
        checks of latency is immaterial (the reference's loop thread is
        asynchronous and slower). `draining` (finalize) processes everything
        immediately."""
        m = self.cfg.mapping
        self._check_seq += 1

        self._pickup_solve(draining)
        self._pickup_attempt(draining)

        min_q = 1 if draining else 2
        if len(self._linfo_q) < min_q:
            return
        pend = self._linfo_q.pop(0)
        del self._linfo_q[:-2]  # never let the backlog grow
        cand_slot, cand_dist, n_kf, cur_slot = [
            float(v) for v in jax.device_get(pend)
        ]
        n_kf = int(n_kf)
        if n_kf < 3:
            return
        has_cand = bool(np.isfinite(cand_dist))
        self.loop_diag.append(
            {
                "n_kf": n_kf,
                "cand": int(cand_slot) if has_cand else -1,
                "dist": float(cand_dist) if has_cand else float("inf"),
            }
        )
        if not has_cand or cand_dist >= m.history_keyframe_search_radius:
            return
        # Cooldowns budget attempts DURING the stream; the end-of-stream
        # drain has nothing left to budget — a run that ends right as it
        # re-enters a known place must still close the loop.
        if not draining and self.frame_idx < self._loop_cooldown_until:
            return
        if self._attempt_pending is not None:
            return
        self._loop_cooldown_until = (
            self.frame_idx + m.loop_attempt_cooldown
        )
        out = self._attempt(
            self.bstate,
            jnp.int32(int(cand_slot)),
            jnp.int32(int(cur_slot)),
            jnp.int32(n_kf),
        )
        self._attempt_pending = (*out, self.loop_diag[-1], self._check_seq)
        if draining:
            self._pickup_attempt(True)
            self._pickup_solve(True)

    def _pickup_attempt(self, draining: bool = False):
        """Read a finished attempt program; on acceptance, append the factor
        (host mirror + device buffer) and dispatch the graph solve."""
        if self._attempt_pending is None:
            return
        flags_d, R_d, t_d, diag, seq = self._attempt_pending
        if not draining and self._check_seq < seq + 1:
            return
        self._attempt_pending = None
        flags, R_rel, t_rel = jax.device_get((flags_d, R_d, t_d))
        m = self.cfg.mapping
        diag.update(
            icp_fitness=float(flags[3]),
            coarse_score=float(flags[4]),
            coarse_frac=round(float(flags[5]), 3),
            icp_iters=int(flags[6]),
            icp_inlier_frac=float(flags[7]),
        )
        if flags[0] < 0.5:
            return
        diag["accepted"] = True
        fitness = float(flags[3])
        self.loop_factors.append(
            LoopFactor(
                i=int(flags[1]), j=int(flags[2]),
                R=np.asarray(R_rel), t=np.asarray(t_rel), fitness=fitness,
            )
        )
        info = np.full(
            (6,), 1.0 / max(fitness * m.loop_noise_scale, m.loop_var_floor),
            np.float32
        )
        k = self._loop_write % m.max_loop_factors
        self._loop_write += 1
        self._loop_buf = self._append_loop(
            self._loop_buf, jnp.int32(k),
            jnp.int32(int(flags[1])), jnp.int32(int(flags[2])),
            jnp.asarray(R_rel), jnp.asarray(t_rel), jnp.asarray(info),
            jnp.bool_(True),
        )
        self._loop_cooldown_until = (
            self.frame_idx + m.loop_accept_cooldown
        )
        every = max(m.loop_solve_every_accepts, 1)
        if len(self.loop_factors) % every and not draining:
            return  # factor accumulated; solve at the Nth accept / drain
        if self._solve_graph_sharded is not None:
            self._optimize_graph()
        else:
            self._dispatch_solve(diag)

    def _dispatch_solve(self, diag_ref):
        """Dispatch the reduced anchor-segment solve (device-side apply
        gate); the diagnostic is read at a later check."""
        bs = self.bstate
        self._solved_at = len(self.loop_factors)
        newR, newt, R_map, t_map, sc, sn, diag = self._solve_reduced(
            bs.kf_R, bs.kf_t, bs.kf_rel_R, bs.kf_rel_t, bs.n_kf,
            bs.R_map, bs.t_map, bs.submap_center, bs.submap_n_kf,
            self._loop_buf,
        )
        self.bstate = bs.replace(
            kf_R=newR, kf_t=newt, R_map=R_map, t_map=t_map,
            submap_center=sc, submap_n_kf=sn,
        )
        self._solve_pending = (diag, diag_ref, self._check_seq)

    def _pickup_solve(self, draining: bool = True):
        if self._solve_pending is None:
            return
        diag_d, diag_ref, seq = self._solve_pending
        if not draining and self._check_seq < seq + 1:
            return
        self._solve_pending = None
        ok, c0, c1, moved = [float(v) for v in jax.device_get(diag_d)]
        if diag_ref is not None:
            diag_ref["graph_cost"] = [c0, c1]
            diag_ref["graph_max_move"] = moved
            diag_ref["graph_accepted"] = bool(ok > 0.5)

    def _drain_loop_closure(self):
        """End-of-stream flush (finalize/run_chunked): complete any in-flight
        attempt/solve and run one final synchronous candidate check at the
        last pose — a stream that ends right as it re-enters a known place
        must still close the loop."""
        if not self.cfg.mapping.enable_loop_closure:
            return
        if self.frame_idx == 0:
            return
        self._linfo_q.append(self._loopinfo_probe(self.bstate))
        self._try_loop_closure(draining=True)
        if len(self.loop_factors) > self._solved_at:
            # factors accumulated since the last batched application
            if self._solve_graph_sharded is not None:
                self._optimize_graph()
            else:
                self._dispatch_solve(
                    self.loop_diag[-1] if self.loop_diag else None
                )
        self._pickup_solve()

    def _optimize_graph(self):
        """Whole-graph correction on demand (manual API / sharded path).

        The production path is _dispatch_solve (reduced anchor-segment
        solve, device-side gate); this method exists for direct callers
        (tests, checkpoint load) and for the mesh-sharded solver, and
        blocks until the diagnostic is available."""
        if self._solve_graph_sharded is None:
            self._sync_loop_buf()
            self._dispatch_solve(
                self.loop_diag[-1] if self.loop_diag else None
            )
            self._pickup_solve()
            return
        self._optimize_graph_sharded()

    def _optimize_graph_sharded(self):
        self._solved_at = len(self.loop_factors)
        """Relinearized whole-graph GN through the mesh-sharded PCG solver
        (distributed.sharded_pose_graph_solver); host-assembled factors.
        Factor indices address ring SLOTS; the odometry chain is built in
        logical (append) order via ordered_slots(), and loop factors whose
        keyframes have been retired from the ring are dropped."""
        n_kf = int(self.bstate.n_kf)
        K = self.bstate.kf_t.shape[0]
        slots = self.bstate.ordered_slots()
        A = len(slots)
        base = n_kf - A  # absolute id of the oldest resident keyframe

        # chain factors from recorded odometry increments: logical pair
        # (l-1, l) measured by kf_rel at the younger keyframe's slot
        ci = np.zeros((K - 1,), np.int32)
        cj = np.zeros((K - 1,), np.int32)
        cmask = np.zeros((K - 1,), bool)
        if A >= 2:
            ci[: A - 1] = slots[:-1]
            cj[: A - 1] = slots[1:]
            cmask[: A - 1] = True
        rel_R = self.bstate.kf_rel_R[jnp.asarray(cj)]
        rel_t = self.bstate.kf_rel_t[jnp.asarray(cj)]

        m = self.cfg.mapping
        cap = m.max_loop_factors
        live = [f for f in self.loop_factors if f.i >= base and f.j >= base]
        live = live[-cap:]
        nl = len(live)
        li = np.zeros((cap,), np.int32)
        lj = np.zeros((cap,), np.int32)
        lR = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
        lt = np.zeros((cap, 3), np.float32)
        loop_info = np.zeros((cap, 6), np.float32)
        for k, f in enumerate(live):
            li[k] = slots[f.i - base]
            lj[k] = slots[f.j - base]
            lR[k] = f.R
            lt[k] = f.t
            loop_info[k] = 1.0 / max(f.fitness * m.loop_noise_scale, m.loop_var_floor)
        chain_info = np.tile(
            np.array(
                [[1.0 / m.chain_rot_var] * 3 + [1.0 / m.chain_trans_var] * 3],
                np.float32,
            ),
            (K - 1, 1),
        )

        lmask = np.zeros((cap,), bool)
        lmask[:nl] = True
        factors = Factors(
            i=jnp.concatenate([jnp.asarray(ci), jnp.asarray(li)]),
            j=jnp.concatenate([jnp.asarray(cj), jnp.asarray(lj)]),
            R=jnp.concatenate([rel_R, jnp.asarray(lR)]),
            t=jnp.concatenate([rel_t, jnp.asarray(lt)]),
            info=jnp.asarray(np.concatenate([chain_info, loop_info])),
            mask=jnp.concatenate(
                [jnp.asarray(cmask), jnp.asarray(lmask)]
            ),
        )
        active = jnp.arange(K) < n_kf
        # shard factors over the mesh (pad count to the device multiple)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = self._mesh.devices.size
        F = factors.i.shape[0]
        pad = (-F) % ndev
        if pad:
            factors = Factors(
                i=jnp.pad(factors.i, (0, pad)),
                j=jnp.pad(factors.j, (0, pad)),
                R=jnp.pad(factors.R, ((0, pad), (0, 0), (0, 0))),
                t=jnp.pad(factors.t, ((0, pad), (0, 0))),
                info=jnp.pad(factors.info, ((0, pad), (0, 0))),
                mask=jnp.pad(factors.mask, (0, pad)),
            )
        spec = NamedSharding(self._mesh, P(("graph", "map")))
        rep = NamedSharding(self._mesh, P())
        factors_rep = factors  # uncommitted copy for the cost probe below
        factors = jax.tree.map(lambda x: jax.device_put(x, spec), factors)
        newR, newt = self._solve_graph_sharded(
            jax.device_put(self.bstate.kf_R, rep),
            jax.device_put(self.bstate.kf_t, rep),
            factors,
            jax.device_put(active, rep),
        )
        # restore the store's own sharding so the chunk runner's input
        # shardings (and its donation) stay stable across loop closures
        newR = jax.device_put(newR, self.bstate.kf_R.sharding)
        newt = jax.device_put(newt, self.bstate.kf_t.sharding)

        # Solver-health gate (same philosophy as the mapping armor): a
        # correction must REDUCE the graph's weighted residual and stay
        # finite, else keep the old poses (the factor — and its diagnostic —
        # is retained for the next, better-conditioned solve).
        from .posegraph import graph_cost

        if getattr(self, "_graph_cost", None) is None:
            self._graph_cost = jax.jit(graph_cost)
        # Cost probe with the UNCOMMITTED factor copy: the sharded factors
        # are committed to the mesh while the keyframe store may live on one
        # device (shard_backend off), and jit refuses mixed committed
        # device sets.
        c0, c1, moved = jax.device_get((
            self._graph_cost(self.bstate.kf_R, self.bstate.kf_t, factors_rep),
            self._graph_cost(newR, newt, factors_rep),
            jnp.max(
                jnp.where(
                    active, jnp.linalg.norm(newt - self.bstate.kf_t, axis=1), 0.0
                )
            ),
        ))
        ok = bool(np.isfinite(c1)) and bool(c1 < c0)
        if self.loop_diag:
            self.loop_diag[-1]["graph_cost"] = [float(c0), float(c1)]
            self.loop_diag[-1]["graph_max_move"] = float(moved)
            self.loop_diag[-1]["graph_accepted"] = ok
        if not ok:
            return
        newest = int(slots[-1])
        newR = se3.orthonormalize(newR)
        self.bstate = self.bstate.replace(
            kf_R=newR,
            kf_t=newt,
            R_map=newR[newest],
            t_map=newt[newest],
            # corrected keyframe poses invalidate the cached submap
            submap_center=jnp.full((3,), 1e9),
            submap_n_kf=jnp.int32(-1),
        )

    # -- batch driver -------------------------------------------------------

    def run(self, scans, timestamps=None):
        """Process a (T, N, 3) scan stack; returns trajectory dict.
        Honors request_stop() (≙ /initialpose ending the run loop)."""
        for k in range(len(scans)):
            if self._stop_requested:
                break
            ts = None if timestamps is None else timestamps[k]
            self.process_scan(scans[k], ts)
        self.finalize()
        return {
            "map_positions": np.asarray(self.trajectory["positions"]),
            "odom_positions": self.odom_positions,
            "fused_positions": self.fused_positions,
        }

    def keyframe_trajectory(self):
        """Corrected keyframe poses (R (A,3,3), t (A,3), times (A,)), oldest
        -> newest. This is what the reference's pose.txt records
        (saveMapService, mapOptmization.cpp:399-411): keyframe poses AFTER
        loop-closure corrections — unlike the per-frame logs, which keep the
        pose each frame had when it was processed."""
        slots = self.bstate.ordered_slots()
        R, t, times = jax.device_get(
            (self.bstate.kf_R, self.bstate.kf_t, self.bstate.kf_time)
        )
        return R[slots], t[slots], times[slots]

    # -- persistence --------------------------------------------------------

    def save_artifacts(self, out_dir: str):
        self.finalize()
        from .utils.metrics import save_run_artifacts

        save_run_artifacts(out_dir, self.trajectory, self.diagnostics)

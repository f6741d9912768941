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
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .backend import BackendState, backend_step, init_backend_state
from .config import LegoLoamConfig
from .frontend import frontend_step, init_odometry_state
from .fusion import fuse_pose
from .loopclosure import detect_loop_candidate, icp_point2point
from .math import se3
from .posegraph import Factors, solve_pose_graph
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

    def __init__(self, cfg: LegoLoamConfig, seed: int = 0):
        self.cfg = cfg
        self._key = jax.random.PRNGKey(seed)

        self._frontend = jax.jit(
            lambda pts, mask, state, key: frontend_step(pts, mask, state, cfg, key)
        )
        self._backend = jax.jit(
            lambda state, feats, oxyz, omask, R, t, tm: backend_step(
                state, feats, oxyz, omask, R, t, tm, cfg
            )
        )
        self._icp = jax.jit(
            lambda src, sm, tgt, tm, R0, t0: icp_point2point(
                src, sm, tgt, tm, cfg, R0, t0
            )
        )
        self._solve_graph = jax.jit(
            lambda R, t, f, mask: solve_pose_graph(R, t, f, mask, cfg)
        )

        self.fstate: OdometryState = init_odometry_state(cfg)
        self.bstate: BackendState = init_backend_state(cfg)
        self.loop_factors: list[LoopFactor] = []
        self.frame_idx = 0
        self.trajectory = {"positions": [], "rpys": [], "times": []}
        self.odom_trajectory = []
        self.fused_trajectory = []
        self.diagnostics = {"mapping_ms": [], "iterations": [], "records": []}
        self._last_loop_check = -(10 ** 9)

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

    def process_scan(self, points: np.ndarray, timestamp: Optional[float] = None):
        cfg = self.cfg
        t_scan = timestamp if timestamp is not None else self.frame_idx * cfg.laser.scan_period
        self._key, sub = jax.random.split(self._key)

        pts, mask = self._prep(points)
        self.fstate, out = self._frontend(pts, mask, self.fstate, sub)

        result = {
            "R_odom": out["R_world"],
            "t_odom": out["t_world"],
        }
        self.odom_trajectory.append(np.asarray(out["t_world"]))

        run_mapping = (self.frame_idx % cfg.mapping.mapping_frequency_divider) == 0
        if run_mapping:
            t0 = _time.perf_counter()
            seg = out["segmented"]
            self.bstate, (R_map, t_map), diag = self._backend(
                self.bstate,
                out["features"],
                seg.outlier_xyz,
                seg.outlier_mask,
                out["R_world"],
                out["t_world"],
                jnp.float32(t_scan),
            )
            jax.block_until_ready(t_map)
            dt_ms = (_time.perf_counter() - t0) * 1e3
            self.diagnostics["mapping_ms"].append(dt_ms)
            self.diagnostics["iterations"].append(int(diag.iterations))
            self.diagnostics["records"].append(
                {
                    "iterations": int(diag.iterations),
                    "min_lambda": float(diag.min_lambda),
                    "cf_mean": float(diag.cf_mean),
                    "frame": self.frame_idx,
                }
            )
            result["R_map"] = R_map
            result["t_map"] = t_map

            tm = np.asarray(t_map)
            Rm = np.asarray(R_map)
            rpy = [float(v) for v in se3.matrix_to_euler_zyx(jnp.asarray(Rm))]
            self.trajectory["positions"].append(tm)
            self.trajectory["rpys"].append(rpy)
            self.trajectory["times"].append(t_scan)

            if (
                cfg.mapping.enable_loop_closure
                and self.frame_idx - self._last_loop_check
                >= cfg.mapping.loop_every_n_frames
            ):
                self._last_loop_check = self.frame_idx
                self._try_loop_closure()

        # Fused (odometry-rate) pose
        Rf, tf = fuse_pose(
            self.bstate.R_map,
            self.bstate.t_map,
            self.bstate.R_odom,
            self.bstate.t_odom,
            out["R_world"],
            out["t_world"],
        )
        result["R_fused"] = Rf
        result["t_fused"] = tf
        self.fused_trajectory.append(np.asarray(tf))

        self.frame_idx += 1
        return result

    # -- loop closure -------------------------------------------------------

    def _try_loop_closure(self):
        """≙ performLoopClosure (mapOptmization.cpp:983-1094) + correctPoses."""
        cfg = self.cfg
        n_kf = int(self.bstate.n_kf)
        if n_kf < 3:
            return
        positions = np.asarray(self.bstate.kf_t[:n_kf])
        times = np.asarray(self.bstate.kf_time[:n_kf])
        cur = n_kf - 1
        cand = detect_loop_candidate(positions, times, n_kf, cur, cfg)
        if cand < 0:
            return

        # history submap: ±history_keyframe_search_num keyframes around cand
        h = cfg.mapping.history_keyframe_search_num // 2
        lo = max(0, cand - h)
        hi = min(n_kf, cand + h + 1)
        idx = jnp.arange(lo, hi)

        kf_R = self.bstate.kf_R
        kf_t = self.bstate.kf_t
        tgt = jnp.einsum(
            "kij,knj->kni", kf_R[idx], self.bstate.kf_surf[idx]
        ) + kf_t[idx][:, None, :]
        tgt_mask = self.bstate.kf_surf_mask[idx]
        src = (
            jnp.einsum("ij,nj->ni", kf_R[cur], self.bstate.kf_surf[cur])
            + kf_t[cur][None, :]
        )
        res = self._icp(
            src,
            self.bstate.kf_surf_mask[cur],
            tgt.reshape(-1, 3),
            tgt_mask.reshape(-1),
            jnp.eye(3),
            jnp.zeros(3),
        )
        if float(res.fitness) > cfg.mapping.history_keyframe_fitness_score:
            return

        # Loop factor: corrected cur pose vs cand pose
        Rc = np.asarray(res.R) @ np.asarray(kf_R[cur])
        tc = np.asarray(res.R) @ np.asarray(kf_t[cur]) + np.asarray(res.t)
        R_cand = np.asarray(kf_R[cand])
        t_cand = np.asarray(kf_t[cand])
        R_rel = R_cand.T @ Rc
        t_rel = R_cand.T @ (tc - t_cand)
        self.loop_factors.append(
            LoopFactor(i=cand, j=cur, R=R_rel, t=t_rel, fitness=float(res.fitness))
        )
        self._optimize_graph()

    def _optimize_graph(self):
        """Relinearized whole-graph GN (≙ ISAM2 update + correctPoses)."""
        cfg = self.cfg
        n_kf = int(self.bstate.n_kf)
        K = self.bstate.kf_t.shape[0]

        # chain factors from recorded odometry increments
        ci = np.arange(K - 1, dtype=np.int32)
        cj = ci + 1
        cR = np.asarray(self.bstate.kf_rel_R[1:])
        ct = np.asarray(self.bstate.kf_rel_t[1:])
        cmask = cj < n_kf

        nl = len(self.loop_factors)
        li = np.array([f.i for f in self.loop_factors], np.int32)
        lj = np.array([f.j for f in self.loop_factors], np.int32)
        lR = (
            np.stack([f.R for f in self.loop_factors])
            if nl
            else np.zeros((0, 3, 3), np.float32)
        )
        lt = (
            np.stack([f.t for f in self.loop_factors])
            if nl
            else np.zeros((0, 3), np.float32)
        )

        i = np.concatenate([ci, li])
        j = np.concatenate([cj, lj])
        R = np.concatenate([cR, lR]).astype(np.float32)
        t = np.concatenate([ct, lt]).astype(np.float32)
        mask = np.concatenate([cmask, np.ones(nl, bool)])
        # variances ≙ (1e-6 rot, 1e-8 trans) chain; loop noise scaled by
        # ICP fitness (mapOptmization.cpp:1040-1047)
        info = np.concatenate(
            [
                np.tile(np.array([[1e6] * 3 + [1e8] * 3], np.float32), (K - 1, 1)),
                np.stack(
                    [
                        np.full((6,), 1.0 / max(f.fitness, 1e-3), np.float32)
                        for f in self.loop_factors
                    ]
                )
                if nl
                else np.zeros((0, 6), np.float32),
            ]
        )

        factors = Factors(
            i=jnp.asarray(i),
            j=jnp.asarray(j),
            R=jnp.asarray(R),
            t=jnp.asarray(t),
            info=jnp.asarray(info),
            mask=jnp.asarray(mask),
        )
        active = jnp.arange(K) < n_kf
        newR, newt = self._solve_graph(
            self.bstate.kf_R, self.bstate.kf_t, factors, active
        )
        self.bstate = self.bstate.replace(
            kf_R=newR,
            kf_t=newt,
            R_map=newR[n_kf - 1],
            t_map=newt[n_kf - 1],
        )

    # -- batch driver -------------------------------------------------------

    def run(self, scans, timestamps=None):
        """Process a (T, N, 3) scan stack; returns trajectory dict."""
        for k in range(len(scans)):
            ts = None if timestamps is None else timestamps[k]
            self.process_scan(scans[k], ts)
        return {
            "map_positions": np.asarray(self.trajectory["positions"]),
            "odom_positions": np.asarray(self.odom_trajectory),
            "fused_positions": np.asarray(self.fused_trajectory),
        }

    # -- persistence --------------------------------------------------------

    def save_artifacts(self, out_dir: str):
        from .utils.metrics import save_run_artifacts

        save_run_artifacts(out_dir, self.trajectory, self.diagnostics)

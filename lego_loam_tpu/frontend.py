"""Front-end composition: raw cloud -> features -> scan-to-scan odometry.

One jitted program per scan covering the reference's ImageProjection node and
FeatureAssociation node (`imageProjection.cpp` + `featureAssociation.cpp`),
with the ROS topic plumbing replaced by pure array state threading
(OdometryState).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .math import se3
from .odometry import to_scan_end, two_step_odometry
from .ops.features import extract_features, shadow_points
from .ops.ground import apply_ground
from .ops.projection import project_point_cloud
from .ops.segmentation import segment_cloud
from .types import FeatureCloud, OdometryState, ScanFeatures, SegmentedScan


def init_odometry_state(cfg: LegoLoamConfig) -> OdometryState:
    f = cfg.features
    empty_corner = FeatureCloud(
        xyz=jnp.zeros((f.max_corner_less_sharp, 3)),
        ring=jnp.full((f.max_corner_less_sharp,), -1, jnp.int32),
        rel_time=jnp.zeros((f.max_corner_less_sharp,)),
        mask=jnp.zeros((f.max_corner_less_sharp,), bool),
    )
    # Odometry surf target = ground-only less-flat slice + shadow grid.
    n_surf = f.surf_ground_cap + f.shadow_rows * f.shadow_cols
    empty_surf = FeatureCloud(
        xyz=jnp.zeros((n_surf, 3)),
        ring=jnp.full((n_surf,), -1, jnp.int32),
        rel_time=jnp.zeros((n_surf,)),
        mask=jnp.zeros((n_surf,), bool),
    )
    return OdometryState(
        R_prev_cur=jnp.eye(3),
        t_prev_cur=jnp.zeros(3),
        R_world=jnp.eye(3),
        t_world=jnp.zeros(3),
        last_corner=empty_corner,
        last_surf=empty_surf,
        initialized=jnp.bool_(False),
    )


def _with_shadow(surf: FeatureCloud, cfg: LegoLoamConfig) -> FeatureCloud:
    """Append the virtual shadow grid to a (padded) surf cloud — the
    reference injects them into the previous-scan surf kd-tree as well
    (featureAssociation.cpp:2304-2306, :2705-2707)."""
    sp = shadow_points(cfg)
    nsp = sp.shape[0]
    return FeatureCloud(
        xyz=jnp.concatenate([surf.xyz, sp], axis=0),
        ring=jnp.concatenate(
            [surf.ring, jnp.full((nsp,), cfg.laser.num_vertical_scans + 1, jnp.int32)]
        ),
        rel_time=jnp.concatenate([surf.rel_time, jnp.ones((nsp,))]),
        mask=jnp.concatenate(
            [surf.mask, jnp.full((nsp,), cfg.features.use_shadow_points, bool)]
        ),
    )


def stage1(points, mask, cfg: LegoLoamConfig, key=None):
    """Projection + ground + segmentation (≙ ImageProjection::cloudHandler)."""
    grid = project_point_cloud(points, mask, cfg)
    return stage1_from_grid(grid, cfg, key)


def stage1_from_grid(grid, cfg: LegoLoamConfig, key=None):
    """Ground + segmentation on a pre-built ScanGrid (range-image feed: the
    host packed the projection, grid_from_range_image reconstructed it)."""
    grid = apply_ground(grid, cfg, key)
    return segment_cloud(grid, cfg)


def frontend_prepass(
    points, mask, cfg: LegoLoamConfig, key=None, imu_track=None, grid=None,
):
    """Per-frame-independent front-end work: projection, ground removal,
    segmentation, feature extraction (≙ the ImageProjection node plus the
    feature half of runFeatureAssociation). No dependence on any previous
    scan's state, so the pipeline vmaps it across a chunk of scans — tiny
    (16, 1800) grid ops amortize their fixed per-op cost over the batch.

    imu_track: optional imu.ImuTrack for scan undistortion
    (cfg.pipeline.use_imu_undistortion). grid: optional pre-built ScanGrid
    (range-image feed) — points/mask are then ignored.
    Returns (grid, seg, feats)."""
    if grid is not None:
        grid, seg = stage1_from_grid(grid, cfg, key)
    else:
        grid, seg = stage1(points, mask, cfg, key)
    if imu_track is not None and cfg.pipeline.use_imu_undistortion:
        # Undistort after projection (the reference also projects the raw
        # cloud first and warps inside FeatureAssociation, adjustDistortion).
        # One hop to the scan-END frame; rel_time becomes 1 so the motion
        # warp does not double-compensate (the reference undistorts to
        # start and re-projects to end later, TransformToEnd — equivalent).
        from .imu import undistort_to

        seg_xyz = undistort_to(
            seg.xyz, seg.rel_time, imu_track, cfg.laser.scan_period,
            ref_time=1.0,
        )
        seg = seg.replace(
            xyz=jnp.where(seg.valid[..., None], seg_xyz, seg.xyz),
            rel_time=jnp.where(seg.valid, 1.0, seg.rel_time),
        )
    feats = extract_features(seg, cfg)

    if cfg.pipeline.rigid_scans:
        # Synthetic rigid-rendered clouds: all points captured at scan end,
        # so the constant-twist warp would inject model error. The reference
        # always warps (TransformToStart, featureAssociation.cpp:1389-1412)
        # — that is the default path (rigid_scans=False).
        feats = ScanFeatures(
            corner_sharp=feats.corner_sharp.replace(
                rel_time=jnp.ones_like(feats.corner_sharp.rel_time)
            ),
            corner_less_sharp=feats.corner_less_sharp.replace(
                rel_time=jnp.ones_like(feats.corner_less_sharp.rel_time)
            ),
            surf_flat=feats.surf_flat.replace(
                rel_time=jnp.ones_like(feats.surf_flat.rel_time)
            ),
            surf_less_flat=feats.surf_less_flat.replace(
                rel_time=jnp.ones_like(feats.surf_less_flat.rel_time)
            ),
            surf_ground=feats.surf_ground.replace(
                rel_time=jnp.ones_like(feats.surf_ground.rel_time)
            ),
        )
    return grid, seg, feats


def frontend_solve(
    feats: ScanFeatures, state: OdometryState, cfg: LegoLoamConfig,
    odom_prior=None, imu_att=None,
):
    """Sequential front-end half: two-step scan-to-scan GN, world-pose
    integration, and the scan-end buffer swap (≙ updateTransformation /
    integrateTransformation / publishCloudsLast). Depends on the previous
    scan's state, so the pipeline runs it inside the lax.scan.

    imu_att: optional ((3,3) R, () valid) — the orientation-resolved IMU
    attitude at scan end; see OdometryConfig.imu_attitude_weight."""
    mode = cfg.odometry.odom_prior_mode
    if odom_prior is not None and mode == "init":
        M_R0, M_t0 = odom_prior
    else:
        M_R0, M_t0 = state.R_prev_cur, state.t_prev_cur

    def solve(_):
        return two_step_odometry(
            feats, state.last_corner, state.last_surf, M_R0, M_t0, cfg
        )

    def first(_):
        return jnp.eye(3), jnp.zeros(3)

    M_R, M_t = jax.lax.cond(state.initialized, solve, first, None)
    if odom_prior is not None and mode == "override":
        # Reference as-committed: updateInitialGuess() runs AFTER
        # updateTransformation() and overwrites the LM result
        # (featureAssociation.cpp:2789-2790).
        M_R, M_t = odom_prior

    # IMU attitude anchor (≙ the reference folding AHRS roll/pitch/yaw into
    # its transform): pull the composed world attitude a fraction toward
    # the IMU's absolute attitude, re-expressed as a correction on M so the
    # warm start / deskew / state stay self-consistent.
    w_att = cfg.odometry.imu_attitude_weight
    if imu_att is not None and w_att > 0:
        R_att, att_valid = imu_att
        R_pred = state.R_world @ M_R
        e = se3.log_so3(R_pred.transpose() @ R_att)
        w_eff = (
            w_att
            * att_valid.astype(jnp.float32)
            * state.initialized.astype(jnp.float32)
        )
        M_R = M_R @ se3.exp_so3(w_eff * e)

    # World pose integration: T_w_cur = T_w_prev ∘ M
    R_world, t_world = se3.compose(state.R_world, state.t_world, M_R, M_t)

    # Re-project this scan's features to scan end and stash as next targets
    # (≙ publishCloudsLast buffer swap, featureAssociation.cpp:2660-2740).
    # Surf target is the ground-only slice: the surf-stage queries are
    # ground picks, structure tripods are normal-gated anyway, and a
    # smaller target shrinks the stage's distance matrix.
    #
    # Deskew with the two-frame SE(3) AVERAGE of the motion, not the raw
    # per-frame solve: the solve's error feeds the next frame's targets
    # (shifted by -(1-s)*err), whose displaced minimum feeds the next solve
    # — a feedback loop with gain ~1 that sustains a period-2 limit cycle
    # (measured +-0.1 m alternating estimates). The 2-tap average has
    # exactly zero gain at that frequency for a half-frame of deskew lag
    # (true motion at 10 Hz changes little per frame). Pose integration and
    # the warm start still use the raw solve.
    dRp, dtp = se3.relative(state.R_prev_cur, state.t_prev_cur, M_R, M_t)
    dRh, dth = se3.interp(dRp, dtp, jnp.float32(0.5))
    M_R_avg, M_t_avg = se3.compose(state.R_prev_cur, state.t_prev_cur, dRh, dth)
    first = ~state.initialized
    M_R_avg = jnp.where(first, M_R, M_R_avg)
    M_t_avg = jnp.where(first, M_t, M_t_avg)
    new_corner = to_scan_end(feats.corner_less_sharp, M_R_avg, M_t_avg)
    new_surf = to_scan_end(feats.surf_ground, M_R_avg, M_t_avg)
    new_surf = _with_shadow(new_surf, cfg)

    # De-skewed clouds for the MAPPING stage (≙ the reference handing
    # TransformToEnd-projected clouds to MapOptimization,
    # featureAssociation.cpp:2660-2740). Without this, every stored
    # keyframe cloud is smeared ALONG ITS HEADING by up to one frame of
    # motion; where laps traverse the same structures in different
    # directions the map holds differently-smeared copies, and scan-to-map
    # against the blended surface walks (measured +5 cm/frame runaway
    # forward inflation starting exactly at the first reverse-heading
    # revisit).
    map_surf = to_scan_end(feats.surf_less_flat, M_R_avg, M_t_avg)

    new_state = OdometryState(
        R_prev_cur=M_R,
        t_prev_cur=M_t,
        R_world=R_world,
        t_world=t_world,
        last_corner=new_corner,
        last_surf=new_surf,
        initialized=jnp.bool_(True),
    )
    outputs = {
        "features": feats,
        "M_R": M_R,
        "M_t": M_t,
        "M_R_avg": M_R_avg,
        "M_t_avg": M_t_avg,
        "R_world": R_world,
        "t_world": t_world,
        # De-skewed (scan-end) clouds for mapping:
        "map_corner": new_corner,
        "map_surf": map_surf,
    }
    return new_state, outputs


def deskew_outliers(seg: SegmentedScan, M_R, M_t, cfg: LegoLoamConfig):
    """De-skew the outlier cloud to scan end for the mapping stage (see
    frontend_solve's map_* outputs). Identity for rigid-rendered scans."""
    if cfg.pipeline.rigid_scans:
        return seg.outlier_xyz
    oc = FeatureCloud(
        xyz=seg.outlier_xyz,
        ring=jnp.zeros(seg.outlier_mask.shape, jnp.int32),
        rel_time=seg.outlier_rel,
        mask=seg.outlier_mask,
    )
    return to_scan_end(oc, M_R, M_t).xyz


def frontend_step(
    points, mask, state: OdometryState, cfg: LegoLoamConfig, key=None,
    odom_prior=None, imu_track=None,
):
    """Full per-scan front end (≙ runFeatureAssociation,
    featureAssociation.cpp:2742-2853) = prepass ∘ solve.
    Returns (new_state, outputs).

    odom_prior: optional (R, t) inter-frame motion from wheel odometry
    (imu.odom_prior_motion). Its use follows cfg.odometry.odom_prior_mode:
    'init' seeds the solver (upstream-intended behaviour), 'override'
    replaces the solved motion (the reference's as-committed ablation,
    featureAssociation.cpp:2789-2790), 'off' ignores it."""
    grid, seg, feats = frontend_prepass(points, mask, cfg, key, imu_track)
    imu_att = None
    if imu_track is not None and cfg.pipeline.use_imu_undistortion:
        last = jnp.maximum(jnp.sum(imu_track.mask) - 1, 0)
        imu_att = (imu_track.R[last], jnp.any(imu_track.mask))
    new_state, out = frontend_solve(feats, state, cfg, odom_prior, imu_att)
    out["grid"] = grid
    out["segmented"] = seg
    out["map_outlier_xyz"] = deskew_outliers(
        seg, out["M_R_avg"], out["M_t_avg"], cfg
    )
    return new_state, out


def make_frontend(cfg: LegoLoamConfig):
    """Jitted per-scan front-end step."""

    @jax.jit
    def step(points, mask, state, key):
        return frontend_step(points, mask, state, cfg, key)

    return step


def frontend_step_fused(
    points, mask, state: OdometryState, frame_idx, R_map, t_map,
    R_odom_at_map, t_odom_at_map, cfg: LegoLoamConfig,
    imu=None, odom=None,
):
    """frontend_step + per-frame RNG derivation + TransformFusion output in
    one program (zero eager host-side device ops per frame).

    imu: optional dict {"t": (S,), "rpy": (S,3), "acc": (S,3),
    "mask": (S,)} of raw IMU samples over this scan's period (times relative
    to scan start) — integrated on device and used for undistortion when
    cfg.pipeline.use_imu_undistortion (≙ imuHandler + adjustDistortion,
    featureAssociation.cpp:315-789).
    odom: optional dict {"R_prev", "t_prev", "R_cur", "t_cur"} wheel-odometry
    poses at the previous/current scan — turned into the inter-frame motion
    prior per cfg.odometry.odom_prior_mode (≙ updateInitialGuess,
    featureAssociation.cpp:2337-2503)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), frame_idx)

    imu_track = None
    if imu is not None and cfg.pipeline.use_imu_undistortion:
        from .imu import integrate_imu

        imu_track = integrate_imu(
            imu["t"], imu["rpy"], imu["acc"], mask=imu["mask"]
        )

    odom_prior = None
    if odom is not None and cfg.odometry.odom_prior_mode != "off":
        from .imu import odom_prior_motion

        odom_prior = odom_prior_motion(
            state.R_world, state.t_world,
            odom["R_prev"], odom["t_prev"], odom["R_cur"], odom["t_cur"],
            cfg.odometry.odom_lever_arm,
        )

    new_state, out = frontend_step(
        points, mask, state, cfg, key,
        odom_prior=odom_prior, imu_track=imu_track,
    )
    from .fusion import fuse_pose

    Rf, tf = fuse_pose(
        R_map, t_map, R_odom_at_map, t_odom_at_map,
        out["R_world"], out["t_world"],
    )
    out["R_fused"] = Rf
    out["t_fused"] = tf
    return new_state, out

"""IMU integration and scan undistortion.

≙ FeatureAssociation's IMU path (`featureAssociation.cpp:315-789`): the
imuHandler ring buffer + AccumulateIMUShiftAndRotation integration
(:452-489), and adjustDistortion's per-point orientation/shift interpolation
that re-projects every point into the scan-start frame (:565-789). The
reference's 200-slot ring buffer becomes a per-scan array of IMU samples;
integration is a `lax.scan`; per-point interpolation is a vectorized
searchsorted + slerp-free small-angle blend.

Enabled via cfg.pipeline.use_imu_undistortion (the reference ships this off
in every config, loam_config.yaml:59 — parity preserved).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import se3


class ImuTrack(NamedTuple):
    """Integrated IMU trajectory over one scan period."""

    t: jax.Array  # (S,) sample times (relative to scan start, seconds)
    R: jax.Array  # (S, 3, 3) orientation (world frame)
    shift: jax.Array  # (S, 3) accumulated position
    velo: jax.Array  # (S, 3) velocity
    mask: jax.Array  # (S,) valid samples


def integrate_imu(t, rpy, acc, v0=None, mask=None) -> ImuTrack:
    """Integrate raw IMU samples into an ImuTrack.

    t: (S,) times; rpy: (S, 3) roll/pitch/yaw orientation (as the reference
    consumes orientation-resolved IMU messages); acc: (S, 3) body-frame
    acceleration including gravity. Gravity is removed using the orientation
    (≙ imuHandler featureAssociation.cpp:323-334); shift/velocity integrate
    trapezoid-free like AccumulateIMUShiftAndRotation (:452-489)."""
    S = t.shape[0]
    if mask is None:
        mask = jnp.ones((S,), bool)
    R = se3.euler_zyx_to_matrix(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    g = jnp.array([0.0, 0.0, -9.81])
    acc_w = jnp.einsum("sij,sj->si", R, acc) + g

    dt = jnp.diff(t, prepend=t[:1])
    v0 = jnp.zeros(3) if v0 is None else v0

    def step(carry, inp):
        v, p = carry
        a, dti, m = inp
        dti = jnp.where(m, dti, 0.0)
        p_new = p + v * dti + 0.5 * a * dti * dti
        v_new = v + a * dti
        return (v_new, p_new), (v_new, p_new)

    (_, _), (velo, shift) = jax.lax.scan(
        step, (v0, jnp.zeros(3)), (acc_w, dt, mask)
    )
    return ImuTrack(t=t, R=R, shift=shift, velo=velo, mask=mask)


def _interp_track(track: ImuTrack, tq):
    """Orientation + shift at query times (piecewise-linear)."""
    S = track.t.shape[0]
    tt = jnp.where(track.mask, track.t, jnp.inf)
    hi = jnp.clip(jnp.searchsorted(tt, tq), 1, S - 1)
    lo = hi - 1
    t0 = track.t[lo]
    t1 = track.t[hi]
    w = jnp.clip((tq - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)

    # blend rotations through the relative log (exact geodesic interp)
    R0 = track.R[lo]
    R1 = track.R[hi]
    dR = jnp.einsum("qji,qjk->qik", R0, R1)  # R0^T R1
    wlog = se3.log_so3(dR) * w[:, None]
    Rq = jnp.einsum("qij,qjk->qik", R0, se3.exp_so3(wlog))
    shiftq = track.shift[lo] * (1 - w[:, None]) + track.shift[hi] * w[:, None]
    return Rq, shiftq


def undistort_to_start(xyz, rel_time, track: ImuTrack, scan_period: float):
    """Re-express points captured at rel_time into the scan-start frame.

    p_start = R0^T (R_s p + shift_s - shift_0)   (≙ adjustDistortion's
    rotate-to-start + shift compensation, featureAssociation.cpp:606-700)."""
    return undistort_to(xyz, rel_time, track, scan_period, ref_time=0.0)


def undistort_to(xyz, rel_time, track: ImuTrack, scan_period: float,
                 ref_time: float = 1.0):
    """Re-express points captured at rel_time into the sensor frame at
    relative time ref_time (1.0 = scan end — the convention the rest of the
    pipeline uses for a settled cloud: after this, rel_time is 1 and no
    further motion warping applies). The reference undistorts to scan start
    and later re-projects everything to scan end (TransformToEnd,
    featureAssociation.cpp:1414-1490); doing it in one hop is equivalent."""
    shape = xyz.shape[:-1]
    flat = xyz.reshape(-1, 3)
    tq = (rel_time.reshape(-1)) * scan_period
    Rq, shiftq = _interp_track(track, tq)
    tr = jnp.full_like(tq[:1], ref_time * scan_period)
    Rr, shiftr = _interp_track(track, tr)
    p_world = jnp.einsum("qij,qj->qi", Rq, flat) + shiftq
    p_ref = jnp.einsum("ji,qj->qi", Rr[0], p_world - shiftr[0])
    return p_ref.reshape(*shape, 3)


def odom_prior_motion(
    R_slam, t_slam,  # accumulated SLAM odometry pose (sensor frame chain)
    R_odom_prev, t_odom_prev,  # wheel-odom pose at previous scan
    R_odom_cur, t_odom_cur,  # wheel-odom pose at current scan
    lever_arm,
):
    """Inter-frame motion prior from wheel odometry with lever-arm correction.

    ≙ updateInitialGuess (featureAssociation.cpp:2337-2503): the fork
    computes the relative rotation between consecutive odom poses and a
    lever-arm-corrected translation, expressed in the sensor frame. Returns
    (M_R, M_t) in the same convention as two_step_odometry's motion."""
    la = jnp.asarray(lever_arm)
    # sensor positions implied by odom poses
    p_prev = t_odom_prev + R_odom_prev @ la
    p_cur = t_odom_cur + R_odom_cur @ la
    dR = R_odom_prev.T @ R_odom_cur
    dt = R_odom_prev.T @ (p_cur - p_prev)
    return dR, dt

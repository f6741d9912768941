"""Ackermann vehicle model: linkage kinematics + measurement covariance.

TPU-native rewrite of the reference's `AckermanStatePropagation`
(`myESKF.cpp:639-752`) and of the MATLAB-Coder measurement-covariance
generator (`MeaCovFromMatlab/MeaCov2C_pkg/MeaCov2C.cpp`). The generated C
code is 368 lines of unrolled symbolic Jacobian algebra; here the covariance
is propagated with `jax.jacfwd` through the same kinematics function — the
mathematically identical operation, derived by autodiff instead of codegen.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import se3

# Vehicle linkage parameters, meters (myESKF.h:215-224, given in mm there).
L = 0.176
L1 = 0.112
L2 = 0.04452
L3 = 0.085
L4 = L2
L_REAR = 0.164
L_AX = (L_REAR - L1) / 2.0
R_WHEEL = 0.100

# Encoder scale factors (myESKF.h:107-108)
REAR_WHEEL_COUNT = 60000.0 * 45.0 / 35.0
HEADING_ANGLE_COUNT = 2.0 ** 14


def _cot(x):
    return jnp.cos(x) / jnp.sin(x)


def _acot(x):
    return jnp.arctan2(1.0, x)


def ackermann_kinematics(vel_wheel, steer_rel, encoder_pri, heading, pos_xy, dt):
    """One Ackermann propagation step.

    Inputs mirror the reference: `vel_wheel` = rear wheel angular rate
    (rad/s), `steer_rel` = incremental steering encoder angle, `encoder_pri`
    = accumulated previous steering angle, `heading` = current yaw. Returns
    (new_xy, vel_xy, new_heading, omega_B, new_encoder_pri)."""
    a = jnp.arctan2(L, L1 / 2.0)
    delta_r = encoder_pri + steer_rel
    omega_k = vel_wheel

    a_r = delta_r + a
    S = jnp.sqrt(L1 * L1 + L4 * L4 - 2 * L1 * L4 * jnp.cos(a_r))
    b = jnp.arccos(
        jnp.clip((L1 * L1 + S * S - L4 * L4) / (2.0 * L1 * S), -1.0, 1.0)
    )
    c = jnp.arccos(
        jnp.clip((L2 * L2 + S * S - L3 * L3) / (2.0 * L2 * S), -1.0, 1.0)
    )
    a_l = b + c
    delta_l = a - a_l
    delta_f = _acot(
        _cot(delta_r)
        - (
            ((L_REAR / 2.0) - L_AX)
            / ((L_REAR - 2.0 * L_AX) / (_cot(delta_r) - _cot(delta_l)))
        )
    )
    sgn = jnp.sign(delta_r)
    R_m = sgn * L * _cot(delta_f)

    ratio = (R_m - sgn * (L_REAR / 2.0)) / (R_m + sgn * (L_REAR / 2.0))
    omega_l = (2.0 * omega_k * ratio) / (1.0 + ratio)
    omega_B = omega_l * R_WHEEL / ((R_m - sgn * (L_REAR / 2.0)) * sgn)
    V_r = R_m * sgn * omega_B

    # straight-line limit (delta_r == 0, myESKF.cpp:712-719)
    straight = jnp.abs(delta_r) < 1e-9
    V_r = jnp.where(straight, omega_k * R_WHEEL, V_r)
    omega_B = jnp.where(straight, 0.0, omega_B)

    vel_xy = jnp.stack([V_r * jnp.cos(heading), V_r * jnp.sin(heading)])
    new_xy = pos_xy + vel_xy * dt
    new_heading = heading + omega_B * dt
    return new_xy, vel_xy, new_heading, omega_B, delta_r


def counts_to_inputs(vel_count, steer_count, dt):
    """Encoder counts -> (wheel rad/s, steering angle) (myESKF.cpp:563-564)."""
    vel = (vel_count / REAR_WHEEL_COUNT) * 2.0 * jnp.pi / dt
    steer = (steer_count / HEADING_ANGLE_COUNT) * 2.0 * jnp.pi
    return vel, steer


def measurement_and_covariance(
    vel_count, steer_count, encoder_pri, heading, vel_prev_xy, dt,
    enc_var=(0.5, 0.5), heading_var=0.0
):
    """Ackermann measurement [vx, vy, q(wxyz)] and its covariance R (6,6).

    ≙ MeaCov2C (MeaCov2C.cpp): first-order propagation of the encoder noise
    V2 = diag(0.5, 0.5) (myESKF.cpp:565-566) and the current heading variance
    through the kinematics into measurement space, computed here via
    jacfwd."""
    def h(u):
        vc, sc, th = u
        vel, steer = counts_to_inputs(vc, sc, dt)
        _, vel_xy, new_heading, _, _ = ackermann_kinematics(
            vel, steer, encoder_pri, th, jnp.zeros(2), dt
        )
        q = jnp.stack(
            [
                jnp.cos(new_heading / 2.0),
                jnp.zeros_like(new_heading),
                jnp.zeros_like(new_heading),
                jnp.sin(new_heading / 2.0),
            ]
        )
        return jnp.concatenate([vel_xy, q])

    u0 = jnp.stack([vel_count, steer_count, heading])
    z = h(u0)
    J = jax.jacfwd(h)(u0)  # (6, 3)
    var_u = jnp.diag(jnp.asarray([enc_var[0], enc_var[1], heading_var]))
    R = J @ var_u @ J.T
    # Keep the reference's diagonal-only use (myESKF.cpp:594-600)
    R = jnp.diag(jnp.diag(R)) + 1e-12 * jnp.eye(6)
    return z, R

"""18-state error-state Kalman filter: IMU / LiDAR / Ackermann fusion.

TPU-native rewrite of the reference's standalone ESKF study (`myESKF.{h,cpp}`
≈2.1 kLoC + boost-ublas matrix exponentials): the whole 50 s / 5000-tick run
is one `lax.scan` over IMU samples with `cond`-gated LiDAR (10 Hz) and
Ackermann (100 Hz) updates — batched 18x18 covariance algebra on device.

State (Solà-convention ESKF, matching myESKF.h:61-73):
  nominal: p, v, q (wxyz), acc_bias, gyro_bias, gravity   (19 params)
  error:   [dp, dv, dtheta, dab, dgb, dg]                 (18,)

Key maps to the reference:
  NominalStatePropagation      myESKF.cpp:244-329   -> _propagate_nominal
  ErrorStateTransitionMatrix   myESKF.cpp:332-384   -> _error_transition
  LidarFusionProcess           myESKF.cpp:498-556   -> _lidar_update
  AckermanFusionProcess        myESKF.cpp:558-636   -> _ackermann_update
  Injection + Reset(G)         myESKF.cpp:469-496   -> _inject_and_reset
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ackermann import (
    ackermann_kinematics,
    counts_to_inputs,
    measurement_and_covariance,
)
from .math import se3


class EskfParams(NamedTuple):
    dt_imu: float = 0.01
    lidar_every: int = 10  # lidar tick period in IMU ticks
    acc_std: float = 0.01
    gyro_std: float = 0.0015
    acc_bias_std: float = 0.0005
    gyro_bias_std: float = 0.0005
    trans_std: float = 0.01
    rot_std: float = 1.0
    p0: float = 0.001  # initial covariance diag (myESKF.cpp:78)


class Nominal(NamedTuple):
    p: jax.Array
    v: jax.Array
    q: jax.Array  # (4,) wxyz
    ab: jax.Array
    gb: jax.Array
    g: jax.Array


class EskfState(NamedTuple):
    x: Nominal
    P: jax.Array  # (18, 18)
    heading: jax.Array  # Ackermann heading estimate
    encoder_pri: jax.Array
    ack_v: jax.Array  # (3,) previous Ackermann velocity state


def init_state(p0, v0, rpy0, g=9.81, params: EskfParams = EskfParams()):
    q0 = se3.matrix_to_quat(
        se3.euler_zyx_to_matrix(rpy0[0], rpy0[1], rpy0[2])
    )
    x = Nominal(
        p=jnp.asarray(p0, jnp.float32),
        v=jnp.asarray(v0, jnp.float32),
        q=q0.astype(jnp.float32),
        ab=jnp.zeros(3),
        gb=jnp.zeros(3),
        g=jnp.array([0.0, 0.0, -g]),
    )
    return EskfState(
        x=x,
        P=jnp.eye(18) * params.p0,
        heading=jnp.asarray(rpy0[2], jnp.float32),
        encoder_pri=jnp.float32(0.0),
        ack_v=jnp.asarray(v0, jnp.float32),
    )


def _propagate_nominal(x: Nominal, acc, omega, dt):
    R = se3.quat_to_matrix(x.q)
    a_world = R @ (acc - x.ab) + x.g
    p = x.p + x.v * dt + 0.5 * a_world * dt * dt
    v = x.v + a_world * dt
    w = (omega - x.gb) * dt
    wn = jnp.linalg.norm(w)
    dq = jnp.concatenate(
        [
            jnp.cos(wn * 0.5)[None],
            w / jnp.maximum(wn, 1e-12) * jnp.sin(wn * 0.5),
        ]
    )
    dq = jnp.where(wn > 0, dq, jnp.array([1.0, 0.0, 0.0, 0.0]))
    q = se3.quat_mul(x.q, dq)
    q = q / jnp.linalg.norm(q)
    return Nominal(p=p, v=v, q=q, ab=x.ab, gb=x.gb, g=x.g)


def _error_transition(x: Nominal, acc, omega, dt, params: EskfParams):
    """Fx (18,18) and the additive process noise Fi Qi Fi^T (18,18)."""
    R = se3.quat_to_matrix(x.q)
    I3 = jnp.eye(3)
    Fx = jnp.eye(18)
    Fx = Fx.at[0:3, 3:6].set(I3 * dt)
    Fx = Fx.at[3:6, 15:18].set(I3 * dt)
    Fx = Fx.at[6:9, 12:15].set(-I3 * dt)
    Fx = Fx.at[3:6, 9:12].set(-R * dt)
    Fx = Fx.at[3:6, 6:9].set(-R @ se3.hat(acc - x.ab) * dt)
    Fx = Fx.at[6:9, 6:9].set(se3.exp_so3(-(omega - x.gb) * dt))

    q = jnp.zeros(18)
    q = q.at[3:6].set(params.acc_std ** 2 * dt * dt)
    q = q.at[6:9].set(params.gyro_std ** 2 * dt * dt)
    q = q.at[9:12].set(params.acc_bias_std ** 2 * dt)
    q = q.at[12:15].set(params.gyro_bias_std ** 2 * dt)
    return Fx, jnp.diag(q)


def _q_delta_theta(q):
    """dq/dtheta quaternion chart Jacobian (4,3) (myESKF.cpp:414-419)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return 0.5 * jnp.array(
        [[-x, -y, -z], [w, -z, y], [z, w, -x], [-y, x, w]]
    )


def _x_delta_x(q):
    """(19, 18) true-state/error-state chart Jacobian."""
    X = jnp.zeros((19, 18))
    X = X.at[0:6, 0:6].set(jnp.eye(6))
    X = X.at[6:10, 6:9].set(_q_delta_theta(q))
    X = X.at[10:19, 9:18].set(jnp.eye(9))
    return X


def _inject_and_reset(x: Nominal, P, dx):
    """Inject the error estimate and reset covariance (myESKF.cpp:469-496)."""
    dth = dx[6:9]
    wn = jnp.linalg.norm(dth)
    dq = jnp.concatenate(
        [jnp.cos(wn * 0.5)[None], dth / jnp.maximum(wn, 1e-12) * jnp.sin(wn * 0.5)]
    )
    dq = jnp.where(wn > 0, dq, jnp.array([1.0, 0.0, 0.0, 0.0]))
    x = Nominal(
        p=x.p + dx[0:3],
        v=x.v + dx[3:6],
        q=se3.quat_mul(x.q, dq),
        ab=x.ab + dx[9:12],
        gb=x.gb + dx[12:15],
        g=x.g + dx[15:18],
    )
    G = jnp.eye(18)
    G = G.at[6:9, 6:9].set(se3.exp_so3(0.5 * dth))
    P = G @ P @ G.T
    return x, P


def _kalman_update(x, P, H, V, err):
    S = H @ P @ H.T + V
    K = P @ H.T @ jnp.linalg.inv(S)
    dx = K @ err
    P = (jnp.eye(18) - K @ H) @ P
    return _inject_and_reset(x, P, dx)


def _lidar_update(x, P, z_pos, z_rpy, qua_noise, params: EskfParams):
    """7-dim (pos + quaternion) lidar update (myESKF.cpp:498-556)."""
    Hx = jnp.zeros((7, 19))
    Hx = Hx.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
    Hx = Hx.at[3, 6].set(1.0).at[4, 7].set(1.0).at[5, 8].set(1.0).at[6, 9].set(1.0)
    H = Hx @ _x_delta_x(x.q)

    V = jnp.zeros((7, 7))
    V = V.at[0:3, 0:3].set(jnp.eye(3) * params.trans_std ** 2)
    V = V.at[3:7, 3:7].set(jnp.diag((params.rot_std * qua_noise) ** 2))

    q_meas = se3.matrix_to_quat(
        se3.euler_zyx_to_matrix(z_rpy[0], z_rpy[1], z_rpy[2])
    )
    # hemisphere alignment (myESKF.cpp:516-521)
    q_meas = jnp.where(jnp.dot(q_meas, x.q) < 0, -q_meas, q_meas)
    err = jnp.concatenate([z_pos - x.p, q_meas - x.q])
    return _kalman_update(x, P, H, V, err)


def _ackermann_update(x, P, heading, encoder_pri, vel_count, steer_count,
                      params: EskfParams):
    """6-dim (vx, vy, quaternion) wheel/steer update (myESKF.cpp:558-636)."""
    dt = params.dt_imu
    z, Rm = measurement_and_covariance(
        vel_count, steer_count, encoder_pri, heading, x.v, dt
    )
    vel, steer = counts_to_inputs(vel_count, steer_count, dt)
    _, _, new_heading, _, new_encoder_pri = ackermann_kinematics(
        vel, steer, encoder_pri, heading, jnp.zeros(2), dt
    )

    Hx = jnp.zeros((6, 19))
    Hx = Hx.at[0, 3].set(1.0).at[1, 4].set(1.0)
    Hx = Hx.at[2, 6].set(1.0).at[3, 7].set(1.0).at[4, 8].set(1.0).at[5, 9].set(1.0)
    H = Hx @ _x_delta_x(x.q)

    q_meas = z[2:6]
    q_meas = jnp.where(jnp.dot(q_meas, x.q) < 0, -q_meas, q_meas)
    err = jnp.concatenate([z[0:2] - x.v[0:2], q_meas - x.q])
    x, P = _kalman_update(x, P, H, Rm, err)

    # post-update bookkeeping (myESKF.cpp:627-634): heading tracks the fused
    # attitude, steering accumulator advances
    R = se3.quat_to_matrix(x.q)
    _, _, yaw = se3.matrix_to_euler_zyx(R)
    return x, P, yaw, new_encoder_pri


def run_eskf(
    acc_mea,  # (T, 3)
    omega_mea,  # (T, 3)
    lidar_pos,  # (Tl, 3) at 1/lidar_every rate
    lidar_rpy,  # (Tl, 3)
    vel_count,  # (T,)
    steer_count,  # (T,)
    state0: EskfState,
    qua_noise=jnp.ones(4) * 0.01,
    params: EskfParams = EskfParams(),
):
    """Full fused run; returns per-tick (pos, vel, rpy, ab, gb) histories.

    ≙ runESKF's main loop (myESKF.cpp:926-980): propagate at 100 Hz, lidar
    update when the tick lands on the 10 Hz grid, Ackermann update at every
    tick."""
    T = acc_mea.shape[0]
    le = params.lidar_every

    def step(carry, inp):
        s: EskfState = carry
        i, acc, omega, vc, sc = inp
        x = _propagate_nominal(s.x, acc, omega, params.dt_imu)
        Fx, Q = _error_transition(s.x, acc, omega, params.dt_imu, params)
        P = Fx @ s.P @ Fx.T + Q

        lidar_idx = (i + 1) // le
        do_lidar = ((i + 1) % le == 0) & (lidar_idx < lidar_pos.shape[0])

        def with_lidar(args):
            x, P = args
            return _lidar_update(
                x, P,
                lidar_pos[jnp.clip(lidar_idx, 0, lidar_pos.shape[0] - 1)],
                lidar_rpy[jnp.clip(lidar_idx, 0, lidar_pos.shape[0] - 1)],
                qua_noise, params,
            )

        x, P = jax.lax.cond(do_lidar, with_lidar, lambda a: a, (x, P))

        x, P, heading, encoder_pri = _ackermann_update(
            x, P, s.heading, s.encoder_pri, vc, sc, params
        )

        s = EskfState(x=x, P=P, heading=heading, encoder_pri=encoder_pri,
                      ack_v=x.v)
        R = se3.quat_to_matrix(x.q)
        rpy = jnp.stack(se3.matrix_to_euler_zyx(R))
        out = (x.p, x.v, rpy, x.ab, x.gb)
        return s, out

    idx = jnp.arange(T)
    s, (pos, vel, rpy, ab, gb) = jax.lax.scan(
        step, state0, (idx, acc_mea, omega_mea, vel_count, steer_count)
    )
    return s, {"pos": pos, "vel": vel, "rpy": rpy, "acc_bias": ab, "gyro_bias": gb}

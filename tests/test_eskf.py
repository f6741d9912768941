"""ESKF tests: propagation sanity, Ackermann kinematics, full fixture run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu import eskf as E
from lego_loam_tpu.io import eskf_data


def test_propagation_static_gravity():
    """Stationary IMU measuring +g up should keep the state still."""
    p = E.EskfParams()
    s = E.init_state(np.zeros(3), np.zeros(3), np.zeros(3))
    acc = jnp.array([0.0, 0.0, 9.81])
    for _ in range(10):
        x = E._propagate_nominal(s.x, acc, jnp.zeros(3), p.dt_imu)
        s = s._replace(x=x)
    np.testing.assert_allclose(np.asarray(s.x.p), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.x.v), 0.0, atol=1e-6)


def test_propagation_constant_acceleration():
    p = E.EskfParams()
    s = E.init_state(np.zeros(3), np.zeros(3), np.zeros(3))
    acc = jnp.array([1.0, 0.0, 9.81])
    n = 100
    x = s.x
    for _ in range(n):
        x = E._propagate_nominal(x, acc, jnp.zeros(3), p.dt_imu)
    t = n * p.dt_imu
    np.testing.assert_allclose(np.asarray(x.v), [t, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(x.p), [0.5 * t * t, 0, 0], atol=1e-3)


def test_ackermann_straight_line():
    from lego_loam_tpu.ackermann import ackermann_kinematics

    new_xy, vel_xy, heading, omega_B, enc = ackermann_kinematics(
        jnp.float32(10.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.zeros(2), 0.01
    )
    # wheel rate 10 rad/s * 0.1 m radius = 1 m/s forward
    np.testing.assert_allclose(np.asarray(vel_xy), [1.0, 0.0], atol=1e-6)
    assert float(omega_B) == 0.0


def test_ackermann_turn_direction():
    from lego_loam_tpu.ackermann import ackermann_kinematics

    _, _, _, omega_pos, _ = ackermann_kinematics(
        jnp.float32(10.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.float32(0.0), jnp.zeros(2), 0.01
    )
    _, _, _, omega_neg, _ = ackermann_kinematics(
        jnp.float32(10.0), jnp.float32(-0.1), jnp.float32(0.0),
        jnp.float32(0.0), jnp.zeros(2), 0.01
    )
    assert float(omega_pos) * float(omega_neg) < 0  # opposite turn directions


@pytest.mark.skipif(
    not eskf_data.available(), reason="reference ESKF fixtures not mounted"
)
def test_eskf_fixture_run_tracks_ground_truth():
    d = eskf_data.load()
    T = 4999  # match the reference loop length (end_time/dt - 1)
    qn = eskf_data.quaternion_noise_scale(d["lidar_rpy_gt"], d["lidar_rpy"])

    s0 = E.init_state(d["gt_pos"][0], d["gt_vel"][0], d["gt_att"][0])
    params = E.EskfParams()
    run = jax.jit(
        lambda: E.run_eskf(
            jnp.asarray(d["acc_mea"][:T], jnp.float32),
            jnp.asarray(d["omega_mea"][:T], jnp.float32),
            jnp.asarray(d["lidar_pos"], jnp.float32),
            jnp.asarray(d["lidar_rpy"], jnp.float32),
            jnp.asarray(d["vel_count"][:T], jnp.float32),
            jnp.asarray(d["steer_count"][:T], jnp.float32),
            s0,
            jnp.asarray(qn, jnp.float32),
            params,
        )
    )
    _, hist = run()
    pos = np.asarray(hist["pos"])
    gt = d["gt_pos"][1 : T + 1]
    rmse = np.sqrt(np.mean(np.sum((pos - gt) ** 2, axis=1)))
    # LiDAR measurement noise is ~1 cm; fused output should stay close to GT.
    assert rmse < 0.1, f"ESKF RMSE vs GT {rmse:.3f} m"

    ref = eskf_data.load_reference_output()
    if ref is not None:
        ref_rmse = np.sqrt(
            np.mean(np.sum((ref[: len(gt)] - gt[: len(ref)]) ** 2, axis=1))
        )
        # Stay in the same accuracy class as the reference implementation.
        assert rmse < max(2.5 * ref_rmse, 0.05), (rmse, ref_rmse)

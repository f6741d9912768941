"""IMU integration/undistortion and wheel-odometry prior tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu import imu as I
from lego_loam_tpu.math import se3


def test_integrate_imu_constant_accel():
    t = np.linspace(0, 0.1, 11)
    rpy = np.zeros((11, 3))
    acc = np.tile([1.0, 0.0, 9.81], (11, 1))  # 1 m/s^2 forward + gravity
    track = I.integrate_imu(jnp.asarray(t), jnp.asarray(rpy), jnp.asarray(acc))
    v = np.asarray(track.velo)
    np.testing.assert_allclose(v[-1], [0.1, 0, 0], atol=1e-5)
    s = np.asarray(track.shift)
    np.testing.assert_allclose(s[-1], [0.5 * 1.0 * 0.01, 0, 0], atol=1e-4)


def test_undistort_pure_rotation():
    """Sensor yaws during the scan; undistortion maps all samples of a fixed
    world point back to the scan-start frame."""
    n = 8
    yaw_rate = np.deg2rad(30)  # rad/s
    t = np.linspace(0, 0.1, 11)
    rpy = np.zeros((11, 3))
    rpy[:, 2] = yaw_rate * t
    acc = np.tile([0.0, 0.0, 9.81], (11, 1))
    track = I.integrate_imu(jnp.asarray(t), jnp.asarray(rpy), jnp.asarray(acc))

    p_world = np.array([5.0, 2.0, 0.3])
    rel = np.linspace(0, 1, n)
    pts = []
    for s in rel:
        yaw = yaw_rate * s * 0.1
        c, sn = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1.0]])
        pts.append(Rz.T @ p_world)  # observation in the rotated sensor frame
    pts = np.stack(pts).astype(np.float32)

    out = I.undistort_to_start(
        jnp.asarray(pts), jnp.asarray(rel, jnp.float32), track, 0.1
    )
    np.testing.assert_allclose(
        np.asarray(out), np.tile(p_world, (n, 1)), atol=2e-3
    )


def test_odom_prior_motion_lever_arm():
    la = (0.08, 0.0, 0.0377)
    yaw = np.deg2rad(10)
    c, s = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t_prev = np.zeros(3)
    t_cur = np.array([0.5, 0.1, 0.0])
    dR, dt = I.odom_prior_motion(
        np.eye(3), np.zeros(3),
        jnp.eye(3), jnp.asarray(t_prev),
        jnp.asarray(Rz), jnp.asarray(t_cur),
        la,
    )
    np.testing.assert_allclose(np.asarray(dR), Rz, atol=1e-6)
    expect = t_cur + Rz @ np.asarray(la) - np.asarray(la)
    np.testing.assert_allclose(np.asarray(dt), expect, atol=1e-6)


@pytest.mark.slow
def test_override_mode_pins_motion():
    """'override' mode must reproduce the reference ablation: solved motion
    replaced by the odometry prior."""
    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.frontend import frontend_step, init_odometry_state
    from lego_loam_tpu.io.synthetic import render_scan

    cfg = vlp16()
    cfg = dataclasses.replace(
        cfg,
        odometry=dataclasses.replace(cfg.odometry, odom_prior_mode="override"),
        pipeline=dataclasses.replace(cfg.pipeline, rigid_scans=True),
    )
    state = init_odometry_state(cfg)
    key = jax.random.PRNGKey(0)

    prior = (jnp.eye(3), jnp.asarray([0.33, 0.0, 0.0]))

    def prep(pts):
        n = cfg.laser.max_points
        mask = np.isfinite(pts).all(axis=1)
        buf = np.zeros((n, 3), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(pts), n)
        buf[:k] = np.nan_to_num(pts[:k])
        m[:k] = mask[:k]
        return jnp.asarray(buf), jnp.asarray(m)

    for i in range(2):
        pts = render_scan(np.eye(3), np.array([0.1 * i, 0, 0]), cfg)
        state, out = frontend_step(*prep(pts), state, cfg, key, odom_prior=prior)
    np.testing.assert_allclose(np.asarray(out["M_t"]), [0.33, 0, 0], atol=1e-6)


def test_upstream_feature_variant_caps():
    """Upstream picking respects the 2/20/4 per-sector caps."""
    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.frontend import stage1
    from lego_loam_tpu.io.synthetic import render_scan
    from lego_loam_tpu.ops.features import extract_features

    cfg = vlp16()
    cfg = dataclasses.replace(
        cfg,
        features=dataclasses.replace(
            cfg.features, use_ours=False, use_shadow_points=False
        ),
    )
    pts = render_scan(np.eye(3), np.zeros(3), cfg)
    n = cfg.laser.max_points
    mask = np.isfinite(pts).all(axis=1)
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    k = min(len(pts), n)
    buf[:k] = np.nan_to_num(pts[:k])
    m[:k] = mask[:k]
    grid, seg = stage1(jnp.asarray(buf), jnp.asarray(m), cfg)
    feats = extract_features(seg, cfg)

    H = cfg.laser.num_vertical_scans
    n_sharp = int(feats.corner_sharp.count)
    n_less = int(feats.corner_less_sharp.count)
    n_flat = int(feats.surf_flat.count)
    assert 0 < n_sharp <= H * cfg.features.num_sectors * cfg.features.max_sharp_per_sector
    assert n_sharp <= n_less <= H * cfg.features.num_sectors * cfg.features.max_less_sharp_per_sector
    assert 0 < n_flat <= H * cfg.features.num_sectors * cfg.features.max_flat_per_sector

"""Stage-2 + odometry tests on synthetic scenes with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.frontend import init_odometry_state, make_frontend, stage1
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.features import extract_features

pytestmark = pytest.mark.slow  # multi-minute e2e drive


def prep(cfg, pts):
    mask = np.isfinite(pts).all(axis=1)
    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    k = min(len(pts), n)
    buf[:k] = np.nan_to_num(pts[:k])
    m[:k] = mask[:k]
    return jnp.asarray(buf), jnp.asarray(m)


@pytest.fixture(scope="module")
def cfg():
    import dataclasses

    c = vlp16()
    # rigid renders -> disable the production rel_time warp
    return dataclasses.replace(
        c, pipeline=dataclasses.replace(c.pipeline, rigid_scans=True)
    )


@pytest.fixture(scope="module")
def feats(cfg, simple_scan):
    grid, seg = stage1(*prep(cfg, simple_scan), cfg)
    return extract_features(seg, cfg)


def test_feature_counts_reasonable(feats):
    n_sharp = int(feats.corner_sharp.count)
    n_less = int(feats.corner_less_sharp.count)
    n_flat = int(feats.surf_flat.count)
    n_lf = int(feats.surf_less_flat.count)
    assert 10 <= n_sharp <= n_less, (n_sharp, n_less)
    assert n_less >= 20
    assert n_flat >= 100  # unlimited flats in "ours" variant + shadow grid
    assert n_lf >= 500


def test_corners_are_on_edges(feats, cfg, simple_scan):
    """Sharp corners should lie near pillars/box edges (high curvature)."""
    xyz = np.asarray(feats.corner_sharp.xyz)[np.asarray(feats.corner_sharp.mask)]
    # Corners must not be on the floor
    assert (xyz[:, 2] > -0.5).mean() > 0.9


def test_flat_points_on_ground(feats):
    m = np.asarray(feats.surf_flat.mask)
    ring = np.asarray(feats.surf_flat.ring)
    xyz = np.asarray(feats.surf_flat.xyz)
    real = m & (ring <= 16)
    # Real (non-shadow) flat points lie near the floor plane z = -0.6
    assert np.abs(xyz[real, 2] + 0.6).mean() < 0.15


def test_shadow_points_present(feats, cfg):
    m = np.asarray(feats.surf_flat.mask)
    ring = np.asarray(feats.surf_flat.ring)
    nsp = cfg.features.shadow_rows * cfg.features.shadow_cols
    assert (m & (ring == cfg.laser.num_vertical_scans + 1)).sum() == nsp


def test_odometry_recovers_translation(cfg):
    step = make_frontend(cfg)
    state = init_odometry_state(cfg)
    key = jax.random.PRNGKey(0)

    dx = 0.12
    poses = [(np.eye(3), np.array([i * dx, 0.0, 0.0])) for i in range(3)]
    Ms = []
    for i, (R, t) in enumerate(poses):
        pts = render_scan(R, t, cfg)
        state, out = step(*prep(cfg, pts), state, key)
        Ms.append((np.asarray(out["M_R"]), np.asarray(out["M_t"])))

    # Frames 2, 3: motion should be ~(dx, 0, 0) in the sensor frame.
    # (Odometry-only error in this corner-sparse synthetic scene is a few
    # cm; the mapping stage corrects it to mm — see test_backend.)
    for R, t in Ms[1:]:
        np.testing.assert_allclose(t, [dx, 0, 0], atol=0.05)
        np.testing.assert_allclose(R, np.eye(3), atol=0.01)


def test_odometry_recovers_rotation(cfg):
    step = make_frontend(cfg)
    state = init_odometry_state(cfg)
    key = jax.random.PRNGKey(0)

    dyaw = np.deg2rad(1.5)

    def pose(i):
        c, s = np.cos(dyaw * i), np.sin(dyaw * i)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]), np.zeros(3)

    outs = []
    for i in range(3):
        R, t = pose(i)
        pts = render_scan(R, t, cfg)
        state, out = step(*prep(cfg, pts), state, key)
        outs.append(out)

    from lego_loam_tpu.math import se3

    for out in outs[1:]:
        w = np.asarray(se3.log_so3(out["M_R"]))
        np.testing.assert_allclose(w[2], dyaw, atol=np.deg2rad(0.3))
        np.testing.assert_allclose(np.asarray(out["M_t"]), 0, atol=0.08)


def test_trajectory_ate(cfg):
    """Short drive: accumulated odometry within a loose ATE bound."""
    step = make_frontend(cfg)
    state = init_odometry_state(cfg)
    key = jax.random.PRNGKey(0)

    n = 10
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    est = []
    for R, t in poses:
        pts = render_scan(R, t, cfg, noise=0.005, seed=17)
        state, out = step(*prep(cfg, pts), state, key)
        est.append(np.asarray(out["t_world"]))

    gt = np.stack([t for _, t in poses])
    est = np.stack(est)
    # Align first frames (both start at origin); compare raw positions.
    ate = np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1)))
    # Loose odometry-only drift bound (no mapping correction). 0.105 m after
    # the oracle-exact segmentation landed (was ~0.1 with the round-1
    # unconverged labeling); the mapped ATE on the same drive is ~4 mm.
    assert ate < 0.15, f"ATE {ate:.3f} m"

"""Anchor-segment reduced pose-graph solve (posegraph.reduced_solve) and the
distributed Schur-reduction solver (distributed.schur_pose_graph_solver).

These are the production loop-closure correction paths (≙ gtsam iSAM2
update + correctPoses, mapOptmization.cpp:1612-1785): the whole-graph PCG
relinearization needs O(chain length) CG iterations to propagate a loop
correction end-to-end, so the flagship path reduces segments to anchors and
solves the small reduced graph exactly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.posegraph import Factors, reduced_solve


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _drifted_circle(n_kf, yaw_bias_deg=0.2, radius=8.0):
    """True circle poses, odometry rels from truth, estimate integrated with
    a yaw bias (linear drift)."""
    theta = np.linspace(0, 2 * np.pi, n_kf)
    t_true = np.stack(
        [np.cos(theta) * radius - radius, np.sin(theta) * radius, 0 * theta], 1
    ).astype(np.float32)
    R_true = np.stack([_rz(a + np.pi / 2) for a in theta])
    relR = np.tile(np.eye(3, dtype=np.float32), (n_kf, 1, 1))
    relt = np.zeros((n_kf, 3), np.float32)
    for i in range(1, n_kf):
        relR[i] = R_true[i - 1].T @ R_true[i]
        relt[i] = R_true[i - 1].T @ (t_true[i] - t_true[i - 1])
    bias = _rz(np.deg2rad(yaw_bias_deg))
    R_est = np.zeros_like(R_true)
    t_est = np.zeros_like(t_true)
    R_est[0], t_est[0] = R_true[0], t_true[0]
    for i in range(1, n_kf):
        R_est[i] = R_est[i - 1] @ relR[i] @ bias
        t_est[i] = R_est[i - 1] @ relt[i] + t_est[i - 1]
    return R_true, t_true, relR, relt, R_est, t_est


def _loop_buf(cap, entries):
    li = np.zeros(cap, np.int32)
    lj = np.zeros(cap, np.int32)
    lR = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
    lt = np.zeros((cap, 3), np.float32)
    info = np.ones((cap, 6), np.float32)
    mask = np.zeros(cap, bool)
    for k, (i, j, R, t) in enumerate(entries):
        li[k], lj[k], lR[k], lt[k] = i, j, R, t
        info[k] = 1e4
        mask[k] = True
    return Factors(
        i=jnp.asarray(li), j=jnp.asarray(lj), R=jnp.asarray(lR),
        t=jnp.asarray(lt), info=jnp.asarray(info), mask=jnp.asarray(mask),
    )


def _cfg(K, stride):
    cfg = vlp16()
    return dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping, max_keyframes=K, posegraph_anchor_stride=stride
        ),
    )


def test_reduced_solve_corrects_drift():
    cfg = _cfg(64, 8)
    K, n_kf = 64, 50
    R_true, t_true, relR, relt, R_est, t_est = _drifted_circle(n_kf)
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    kf_t = np.zeros((K, 3), np.float32)
    kf_R[:n_kf], kf_t[:n_kf] = R_est, t_est
    rel_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    rel_t = np.zeros((K, 3), np.float32)
    rel_R[:n_kf], rel_t[:n_kf] = relR, relt
    loop = _loop_buf(
        cfg.mapping.max_loop_factors,
        [(0, n_kf - 1,
          R_true[0].T @ R_true[n_kf - 1],
          R_true[0].T @ (t_true[n_kf - 1] - t_true[0]))],
    )
    outR, outt, (ok, c0, c1, moved) = jax.jit(
        lambda *a: reduced_solve(*a, cfg)
    )(kf_R, kf_t, rel_R, rel_t, jnp.int32(n_kf), loop)
    drift0 = np.linalg.norm(t_est - t_true, axis=1).max()
    drift1 = np.linalg.norm(np.asarray(outt)[:n_kf] - t_true, axis=1).max()
    assert bool(ok)
    assert float(c1) < float(c0)
    assert drift1 < 0.3 * drift0, (drift0, drift1)
    # rotations stay orthonormal
    RtR = np.einsum("nab,nac->nbc", np.asarray(outR), np.asarray(outR))
    assert np.abs(RtR - np.eye(3)).max() < 1e-4


def test_reduced_solve_consistent_chain_is_noop():
    """Chain-only graph whose poses exactly satisfy the rels: the cost gate
    must reject (no spurious motion)."""
    cfg = _cfg(32, 8)
    K, n_kf = 32, 20
    R_true, t_true, relR, relt, _, _ = _drifted_circle(n_kf, yaw_bias_deg=0.0)
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    kf_t = np.zeros((K, 3), np.float32)
    kf_R[:n_kf], kf_t[:n_kf] = R_true, t_true
    rel_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    rel_t = np.zeros((K, 3), np.float32)
    rel_R[:n_kf], rel_t[:n_kf] = relR, relt
    loop = _loop_buf(cfg.mapping.max_loop_factors, [])
    outR, outt, (ok, c0, c1, _m) = jax.jit(
        lambda *a: reduced_solve(*a, cfg)
    )(kf_R, kf_t, rel_R, rel_t, jnp.int32(n_kf), loop)
    np.testing.assert_allclose(np.asarray(outt)[:n_kf], t_true, atol=1e-3)


def test_reduced_solve_ring_wrapped():
    """n_kf > capacity: the logical window spans the ring seam; the solve
    must still reduce drift on the RESIDENT keyframes and leave retired
    slots' layout valid (finite, orthonormal)."""
    cfg = _cfg(32, 8)
    K = 32
    n_total = 40  # 8 keyframes retired
    R_true, t_true, relR, relt, R_est, t_est = _drifted_circle(
        n_total, yaw_bias_deg=0.4
    )
    # fill the ring: slot = id % K
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    kf_t = np.zeros((K, 3), np.float32)
    rel_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    rel_t = np.zeros((K, 3), np.float32)
    for i in range(n_total):
        kf_R[i % K], kf_t[i % K] = R_est[i], t_est[i]
        rel_R[i % K], rel_t[i % K] = relR[i], relt[i]
    base = n_total - K
    loop = _loop_buf(
        cfg.mapping.max_loop_factors,
        [(base + 2, n_total - 1,
          R_true[base + 2].T @ R_true[n_total - 1],
          R_true[base + 2].T @ (t_true[n_total - 1] - t_true[base + 2]))],
    )
    outR, outt, (ok, c0, c1, moved) = jax.jit(
        lambda *a: reduced_solve(*a, cfg)
    )(kf_R, kf_t, rel_R, rel_t, jnp.int32(n_total), loop)
    assert bool(ok), (float(c0), float(c1))
    outt = np.asarray(outt)
    assert np.isfinite(outt).all()
    # resident ids base..n_total-1 live at slots id % K
    ids = np.arange(base, n_total)
    err0 = np.linalg.norm(t_est[ids] - t_true[ids], axis=1).max()
    err1 = np.linalg.norm(outt[ids % K] - t_true[ids], axis=1).max()
    assert err1 < err0, (err0, err1)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_schur_solver_matches_reduced():
    """4-device Schur-reduction solve ≈ the single-device reduced solve on
    the same problem (same stride, same loop factors)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lego_loam_tpu.distributed import schur_pose_graph_solver

    cfg = _cfg(64, 8)
    N = 64
    n_kf = 64
    R_true, t_true, relR, relt, R_est, t_est = _drifted_circle(n_kf)
    loop_entries = [
        (1, n_kf - 2,
         R_true[1].T @ R_true[n_kf - 2],
         R_true[1].T @ (t_true[n_kf - 2] - t_true[1]))
    ]
    loop = _loop_buf(cfg.mapping.max_loop_factors, loop_entries)

    refR, reft, (ok, _c0, _c1, _m) = jax.jit(
        lambda *a: reduced_solve(*a, cfg)
    )(R_est, t_est, relR, relt, jnp.int32(n_kf), loop)
    assert bool(ok)

    mesh = Mesh(np.array(jax.devices()[:4]), ("seg",))
    solver = schur_pose_graph_solver(mesh, cfg, N, stride=8, reduced="dense")
    shard = NamedSharding(mesh, P("seg"))
    outR, outt = solver(
        jax.device_put(R_est, shard), jax.device_put(t_est, shard),
        jax.device_put(relR, shard), jax.device_put(relt, shard),
        jnp.int32(n_kf), loop,
    )
    np.testing.assert_allclose(
        np.asarray(outt), np.asarray(reft), atol=2e-2
    )
    # and it genuinely reduced the drift
    d0 = np.linalg.norm(t_est - t_true, axis=1).max()
    d1 = np.linalg.norm(np.asarray(outt) - t_true, axis=1).max()
    assert d1 < 0.3 * d0

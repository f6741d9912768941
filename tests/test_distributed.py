"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.math import se3


def _loop_problem(N=64, F=None, seed=0):
    rs = np.random.RandomState(seed)
    yaw = np.linspace(0, 2 * np.pi, N).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.zeros((N, 3, 3), np.float32)
    R[:, 0, 0] = c
    R[:, 0, 1] = -s
    R[:, 1, 0] = s
    R[:, 1, 1] = c
    R[:, 2, 2] = 1
    t = np.stack([np.sin(yaw) * 5, 5 - np.cos(yaw) * 5, 0 * yaw], axis=1).astype(np.float32)

    fi = np.arange(N - 1, dtype=np.int32)
    fj = fi + 1
    Rm = np.einsum("fab,fbc->fac", R[fi].transpose(0, 2, 1), R[fj])
    tm = np.einsum("fab,fb->fa", R[fi].transpose(0, 2, 1), t[fj] - t[fi])
    # pad factors to F (divisible by 8)
    F = F or ((N - 1 + 7) // 8) * 8
    pad = F - (N - 1)
    from lego_loam_tpu.posegraph import Factors

    factors = Factors(
        i=jnp.asarray(np.concatenate([fi, np.zeros(pad, np.int32)])),
        j=jnp.asarray(np.concatenate([fj, np.zeros(pad, np.int32)])),
        R=jnp.asarray(np.concatenate([Rm, np.tile(np.eye(3, dtype=np.float32)[None], (pad, 1, 1))])),
        t=jnp.asarray(np.concatenate([tm, np.zeros((pad, 3), np.float32)])),
        info=jnp.asarray(
            np.concatenate([np.full((N - 1, 6), 1e4, np.float32), np.zeros((pad, 6), np.float32)])
        ),
        mask=jnp.asarray(np.concatenate([np.ones(N - 1, bool), np.zeros(pad, bool)])),
    )
    # perturbed initial poses
    Rn = np.einsum(
        "nab,nbc->nac",
        np.asarray(se3.exp_so3(jnp.asarray(rs.randn(N, 3) * 0.02))),
        R,
    ).astype(np.float32)
    tn = (t + rs.randn(N, 3) * 0.05).astype(np.float32)
    tn[0] = t[0]
    Rn[0] = R[0]
    return (R, t), (Rn, tn), factors


def test_sharded_pose_graph_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = vlp16()
    from lego_loam_tpu.distributed import make_mesh, sharded_pose_graph_solver
    from lego_loam_tpu.posegraph import solve_pose_graph

    (Rgt, tgt), (R0, t0), factors = _loop_problem()
    N = Rgt.shape[0]
    active = jnp.ones((N,), bool)

    ref_R, ref_t = solve_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), factors, active, cfg, gn_iters=3
    )

    mesh = make_mesh(8)
    solver = sharded_pose_graph_solver(mesh, cfg, gn_iters=3)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P(("graph", "map")))
    rep = NamedSharding(mesh, P())
    f_sh = jax.tree.map(lambda x: jax.device_put(x, spec), factors)
    out_R, out_t = solver(
        jax.device_put(jnp.asarray(R0), rep),
        jax.device_put(jnp.asarray(t0), rep),
        f_sh,
        jax.device_put(active, rep),
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_R), np.asarray(ref_R), atol=1e-4)


def test_sharded_map_gn_step_runs():
    cfg = vlp16()
    from lego_loam_tpu.distributed import make_mesh, sharded_map_gn_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    step = sharded_map_gn_step(mesh, cfg)

    rs = np.random.RandomState(3)
    # plane z=0 target, query slightly offset in z
    T = 1024  # divisible by 8
    tgt = np.concatenate(
        [rs.uniform(-10, 10, (T, 2)), np.zeros((T, 1))], axis=1
    ).astype(np.float32)
    q = np.concatenate(
        [rs.uniform(-8, 8, (1024, 2)), np.full((1024, 1), 0.05)], axis=1
    ).astype(np.float32)

    spec = NamedSharding(mesh, P(("graph", "map")))
    R, t = step(
        jnp.asarray(q),
        jnp.ones(1024, bool),
        jax.device_put(jnp.asarray(tgt), spec),
        jax.device_put(jnp.ones(T, bool), spec),
        jnp.eye(3),
        jnp.zeros(3),
    )
    t = np.asarray(t)
    # One GN step should move the pose down toward the plane
    assert t[2] < -0.02, t
    assert np.isfinite(t).all()

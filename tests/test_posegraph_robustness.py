"""Pose-graph robustness to a WRONG loop factor.

ADVICE r3: loop factors are weighted 1/(fitness * loop_noise_scale) — a
false-positive closure (ICP converged to a wrong pose with plausible
fitness) must not be able to corrupt the trajectory unboundedly. Two layers
guard this in production (pipeline._optimize_graph): the per-pose trust
region inside solve_pose_graph, and the cost-decrease acceptance gate.
This test exercises both at the solver level with the production noise
model.
"""

import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.posegraph import Factors, graph_cost, solve_pose_graph


def _chain(n, step=0.3, seed=0):
    rs = np.random.RandomState(seed)
    t = np.cumsum(
        np.tile([step, 0, 0], (n, 1)) + rs.normal(0, 1e-3, (n, 3)), axis=0
    ).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    return R, t


def _factors(R, t, cfg, loops=()):
    n = len(t)
    m = cfg.mapping
    i = list(range(n - 1))
    j = list(range(1, n))
    Rm = [R[a].T @ R[b] for a, b in zip(i, j)]
    tm = [R[a].T @ (t[b] - t[a]) for a, b in zip(i, j)]
    info = [[1.0 / m.chain_rot_var] * 3 + [1.0 / m.chain_trans_var] * 3] * (
        n - 1
    )
    for (a, b, Rl, tl, fit) in loops:
        i.append(a)
        j.append(b)
        Rm.append(Rl)
        tm.append(tl)
        info.append([1.0 / max(fit * m.loop_noise_scale, 1e-6)] * 6)
    return Factors(
        i=jnp.asarray(np.array(i, np.int32)),
        j=jnp.asarray(np.array(j, np.int32)),
        R=jnp.asarray(np.stack(Rm).astype(np.float32)),
        t=jnp.asarray(np.stack(tm).astype(np.float32)),
        info=jnp.asarray(np.array(info, np.float32)),
        mask=jnp.ones((len(i),), bool),
    )


def test_wrong_loop_factor_bounded_and_gated():
    cfg = vlp16()
    R, t = _chain(64)
    # WRONG closure: claims pose 60 sits on top of pose 5 (true gap ~16.5 m)
    # with fitness just under the VLP-16 accept gate.
    fit = cfg.mapping.history_keyframe_fitness_score * 0.9
    wrong = (5, 60, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), fit)
    f = _factors(R, t, cfg, loops=[wrong])
    active = jnp.ones((64,), bool)
    newR, newt = solve_pose_graph(
        jnp.asarray(R), jnp.asarray(t), f, active, cfg
    )
    newt_np = np.asarray(newt)
    assert np.isfinite(newt_np).all()
    # Per-pose trust region: one solve moves no pose more than
    # 2 m/GN-iteration (gn_iters=4) regardless of the factor's weight.
    move = np.linalg.norm(newt_np - t, axis=1)
    assert move.max() <= 4 * 2.0 + 1e-3, move.max()

    # Production acceptance gate: the wrong factor fights the (much
    # stiffer) odometry chain, so the weighted cost cannot drop to near
    # zero — and if the solve INCREASES the cost the pipeline keeps the
    # old poses. Assert the gate's quantities behave.
    c0 = float(graph_cost(jnp.asarray(R), jnp.asarray(t), f))
    c1 = float(graph_cost(newR, newt, f))
    assert np.isfinite(c1)
    if c1 < c0:
        # accepted: corruption must still be bounded by the trust region
        assert move.max() <= 8.0 + 1e-3


def test_true_loop_factor_corrects_drift():
    cfg = vlp16()
    R, t_true = _chain(64)
    # Drifted estimate: linear 2 m drift accumulated along the chain.
    drift = np.linspace(0, 1, 64)[:, None] * np.array([0.0, 2.0, 0.0])
    t_est = (t_true + drift).astype(np.float32)
    # TRUE closure between 0 and 63 measured from the true poses.
    Rl = R[0].T @ R[63]
    tl = R[0].T @ (t_true[63] - t_true[0])
    f = _factors(
        R, t_est, cfg, loops=[(0, 63, Rl, tl.astype(np.float32), 0.1)]
    )
    newR, newt = solve_pose_graph(
        jnp.asarray(R), jnp.asarray(t_est), f, jnp.ones((64,), bool), cfg
    )
    end_err_before = np.linalg.norm(t_est[63] - t_true[63])
    end_err_after = np.linalg.norm(np.asarray(newt)[63] - t_true[63])
    assert end_err_after < 0.5 * end_err_before, (
        end_err_before, end_err_after
    )

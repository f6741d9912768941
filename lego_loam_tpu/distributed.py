"""Multi-chip sharding: distributed pose-graph solve + sharded map matching.

The reference is single-process/single-machine (SURVEY.md §2.2); this module
is the new capability mandated by the north star: keyframes/factors and map
blocks sharded across a TPU mesh with XLA collectives.

Layout:
- mesh axes ("graph", "map"): pose-graph *factors* are sharded across the
  whole mesh (data-parallel-like); the scan-to-map *submap points* are
  sharded across the whole mesh too (tensor-parallel-like over the NN
  search dimension). Poses and scan queries are replicated — they are tiny.
- Pose-graph normal equations: each device computes H-matvec/gradient
  contributions for its factor shard; `psum` over the mesh reduces them.
  This is the Schur-free factor-parallel form of distributed bundle
  adjustment; the CG loop runs replicated on all devices with psum'd
  matvecs, so the only communication per CG iteration is one (N,6) psum.
- Scan-to-map NN: each device top-k's its submap shard (local MXU matmul),
  then the per-device candidates are all-gathered and merged — a k-way
  distributed top-k.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .config import LegoLoamConfig
from .math import se3
from .posegraph import Factors, factor_jacobians, factor_residuals
from .ops.knn import pairwise_sqdist

_BIG = np.float32(1e30)  # np, not jnp: a module-level jnp constant initializes
# the XLA backend at import, breaking jax.distributed.initialize in children


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host entry point: join the JAX distributed runtime so
    `jax.devices()` (and therefore `make_mesh`) spans every host's chips.

    ≙ nothing in the reference (single process, single machine — SURVEY.md
    §2.2); this is the new north-star capability. With no arguments the
    coordinator/process-count/process-id come from the environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the
    cloud-TPU metadata), matching `jax.distributed.initialize` defaults."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Mesh over the (global, after init_distributed) device set."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if n >= 4 and n % 2 == 0:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    return Mesh(devs.reshape(shape), ("graph", "map"))


def backend_state_shardings(mesh: Mesh, state):
    """NamedShardings putting the keyframe store and the assembled submap on
    the mesh (keyframes and map blocks sharded over all devices; poses and
    scalars replicated) — the north star's "keyframes/map blocks sharded
    across hosts". Applied to the pipeline's BackendState, the jitted chunk
    runner then partitions every mapping op (submap assembly, 5-NN, GN
    reductions) via GSPMD, with XLA inserting the collectives.

    Returns a pytree of NamedShardings matching `state`'s structure."""
    every = P(("graph", "map"))
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, every)

    def spec_for(path, leaf):
        name = ".".join(str(getattr(p, "name", p)) for p in path)
        if leaf.ndim == 0:
            return rep
        if name.startswith("kf_") or name.startswith("submap."):
            # shard the leading (K or point) axis; fall back to replication
            # when the axis does not divide the mesh
            if leaf.shape[0] % mesh.devices.size == 0:
                return row
        return rep

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(spec_for, state)


def shard_backend_state(mesh: Mesh, state):
    """device_put the BackendState onto the mesh per backend_state_shardings."""
    shardings = backend_state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, shardings)


# ---------------------------------------------------------------------------
# Distributed pose graph
# ---------------------------------------------------------------------------


def sharded_pose_graph_solver(mesh: Mesh, cfg: LegoLoamConfig, gn_iters: int = 3,
                              prior_w: float = 1e6):
    """Returns a jitted (poses_R, poses_t, factors, active) -> (R, t) solver
    with factors sharded over the full mesh."""

    fspec = Factors(
        i=P(("graph", "map")),
        j=P(("graph", "map")),
        R=P(("graph", "map")),
        t=P(("graph", "map")),
        info=P(("graph", "map")),
        mask=P(("graph", "map")),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), fspec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def solve(poses_R, poses_t, f: Factors, active_mask):
        N = poses_R.shape[0]
        active = active_mask[:, None].astype(poses_t.dtype)

        def psum(x):
            return jax.lax.psum(jax.lax.psum(x, "graph"), "map")

        def gn_body(_, carry):
            R, t = carry
            r = factor_residuals(R, t, f)
            Ji, Jj = factor_jacobians(R, t, f, r)

            wr = r * f.info * f.mask[:, None]
            gi = jnp.einsum("fba,fb->fa", Ji, wr)
            gj = jnp.einsum("fba,fb->fa", Jj, wr)
            g = jax.ops.segment_sum(gi, f.i, num_segments=N)
            g = g + jax.ops.segment_sum(gj, f.j, num_segments=N)
            g = psum(g)
            b = -g * active

            # block-diag preconditioner (psum'd)
            w = f.info * f.mask[:, None]
            Oi = jnp.einsum("fba,fb,fbc->fac", Ji, w, Ji)
            Oj = jnp.einsum("fba,fb,fbc->fac", Jj, w, Jj)
            B = jax.ops.segment_sum(Oi, f.i, num_segments=N)
            B = B + jax.ops.segment_sum(Oj, f.j, num_segments=N)
            B = psum(B)
            B = B.at[0].add(prior_w * jnp.eye(6))
            Minv = jnp.linalg.inv(B + 1e-6 * jnp.eye(6)[None])

            def mv(x):
                xi = x[f.i]
                xj = x[f.j]
                a = jnp.einsum("fab,fb->fa", Ji, xi) + jnp.einsum(
                    "fab,fb->fa", Jj, xj
                )
                a = a * w
                yi = jnp.einsum("fba,fb->fa", Ji, a)
                yj = jnp.einsum("fba,fb->fa", Jj, a)
                y = jax.ops.segment_sum(yi, f.i, num_segments=N)
                y = y + jax.ops.segment_sum(yj, f.j, num_segments=N)
                y = psum(y)
                y = y.at[0].add(prior_w * x[0])
                return y * active

            def apply_M(x):
                return jnp.einsum("nab,nb->na", Minv, x) * active

            x = jnp.zeros_like(b)
            res = b
            z = apply_M(res)
            p = z
            rz = jnp.sum(res * z)

            def cg_body(_, s):
                x, res, p, rz = s
                Ap = mv(p)
                denom = jnp.sum(p * Ap)
                alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
                x = x + alpha * p
                res = res - alpha * Ap
                z = apply_M(res)
                rz2 = jnp.sum(res * z)
                beta = jnp.where(jnp.abs(rz) > 1e-12, rz2 / rz, 0.0)
                return x, res, z + beta * p, rz2

            x, _, _, _ = jax.lax.fori_loop(
                0, cfg.distributed.cg_iterations, cg_body, (x, res, p, rz)
            )

            dR, dt = se3.exp_se3(x)
            R_new = R @ dR
            t_new = jnp.einsum("nij,nj->ni", R, dt) + t
            keep = active_mask[:, None]
            return (
                jnp.where(keep[..., None], R_new, R),
                jnp.where(keep, t_new, t),
            )

        return jax.lax.fori_loop(0, gn_iters, gn_body, (poses_R, poses_t))

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# Schur-reduction distributed pose graph (weak-scaling production path)
# ---------------------------------------------------------------------------


def schur_pose_graph_solver(
    mesh: Mesh,
    cfg: LegoLoamConfig,
    n_poses: int,
    stride: int = 16,
    gn_iters: int = 3,
    prior_w: float = 1e6,
    reduced: str = "auto",
):
    """Distributed chain+loop pose-graph solve by segment (Schur-style)
    reduction — the north star's "one reduction + local solves" design,
    replacing the factor-parallel PCG whose per-iteration psum is
    latency-bound (round-4 weak scaling: 47% @2 dev, 9% @8 dev).

    Layout: poses and chain rels are sharded contiguously over a 1-D mesh
    axis "seg"; loop factors (<= max_loop_factors) are replicated. One solve
    costs exactly FOUR collectives total, all outside the GN loop:
      1. ppermute of one rel row (segment boundaries),
      2. psum of the loop-factor anchor offsets (each contributed by its
         owner),
      3. all_gather of the reduced system (anchor poses + composed segment
         factors, ~100 B per anchor),
      4. psum broadcasting the leader's reduced solution.
    The reduced anchor graph is solved ONCE on device 0 (lax.cond — the
    others idle rather than burn ndev x redundant work) and corrections
    propagate to local poses rigidly (zero communication).

    rel[l] measures pose l-1 -> l (identity at l=0). Returns a jitted
    (poses_R, poses_t, rel_R, rel_t, n_active, loop_factors) -> (R, t).

    `reduced` picks the replicated anchor-level solver: "dense" (exact LU,
    O(A^3) — right while the reduced system is small), "pcg" (fixed
    iteration budget, O(A) per iteration — right once A_tot grows with the
    mesh, keeping per-solve cost flat under weak scaling), or "auto"
    (dense up to 256 anchors)."""
    from .posegraph import solve_dense_gn, solve_pose_graph

    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    assert n_poses % (nd * stride) == 0, (n_poses, nd, stride)
    P_loc = n_poses // nd
    A_loc = P_loc // stride
    A_tot = A_loc * nd
    m = cfg.mapping
    eye = jnp.eye(3, dtype=jnp.float32)

    pspec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, P(), Factors(
            i=P(), j=P(), R=P(), t=P(), info=P(), mask=P(),
        )),
        out_specs=(pspec, pspec),
        check_vma=False,
    )
    def solve(R_loc, t_loc, relR_loc, relt_loc, n_active, loop: Factors):
        d = jax.lax.axis_index(axis)
        base = d * P_loc

        # --- collective 1: rel shift across the boundary -------------------
        # Segment s uses rels (sS, (s+1)S]; the last local segment needs the
        # NEXT device's first rel (which measures my last pose -> its first).
        perm = [(i, (i - 1) % nd) for i in range(nd)]
        nbrR = jax.lax.ppermute(relR_loc[:1], axis, perm)
        nbrt = jax.lax.ppermute(relt_loc[:1], axis, perm)
        relR_s = jnp.concatenate([relR_loc[1:], nbrR], axis=0)
        relt_s = jnp.concatenate([relt_loc[1:], nbrt], axis=0)

        segR = relR_s.reshape(A_loc, stride, 3, 3).transpose(1, 0, 2, 3)
        segt = relt_s.reshape(A_loc, stride, 3).transpose(1, 0, 2)

        def comp(carry, rel):
            MR, Mt = carry
            return se3.compose(MR, Mt, rel[0], rel[1]), None

        (M_R, M_t), _ = jax.lax.scan(
            comp,
            (jnp.tile(eye[None], (A_loc, 1, 1)), jnp.zeros((A_loc, 3))),
            (segR, segt),
        )

        Ra_loc = R_loc[::stride]
        ta_loc = t_loc[::stride]

        # --- collective 2: loop-factor anchor offsets ----------------------
        # Each endpoint's intra-segment offset O = T_anchor^{-1} T_pose is
        # computed by the device owning the pose and psum'd (all other
        # devices contribute zeros).
        def local_offset(ids):
            local = (ids >= base) & (ids < base + P_loc)
            li = jnp.clip(ids - base, 0, P_loc - 1)
            ai = li // stride
            OR, Ot = se3.relative(
                Ra_loc[ai], ta_loc[ai], R_loc[li], t_loc[li]
            )
            OR = jnp.where(local[:, None, None], OR, 0.0)
            Ot = jnp.where(local[:, None], Ot, 0.0)
            return OR, Ot

        OiR, Oit = local_offset(loop.i)
        OjR, Ojt = local_offset(loop.j)
        OiR, Oit, OjR, Ojt = jax.lax.psum((OiR, Oit, OjR, Ojt), axis)

        # --- collective 3: gather the reduced system -----------------------
        Ra = jax.lax.all_gather(Ra_loc, axis, axis=0, tiled=True)
        ta = jax.lax.all_gather(ta_loc, axis, axis=0, tiled=True)
        MgR = jax.lax.all_gather(M_R, axis, axis=0, tiled=True)
        Mgt = jax.lax.all_gather(M_t, axis, axis=0, tiled=True)

        # --- replicated reduced solve (zero communication) -----------------
        n_anchors = jnp.maximum((n_active + stride - 1) // stride, 1)
        active_a = jnp.arange(A_tot) < n_anchors
        ci = jnp.arange(A_tot - 1, dtype=jnp.int32)
        cj = ci + 1
        cmask = cj < n_anchors
        chain_info = jnp.tile(
            jnp.asarray(
                [[1.0 / (m.chain_rot_var * stride)] * 3
                 + [1.0 / (m.chain_trans_var * stride)] * 3],
                jnp.float32,
            ),
            (A_tot - 1, 1),
        )
        ai = jnp.clip(loop.i // stride, 0, n_anchors - 1).astype(jnp.int32)
        aj = jnp.clip(loop.j // stride, 0, n_anchors - 1).astype(jnp.int32)
        lvalid = loop.mask & (loop.i < n_active) & (loop.j < n_active)
        lvalid = lvalid & (ai != aj)
        MR_, Mt_ = se3.compose(OiR, Oit, loop.R, loop.t)
        OjRi, Ojti = se3.inverse(OjR, Ojt)
        MR_, Mt_ = se3.compose(MR_, Mt_, OjRi, Ojti)
        red = Factors(
            i=jnp.concatenate([ci, ai]),
            j=jnp.concatenate([cj, aj]),
            R=jnp.concatenate([MgR[: A_tot - 1], MR_]),
            t=jnp.concatenate([Mgt[: A_tot - 1], Mt_]),
            info=jnp.concatenate([chain_info, loop.info]),
            mask=jnp.concatenate([cmask, lvalid]),
        )
        use_dense = reduced == "dense" or (
            reduced == "auto" and A_tot <= 256
        )

        def leader_solve(_):
            if use_dense:
                return solve_dense_gn(
                    Ra, ta, red, active_a,
                    gn_iters=gn_iters,
                    prior_w=prior_w,
                    trust_rot=m.posegraph_trust_rot,
                    trust_trans=m.posegraph_trust_trans,
                )
            return solve_pose_graph(
                Ra, ta, red, active_a, cfg,
                gn_iters=gn_iters, prior_w=prior_w,
            )

        def idle(_):
            return jnp.zeros_like(Ra), jnp.zeros_like(ta)

        # --- collective 4: leader solves the reduced system once, psum
        # broadcasts it. (A replicated solve would be ndev x the total work;
        # the reduced system is tiny, so solving on one device and shipping
        # ~100 B/anchor is strictly cheaper than ndev redundant solves.)
        Ra2, ta2 = jax.lax.cond(d == 0, leader_solve, idle, None)
        Ra2, ta2 = jax.lax.psum((Ra2, ta2), axis)

        # --- local interpolated propagation (zero communication) -----------
        # Anchor corrections D_a = T_a' T_a^{-1} are computable for ALL
        # anchors from the replicated reduced arrays; pose l blends
        # geodesically between its segment's anchors (same scheme as
        # posegraph.reduced_solve — rigid attachment leaves a discontinuity
        # at every segment boundary).
        RaI, taI = se3.inverse(Ra, ta)
        DR, Dt = se3.compose(Ra2, ta2, RaI, taI)
        l_glob = base + jnp.arange(P_loc)
        a_of_l = jnp.clip(l_glob // stride, 0, n_anchors - 1)
        a_next = jnp.clip(a_of_l + 1, 0, n_anchors - 1)
        frac = (l_glob - a_of_l * stride).astype(jnp.float32) / float(stride)
        dRn, dtn = se3.compose(
            DR[a_next], Dt[a_next], *se3.inverse(DR[a_of_l], Dt[a_of_l])
        )
        xi = se3.log_se3(dRn, dtn) * frac[:, None]
        bR, bt = se3.exp_se3(xi)
        DRl, Dtl = se3.compose(bR, bt, DR[a_of_l], Dt[a_of_l])
        R_new = se3.orthonormalize(DRl @ R_loc)
        t_new = jnp.einsum("nij,nj->ni", DRl, t_loc) + Dtl
        live = (base + jnp.arange(P_loc)) < n_active
        return (
            jnp.where(live[:, None, None], R_new, R_loc),
            jnp.where(live[:, None], t_new, t_loc),
        )

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# Sharded scan-to-map matching
# ---------------------------------------------------------------------------


def sharded_map_gn_step(mesh: Mesh, cfg: LegoLoamConfig):
    """One 6-DoF GN mapping iteration with the submap sharded across the mesh.

    Queries (current scan) are replicated; each device computes 5-NN
    candidates within its submap shard; candidates are all-gathered and
    merged; the H/g reduction is replicated (identical on all devices)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(),
            P(("graph", "map")), P(("graph", "map")),
            P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(q_surf, q_mask, map_xyz, map_mask, R, t):
        k = 5
        q = q_surf @ R.T + t
        d2 = pairwise_sqdist(q, map_xyz)
        d2 = jnp.where(map_mask[None, :], d2, _BIG)
        neg, idx = jax.lax.top_k(-d2, k)  # local candidates
        cand_d = -neg  # (Q, k)
        cand_p = map_xyz[idx]  # (Q, k, 3)

        # merge across devices
        all_d = jax.lax.all_gather(cand_d, "map", axis=1, tiled=True)
        all_d = jax.lax.all_gather(all_d, "graph", axis=1, tiled=True)
        all_p = jax.lax.all_gather(cand_p, "map", axis=1, tiled=True)
        all_p = jax.lax.all_gather(all_p, "graph", axis=1, tiled=True)

        order = jnp.argsort(all_d, axis=1)[:, :k]
        nbr = jnp.take_along_axis(all_p, order[..., None], axis=1)  # (Q,5,3)
        d5 = jnp.take_along_axis(all_d, order, axis=1)
        ok = q_mask & (d5[:, 4] < cfg.mapping.nn_valid_dist)

        # plane fit residuals (same math as mapping._surf_residuals)
        from .mapping import plane_fit_pca

        n, d_off = plane_fit_pca(nbr)
        fitd = jnp.abs(jnp.einsum("qki,qi->qk", nbr, n) + d_off[:, None])
        plane_ok = jnp.all(fitd < cfg.mapping.plane_valid_dist, axis=1)
        pd = jnp.sum(n * q, axis=-1) + d_off
        qn = jnp.linalg.norm(q, axis=-1)
        s = 1.0 - 0.9 * jnp.abs(pd) / jnp.sqrt(jnp.maximum(qn, 1e-9))
        w = jnp.where(ok & plane_ok & (s > 0.1), s, 0.0)

        Jw = jnp.cross(q, n)
        J = jnp.concatenate([Jw, n], axis=-1) * w[:, None]
        r = pd * w
        H = J.T @ J
        g = J.T @ r
        evals, evecs = jnp.linalg.eigh(H)
        keep = (evals >= cfg.mapping.eigen_threshold).astype(H.dtype)
        ginv = jnp.where(evals > 1e-9, 1.0 / jnp.maximum(evals, 1e-9), 0.0)
        delta = -(evecs @ ((evecs.T @ g) * ginv * keep))
        dR, dt = se3.exp_se3(delta)
        return se3.compose(dR, dt, R, t)

    return jax.jit(step)

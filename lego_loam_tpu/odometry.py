"""Scan-to-scan odometry: correspondence search + two-step Gauss-Newton.

TPU-native rewrite of the FeatureAssociation solver
(`featureAssociation.cpp:1580-2535`). Differences from the reference by
design:

- Pose is SE(3) (rotation matrix + translation), optimized on-manifold with
  twist increments, instead of euler closed forms in the LOAM camera frame.
- The two-step split keeps the reference's DOF structure in lidar axes:
  step A solves (roll, pitch, tz) from planar features
  (≙ `calculateTransformationSurf` solving camera rx/rz/ty, :1846-2010);
  step B solves (yaw, tx, ty) from corners (≙ `calculateTransformationCorner`
  :2013-2143).
- kd-tree + adjacent-ring walks become dense masked distance matrices
  (`ops/knn.py`) with ring-window masks; support-point indices are cached
  between periodic re-searches (≙ the iterCount%5 refresh, :1588) while the
  residual geometry is re-evaluated every iteration, as the reference does.
- Degeneracy handling keeps the eigenvalue-gate projection
  (eig < 10 -> direction removed, :1959-1990).

The motion M maps current-scan-end coordinates to previous-scan-end
coordinates; a point captured at relative time s is matched after applying
interp(M, s) (constant-twist interpolation, ≙ TransformToStart's fractional
euler scaling :1389-1412).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import LegoLoamConfig
from .math import se3
from .ops.knn import pairwise_sqdist, masked_nn_where
from .types import FeatureCloud, ScanFeatures

_BIG = np.float32(1e30)  # np: module-level jnp constants init the backend at import


def warp_points(M_R, M_t, xyz, s):
    """q_i = exp(s_i log M) p_i, component-wise Rodrigues.

    Per-point (N,3,3) interpolated rotation matrices (se3.interp) pad their
    trailing dims to full TPU tiles — a ~40x HBM blowup and tiny-matmul
    einsums (measured: the interp-matrix deskew path cost 43% of total
    frame time, 42 -> 74 scans/s with warping off). The axis is shared
    across points (only the angle scales with s), so everything stays in
    (N,) component planes."""
    xi = se3.log_se3(M_R, M_t)
    w, v = xi[:3], xi[3:]
    theta = jnp.linalg.norm(w)
    safe = theta > 1e-9
    k = jnp.where(safe, w / jnp.maximum(theta, 1e-12), jnp.zeros(3))
    kx, ky, kz = k[0], k[1], k[2]
    s_ = s
    th = s_ * theta
    ct = jnp.cos(th)
    st = jnp.sin(th)

    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    kdotp = kx * px + ky * py + kz * pz
    cx = ky * pz - kz * py
    cy = kz * px - kx * pz
    cz = kx * py - ky * px
    one_ct = 1.0 - ct
    rx = px * ct + cx * st + kx * kdotp * one_ct
    ry = py * ct + cy * st + ky * kdotp * one_ct
    rz = pz * ct + cz * st + kz * kdotp * one_ct

    # t(s) = J_l(s w) (s v);  J_l(θk) x = x + A (k×x) + B (k(k·x) − x)
    # with A=(1−cosθ)/θ, B=(θ−sinθ)/θ — both → 0 smoothly as θ→0.
    svx = s_ * v[0]
    svy = s_ * v[1]
    svz = s_ * v[2]
    # Sign-preserving safe divide: s may be NEGATIVE (to_scan_end warps by
    # rel_time - 1), so clamping th from below would blow A/B up by 1e12.
    den = jnp.where(jnp.abs(th) > 1e-12, th, 1.0)
    A = one_ct / den * safe
    B = (th - st) / den * safe
    kxsx = ky * svz - kz * svy
    kxsy = kz * svx - kx * svz
    kxsz = kx * svy - ky * svx
    kdots = kx * svx + ky * svy + kz * svz
    tx = svx + A * kxsx + B * (kx * kdots - svx)
    ty = svy + A * kxsy + B * (ky * kdots - svy)
    tz = svz + A * kxsz + B * (kz * kdots - svz)

    return jnp.stack([rx + tx, ry + ty, rz + tz], axis=-1)


def _apply_motion(M_R, M_t, cloud: FeatureCloud):
    return warp_points(M_R, M_t, cloud.xyz, cloud.rel_time)


# ---------------------------------------------------------------------------
# Correspondence search (indices) and evaluation (geometry), split so the
# solver can cache indices across iterations.
# ---------------------------------------------------------------------------


def _robust_weight(dist, ok, slope):
    """Self-annealing residual weights, every iteration.

    The reference weights correspondences by 1 - slope*|d| only from LM
    iteration 5 (featureAssociation.cpp:1678-1683) — safe there only
    because its 0.05-damped steps barely move during the unweighted
    iterations. With exact GN steps, one unweighted iteration lets
    newly-visible features (matched up to 5 m away at weight 1) yank the
    pose to a false minimum (measured 44 cm single-frame error on a 9.5
    deg/frame turn); weighting with a FIXED scale from iteration 0 instead
    rejects the true correspondences whenever the warm start is poor
    (identity start = 0.8 m true residuals). So the rejection scale
    anneals with the solve itself: weights fall off relative to the
    current mean |residual| (clipped at 1 m, floored at the reference's
    1/slope scale). Far from the optimum all plausible matches count;
    near it the falloff reduces to the reference's fixed-slope weights."""
    a = jnp.abs(dist)
    n = jnp.maximum(jnp.sum(ok), 1)
    mean_r = jnp.sum(jnp.where(ok, jnp.minimum(a, 1.0), 0.0)) / n
    scale = jnp.maximum(1.0, slope * 2.5 * mean_r)
    return 1.0 - (slope / scale) * a


def _nn5(q_xyz, target: FeatureCloud, cfg):
    """Exact 5-NN of q_xyz in the masked target -> (idx (Q,5), d2 (Q,5)).

    TPU: the Pallas streaming top-k kernel (ops/pallas_knn.py, groups=1 =
    exact) — a full lax.top_k over the (Q, T) matrix lowers to an
    O(T log T) XLA sort per refresh, measured 4.6 ms and the single largest
    op in the frame; approx_min_k was tried and its ~0.95 recall poisoned
    the 5-support fits (campus odometry drift 11 m -> 19 m). Shapes are
    padded to the kernel's (512, 2048) tile multiples; padded targets are
    masked out, padded queries sliced off. CPU/tests: exact top_k."""
    import jax as _jax

    T = target.xyz.shape[0]
    if _jax.default_backend() == "tpu" and cfg.mapping.nn_backend != "xla":
        from .ops.pallas_knn import pallas_topk_l2

        Q = q_xyz.shape[0]
        padQ = (-Q) % 512
        padT = (-T) % 2048
        qp = jnp.pad(q_xyz, ((0, padQ), (0, 0)))
        tp = jnp.pad(target.xyz, ((0, padT), (0, 0)))
        tm = jnp.pad(target.mask, (0, padT))
        idx, d2 = pallas_topk_l2(qp, tp, tm, k=5, groups=1)
        return jnp.clip(idx[:Q], 0, T - 1), d2[:Q]
    masked = jnp.where(
        target.mask[None, :], pairwise_sqdist(q_xyz, target.xyz), _BIG
    )
    neg, idx = jax.lax.top_k(-masked, 5)
    return idx, -neg


def corner_search5(q_xyz, query: FeatureCloud, target: FeatureCloud, cfg):
    """Top-5 NN in the corner target for the covariance line fit.

    Replaces the NN + nearest-adjacent-ring support PAIR
    (findCorrespondingCornerFeatures :1589-1644): a 2-point line is exact
    through its supports, so a pair straddling two different edges (the
    adjacent-ring pick is only distance-gated at 5 m) defines an arbitrary
    direction with no residual evidence. 5-NN covariance + the line-ratio
    gate (same construction as the mapping stage's _corner_fit,
    mapOptmization.cpp:1283-1333) rejects non-collinear neighborhoods."""
    o = cfg.odometry
    idx, d5 = _nn5(q_xyz, target, cfg)
    ok = query.mask & (d5[:, 4] < o.corner_nn_max_dist ** 2)
    return idx, ok


def corner_fit5(nbr, ok):
    """Covariance line fit through (Q, 5, 3) neighbors: center c, direction
    v (largest eigvec), eigenvalue ratio for the collinearity gate.
    Returns (cx, cy, cz, vx, vy, vz, ratio, ok)."""
    from .math.linalg3 import eigvals3x3_components, eigvec_extreme_components

    nx, ny, nz = nbr[:, :, 0], nbr[:, :, 1], nbr[:, :, 2]
    cx = jnp.mean(nx, axis=1)
    cy = jnp.mean(ny, axis=1)
    cz = jnp.mean(nz, axis=1)
    dx = nx - cx[:, None]
    dy = ny - cy[:, None]
    dz = nz - cz[:, None]
    comps = (
        jnp.mean(dx * dx, axis=1), jnp.mean(dx * dy, axis=1),
        jnp.mean(dx * dz, axis=1), jnp.mean(dy * dy, axis=1),
        jnp.mean(dy * dz, axis=1), jnp.mean(dz * dz, axis=1),
    )
    lo, mid, hi = eigvals3x3_components(*comps)
    vx, vy, vz = eigvec_extreme_components(comps, lo, mid)  # largest eigvec
    ratio = hi / jnp.maximum(mid, 1e-9)
    return (cx, cy, cz, vx, vy, vz, ratio, ok)


def corner_eval5(q_xyz, fit, late, cfg):
    """Point-to-line residual vs the cached covariance line, with the
    collinearity gate. dist = |(q - c) x v| (v unit up to eig scaling —
    eigvec_extreme_components returns unit vectors)."""
    o = cfg.odometry
    cx, cy, cz, vx, vy, vz, ratio, ok = fit
    ok = ok & (ratio > o.corner_line_ratio)
    qx, qy, qz = q_xyz[:, 0], q_xyz[:, 1], q_xyz[:, 2]
    px = qx - cx
    py = qy - cy
    pz = qz - cz
    crx = py * vz - pz * vy
    cry = pz * vx - px * vz
    crz = px * vy - py * vx
    cn = jnp.sqrt(crx * crx + cry * cry + crz * crz)
    dist = cn
    inv = 1.0 / jnp.maximum(cn, 1e-12)
    ux, uy, uz = crx * inv, cry * inv, crz * inv
    gx = vy * uz - vz * uy
    gy = vz * ux - vx * uz
    gz = vx * uy - vy * ux
    s = _robust_weight(dist, ok, o.weight_slope_corner)
    w = jnp.where(ok & (s > o.weight_min) & (dist > 1e-9), s, 0.0)
    del late
    return (gx, gy, gz), dist, w


def corner_search(q_xyz, query: FeatureCloud, target: FeatureCloud, cfg):
    """NN + nearest-on-adjacent-ring support pair for point-to-line.

    ≙ findCorrespondingCornerFeatures search phase (:1589-1644)."""
    o = cfg.odometry
    max_d2 = cfg.features.nearest_feature_search_distance ** 2
    d2 = pairwise_sqdist(q_xyz, target.xyz)
    i1, d1 = masked_nn_where(d2, target.mask[None, :] & query.mask[:, None])
    ring1 = target.ring[i1]
    dring = jnp.abs(target.ring[None, :] - ring1[:, None]).astype(jnp.float32)
    adj = (dring > 0.5) & (dring <= o.ring_window) & target.mask[None, :]
    i2, d22 = masked_nn_where(d2, adj & query.mask[:, None])
    ok = query.mask & (d1 < max_d2) & (d22 < max_d2)
    return i1, i2, ok


def corner_fit(t1, t2, ok):
    """Pose-independent line support from the cached index pair: anchor t1,
    direction u = t1 - t2 (precomputed unit inverse). Hoisted out of the GN
    loop — the support segment doesn't move with the pose iterate."""
    ux, uy, uz = t1[:, 0] - t2[:, 0], t1[:, 1] - t2[:, 1], t1[:, 2] - t2[:, 2]
    un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    ui = 1.0 / jnp.maximum(un, 1e-9)
    return (t1[:, 0], t1[:, 1], t1[:, 2], ux, uy, uz, ui, ok)


def corner_eval(q_xyz, fit, late, cfg):
    """Point-to-line residual vs the cached line (:1646-1695), every GN
    iteration. With a = q - t1 and u = t1 - t2:
    (q-t1) x (q-t2) = a x (a+u) = a x u — only t1 and u are needed.

    Component-plane math throughout (trailing-3 arrays pad to 128 lanes on
    TPU). Returns the gradient as an (N,) component triple."""
    o = cfg.odometry
    t1x, t1y, t1z, ux, uy, uz, ui, ok = fit
    qx, qy, qz = q_xyz[:, 0], q_xyz[:, 1], q_xyz[:, 2]
    ax, ay, az = qx - t1x, qy - t1y, qz - t1z
    cx = ay * uz - az * uy
    cy = az * ux - ax * uz
    cz = ax * uy - ay * ux
    cn = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    dist = cn * ui
    ci = 1.0 / jnp.maximum(cn, 1e-12)
    hx, hy, hz = cx * ci, cy * ci, cz * ci
    gx = (uy * hz - uz * hy) * ui
    gy = (uz * hx - ux * hz) * ui
    gz = (ux * hy - uy * hx) * ui
    s = _robust_weight(dist, ok, o.weight_slope_corner)
    w = jnp.where(ok & (s > o.weight_min) & (dist > 1e-9), s, 0.0)
    del late  # superseded by the adaptive scale; kept in the signature
    return (gx, gy, gz), dist, w


def surf_search5(q_xyz, query: FeatureCloud, target: FeatureCloud, cfg):
    """Top-5 NN in the (ground-only) surf target for the PCA plane fit.

    Replaces the reference's NN + same-ring + adjacent-ring support TRIPOD
    (findCorrespondingSurfFeatures :1722-1800): a 3-point fit is exact
    through its supports, so one support sitting slightly off the ground
    plane (the ground label's 0.3 m elevation margin admits wall-base
    points, imageProjection.cpp:673-698 — same in our apply_ground) tilts
    the plane 10-20 deg with no residual evidence. 5-NN PCA + the
    coplanarity gate in surf_fit5 rejects exactly those neighborhoods
    (measured: removes a deterministic -0.03 deg/frame pitch bias). One
    top_k also beats three masked argmin sweeps on TPU."""
    o = cfg.odometry
    idx, d5 = _nn5(q_xyz, target, cfg)
    ok = query.mask & (d5[:, 4] < o.surf_nn_max_dist ** 2)
    return idx, ok


def surf_fit5(nbr, ok):
    """PCA plane through the (Q, 5, 3) neighbor sets (total least squares,
    like the mapping stage's _surf_fit) + per-neighbor coplanarity residual.
    Returns (gx, gy, gz, d_off, max_dev, ok); the gates that need config
    (coplanarity tolerance, normal-z) are applied in surf_eval."""
    nx, ny, nz = nbr[:, :, 0], nbr[:, :, 1], nbr[:, :, 2]
    cx = jnp.mean(nx, axis=1)
    cy = jnp.mean(ny, axis=1)
    cz = jnp.mean(nz, axis=1)
    dx = nx - cx[:, None]
    dy = ny - cy[:, None]
    dz = nz - cz[:, None]
    comps = (
        jnp.sum(dx * dx, axis=1), jnp.sum(dx * dy, axis=1),
        jnp.sum(dx * dz, axis=1), jnp.sum(dy * dy, axis=1),
        jnp.sum(dy * dz, axis=1), jnp.sum(dz * dz, axis=1),
    )
    from .math.linalg3 import eigvals3x3_components, eigvec_extreme_components

    lo, mid, hi = eigvals3x3_components(*comps)
    gx, gy, gz = eigvec_extreme_components(comps, mid, hi)  # smallest eigvec
    d_off = -(gx * cx + gy * cy + gz * cz)
    dev = jnp.abs(
        gx[:, None] * nx + gy[:, None] * ny + gz[:, None] * nz + d_off[:, None]
    )
    return (gx, gy, gz, d_off, jnp.max(dev, axis=1), ok)


def surf_eval5(q_xyz, fit, late, cfg):
    """Point-to-plane residual vs the cached PCA plane, with the coplanarity
    and normal-z gates (see surf_search5)."""
    o = cfg.odometry
    gx, gy, gz, d_off, max_dev, ok = fit
    ok = ok & (max_dev < o.surf_plane_tol)
    if o.surf_normal_min_z > 0:
        ok = ok & (jnp.abs(gz) >= o.surf_normal_min_z)
    qx, qy, qz = q_xyz[:, 0], q_xyz[:, 1], q_xyz[:, 2]
    pd = gx * qx + gy * qy + gz * qz + d_off
    s = _robust_weight(pd, ok, o.weight_slope_surf)
    w = jnp.where(ok & (s > o.weight_min), s, 0.0)
    del late
    return (gx, gy, gz), pd, w


def surf_search(q_xyz, query: FeatureCloud, target: FeatureCloud, cfg):
    """NN + same-or-lower-ring + higher-ring support triple for point-to-plane.

    ≙ findCorrespondingSurfFeatures search phase (:1722-1800)."""
    o = cfg.odometry
    max_d2 = cfg.features.nearest_feature_search_distance ** 2
    d2 = pairwise_sqdist(q_xyz, target.xyz)
    i1, d1 = masked_nn_where(d2, target.mask[None, :] & query.mask[:, None])
    ring1 = target.ring[i1]
    dring = (target.ring[None, :] - ring1[:, None]).astype(jnp.float32)
    in_win = (jnp.abs(dring) <= o.ring_window) & target.mask[None, :]
    not_nn = jnp.arange(target.xyz.shape[0])[None, :] != i1[:, None]
    i2, d22 = masked_nn_where(d2, in_win & (dring <= 0) & not_nn & query.mask[:, None])
    i3, d23 = masked_nn_where(d2, in_win & (dring > 0) & query.mask[:, None])
    ok = query.mask & (d1 < max_d2) & (d22 < max_d2) & (d23 < max_d2)
    return i1, i2, i3, ok


def surf_fit(t1, t2, t3, ok):
    """Pose-independent plane from the cached support triple (unit normal g,
    offset d = -g·t1), hoisted out of the GN loop."""
    ax, ay, az = t2[:, 0] - t1[:, 0], t2[:, 1] - t1[:, 1], t2[:, 2] - t1[:, 2]
    bx, by, bz = t3[:, 0] - t1[:, 0], t3[:, 1] - t1[:, 1], t3[:, 2] - t1[:, 2]
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = 1.0 / jnp.maximum(nn, 1e-12)
    gx, gy, gz = nx * inv, ny * inv, nz * inv
    d_off = -(gx * t1[:, 0] + gy * t1[:, 1] + gz * t1[:, 2])
    return (gx, gy, gz, d_off, ok & (nn > 1e-12))


def surf_eval(q_xyz, fit, late, cfg):
    """Point-to-plane residual vs the cached plane (:1802-1842), every GN
    iteration; component-plane math throughout."""
    o = cfg.odometry
    gx, gy, gz, d_off, ok = fit
    if o.surf_normal_min_z > 0:
        # Ground-query planes must be near-horizontal: tripods mixing a wall
        # point tilt the fit and bias pitch (see OdometryConfig.
        # surf_normal_min_z; measured -0.05 deg/frame deterministic).
        ok = ok & (jnp.abs(gz) >= o.surf_normal_min_z)
    qx, qy, qz = q_xyz[:, 0], q_xyz[:, 1], q_xyz[:, 2]
    pd = gx * qx + gy * qy + gz * qz + d_off
    s = _robust_weight(pd, ok, o.weight_slope_surf)
    w = jnp.where(ok & (s > o.weight_min), s, 0.0)
    del late  # superseded by the adaptive scale; kept in the signature
    return (gx, gy, gz), pd, w


# ---------------------------------------------------------------------------
# Gauss-Newton
# ---------------------------------------------------------------------------


def _gn_step(q_xyz, rel_time, n, d, w, dof_idx, cfg: LegoLoamConfig):
    """One masked-DOF Gauss-Newton step with degeneracy projection.

    dof_idx: static python tuple naming the 3 active twist components.
    n is an (N,) component triple. Returns the 6-twist increment and the
    (deg, cm) step norms for the convergence test
    (≙ featureAssociation.cpp:2002-2010).

    The Jacobian is deliberately UNSCALED by the per-point sweep time s even
    though the residual is evaluated through the s-interpolated warp — the
    reference does the same (its ar*/at* coefficient expressions in
    calculateTransformation*, featureAssociation.cpp:1896-1950, differentiate
    the full transform while TransformToStart applies the s-scaled one).
    Exact-GN s-scaling was tried and is strictly worse on TPU: J ∝ s shrinks
    the Hessian eigenvalues by E[s^2] ~ 1/3, dropping feature-rich scenes
    below the reference-calibrated degeneracy gate (eigen_threshold = 10
    zeroed the corner stage's translation DOFs entirely — measured 0.11 m/
    frame forward blindness on a 0.12 m/frame drive), and near-s=0 points
    carry ~zero information either way. With unscaled J the step solves
    J d = -r where r ~ s * (true delta): a contraction with ratio ~1-E[s],
    geometric convergence to the same fixed point (residuals still vanish at
    the true motion), and the gate semantics match the reference's."""
    o = cfg.odometry
    gx, gy, gz = n
    qx, qy, qz = q_xyz[:, 0], q_xyz[:, 1], q_xyz[:, 2]
    s_ = jnp.ones_like(rel_time)
    cols6 = (
        (qy * gz - qz * gy) * s_ * w,
        (qz * gx - qx * gz) * s_ * w,
        (qx * gy - qy * gx) * s_ * w,
        gx * s_ * w,
        gy * s_ * w,
        gz * s_ * w,
    )
    cols = [cols6[i] for i in dof_idx]
    r = d * w
    H = jnp.stack(
        [jnp.stack([jnp.sum(cols[a] * cols[b]) for b in range(3)]) for a in range(3)]
    )
    g = jnp.stack([jnp.sum(cols[a] * r) for a in range(3)])

    evals, evecs = jnp.linalg.eigh(H)
    keep = (evals >= o.eigen_threshold).astype(H.dtype)
    ginv = jnp.where(evals > 1e-12, 1.0 / jnp.maximum(evals, 1e-12), 0.0)
    delta3 = -(evecs @ ((evecs.T @ g) * ginv * keep)) * o.step_scale

    n_valid = jnp.sum(w > 0)
    delta3 = jnp.where(n_valid >= o.min_correspondences, delta3, 0.0)
    delta = jnp.zeros((6,))
    for k, i in enumerate(dof_idx):  # static unroll
        delta = delta.at[i].set(delta3[k])

    # Per-iteration trust region: one GN move never exceeds the clamp, so a
    # bad correspondence set cannot fling the pose out of its basin before
    # the next refresh corrects it.
    rot_n = jnp.linalg.norm(delta[:3])
    trans_n = jnp.linalg.norm(delta[3:])
    rot_cap = o.step_clamp_rot_deg * jnp.pi / 180.0
    scale = jnp.minimum(
        jnp.minimum(1.0, rot_cap / jnp.maximum(rot_n, 1e-12)),
        jnp.minimum(1.0, o.step_clamp_trans / jnp.maximum(trans_n, 1e-12)),
    )
    delta = delta * scale
    rot_deg = jnp.linalg.norm(delta[:3]) * 180.0 / jnp.pi
    trans_cm = jnp.linalg.norm(delta[3:]) * 100.0
    return delta, rot_deg, trans_cm


def _solve_stage(
    M_R, M_t, query, target, search_fn, fit_fn, eval_fn, n_sup, dof_mask, cfg,
    sup_dims=(3,),
):
    """GN iterations with periodic correspondence refresh (≙
    updateTransformation loops, featureAssociation.cpp:2505-2535).

    The pose-independent line/plane fit (fit_fn) runs only at refresh time;
    every iteration evaluates only the cheap pose-dependent residual
    (eval_fn) against the cached fit."""
    o = cfg.odometry
    dof_idx = tuple(int(i) for i in np.nonzero(np.asarray(dof_mask))[0])
    Q = query.xyz.shape[0]

    def cond(state):
        it = state[0]
        done = state[4]
        return (it < o.max_iterations) & ~done

    def body(state):
        it, R, t, fit, _, R_ref, t_ref = state
        late = it >= 5
        q_xyz = _apply_motion(R, t, query)

        # Motion-triggered refresh: the search (a (Q, T) distance matrix +
        # masked argmin sweeps — the stage's dominant HBM cost) reruns only
        # when the pose has moved enough since the last refresh to change
        # the support sets. With a constant-velocity warm start most frames
        # refresh exactly once; a fixed it%search_every cadence re-ran it
        # 3-4x per frame on support sets that hadn't changed. (Same idea as
        # the mapping stage's search_every >= its iteration budget.)
        # trace(R_refᵀ R) = 1 + 2 cos(angle between them)
        tr = jnp.trace(R_ref.T @ R)
        thr = 1.0 + 2.0 * jnp.cos(o.refresh_rot_deg * jnp.pi / 180.0)
        moved = (tr < thr) | (
            jnp.linalg.norm(t - t_ref) > o.refresh_trans_m
        )
        need = (it == 0) | moved

        def refresh(_):
            res = search_fn(q_xyz, query, target, cfg)
            sup = [target.xyz[res[k]] for k in range(n_sup)]
            return fit_fn(*sup, res[-1]), R, t

        fit, R_ref, t_ref = jax.lax.cond(
            need, refresh, lambda _: (fit, R_ref, t_ref), None
        )
        n, d, w = eval_fn(q_xyz, fit, late, cfg)
        delta, rot_deg, trans_cm = _gn_step(
            q_xyz, query.rel_time, n, d, w, dof_idx, cfg
        )
        dR, dt = se3.exp_se3(delta)
        R_new, t_new = se3.compose(dR, dt, R, t)
        done = (rot_deg < o.rot_converge_deg) & (trans_cm < o.trans_converge_cm)
        return it + 1, R_new, t_new, fit, done, R_ref, t_ref

    fit0 = fit_fn(
        *([jnp.zeros((Q,) + sup_dims)] * n_sup), jnp.zeros((Q,), bool)
    )
    init = (
        jnp.int32(0), M_R, M_t, fit0, jnp.bool_(False), M_R, M_t
    )
    _, R, t, _, _, _, _ = jax.lax.while_loop(cond, body, init)

    # Stage-level trust region around the warm start (see OdometryConfig.
    # stage_cap_*): scale the total correction twist back inside the cap.
    dR, dt = se3.relative(M_R, M_t, R, t)
    xi = se3.log_se3(dR, dt)
    rot_n = jnp.linalg.norm(xi[:3])
    trans_n = jnp.linalg.norm(xi[3:])
    cap_r = o.stage_cap_rot_deg * jnp.pi / 180.0
    s_cap = jnp.minimum(
        jnp.minimum(1.0, cap_r / jnp.maximum(rot_n, 1e-12)),
        jnp.minimum(1.0, o.stage_cap_trans / jnp.maximum(trans_n, 1e-12)),
    )
    dR_c, dt_c = se3.exp_se3(xi * s_cap)
    return se3.compose(M_R, M_t, dR_c, dt_c)


SURF_DOFS = (True, True, False, False, False, True)  # roll, pitch, tz
CORNER_DOFS = (False, False, True, True, True, False)  # yaw, tx, ty
# Full-6DoF ablation (≙ the reference's calculateTransformation,
# featureAssociation.cpp:2145-2289, kept alongside the two-step split):
# with cfg.odometry.full_dof_odometry both passes solve all six DOFs —
# the masked-DOF split is exactly what the ablation toggles.
FULL_DOFS = (True,) * 6


def two_step_odometry(
    features: ScanFeatures,
    last_corner: FeatureCloud,
    last_surf: FeatureCloud,
    M_R_init,
    M_t_init,
    cfg: LegoLoamConfig,
):
    """Full two-step solve. Returns refined (R, t) motion estimate."""
    o = cfg.odometry
    surf_dofs = FULL_DOFS if o.full_dof_odometry else SURF_DOFS
    corner_dofs = FULL_DOFS if o.full_dof_odometry else CORNER_DOFS
    R, t = _solve_stage(
        M_R_init, M_t_init,
        features.surf_flat, last_surf,
        surf_search5, surf_fit5, surf_eval5, 1, surf_dofs, cfg,
        sup_dims=(5, 3),
    )
    R, t = _solve_stage(
        R, t,
        features.corner_sharp, last_corner,
        corner_search5, corner_fit5, corner_eval5, 1, corner_dofs, cfg,
        sup_dims=(5, 3),
    )
    if o.accel_cap > 0:
        # Speed trust region vs the warm start (constant-velocity model):
        # see OdometryConfig.accel_cap. Direction is kept; only |t| is
        # clamped into [prev - cap, prev + cap]. Cold-start bypass: an
        # EXACTLY zero warm start only happens before any motion estimate
        # exists (a noisy stationary solve leaves ~noise-scale speed), and
        # clamping the very first solve to the cap would take 0.12 m/frame
        # ground truth to 0.03 (measured; test_frontend).
        prev_sp = jnp.linalg.norm(M_t_init)
        sp = jnp.linalg.norm(t)
        tgt_sp = jnp.clip(sp, prev_sp - o.accel_cap, prev_sp + o.accel_cap)
        tgt_sp = jnp.where(prev_sp > 1e-6, tgt_sp, sp)
        t = t * (tgt_sp / jnp.maximum(sp, 1e-9))
    return R, t


def to_scan_end(cloud: FeatureCloud, M_R, M_t) -> FeatureCloud:
    """Re-express feature points in the scan-end frame (≙ TransformToEnd,
    featureAssociation.cpp:1414-1490): apply interp(M, s - 1) — via the
    component-plane warp, NOT per-point interp matrices (see warp_points)."""
    xyz = warp_points(M_R, M_t, cloud.xyz, cloud.rel_time - 1.0)
    return cloud.replace(
        xyz=jnp.where(cloud.mask[:, None], xyz, 0.0),
        rel_time=jnp.ones_like(cloud.rel_time),
    )

"""Micro-time pieces of the new label_components on the real chip.

TIMING PROBES ONLY: the fixpoint variants here omit the column wrap-around
exchange the production sweep applies (segmentation.py) and hardcode the
iteration cap, so converged labels/timings are representative of op cost,
not semantically equivalent to label_components.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops import segmentation as S


def timeit(fn, *args, reps=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:48s} {dt:8.3f} ms", flush=True)
    return out, dt


def main():
    cfg = vlp16()
    (R, t), = straight_trajectory(1, speed=0.15, yaw_rate=np.deg2rad(1.0))
    pts = render_scan(R, t, cfg, noise=0.01, seed=11)

    n = cfg.laser.max_points
    buf = np.zeros((n, 3), np.float32)
    m = np.zeros((n,), bool)
    k = min(len(pts), n)
    buf[:k] = np.nan_to_num(pts[:k])
    m[:k] = np.isfinite(pts[:k]).all(axis=1)

    key = jax.random.PRNGKey(0)
    grid = jax.jit(lambda p, mm: project_point_cloud(p, mm, cfg))(
        jnp.asarray(buf), jnp.asarray(m)
    )
    grid = jax.jit(lambda g, kk: apply_ground(g, cfg, kk))(grid, key)

    H, W = grid.range.shape
    candidate = grid.valid & (grid.ground != 1)
    left, right, up, down = jax.jit(
        lambda g: S._connectivity(g, g.valid & (g.ground != 1), cfg)
    )(grid)

    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    big = jnp.int32(H * W)
    rows = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))

    # -- tuple fixpoint alone -----------------------------------------------
    def tuple_fixpoint(cand, l, r, u, d):
        label = jnp.where(cand, idx, big)

        def seg_scan(vals, conn_prev, axis, reverse):
            def combine(a, b):
                fa, la, ra, xa = a
                fb, lb, rb, xb = b
                return (
                    fa & fb,
                    jnp.where(fb, jnp.minimum(la, lb), lb),
                    jnp.where(fb, jnp.minimum(ra, rb), rb),
                    jnp.where(fb, jnp.maximum(xa, xb), xb),
                )

            out = jax.lax.associative_scan(
                combine, (conn_prev,) + vals, axis=axis, reverse=reverse
            )
            return out[1:]

        def sweep(vals):
            m_ = seg_scan(vals, l, axis=1, reverse=False)
            m_ = seg_scan(m_, r, axis=1, reverse=True)
            m_ = seg_scan(m_, u, axis=0, reverse=False)
            m_ = seg_scan(m_, d, axis=0, reverse=True)
            return tuple(jnp.where(cand, x, s) for x, s in zip(m_, (big, big, -1)))

        def cond(st):
            i, _, changed = st
            return (i < 24) & changed

        def body(st):
            i, vals, _ = st
            new = sweep(vals)
            return i + 1, new, jnp.any(new[0] != vals[0])

        init = (label, jnp.where(cand, rows, big), jnp.where(cand, rows, -1))
        it, out, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init, jnp.bool_(True))
        )
        return it, out

    tf = jax.jit(tuple_fixpoint)
    (it, (label, rmin, rmax)), _ = timeit(
        lambda: tf(candidate, left, right, up, down), name="tuple fixpoint (3 vals)"
    )
    print("  sweeps:", int(it))

    # -- single-value fixpoint (label only), as before -----------------------
    def single_fixpoint(cand, l, r, u, d):
        label = jnp.where(cand, idx, big)

        def seg_min_scan(lab, conn_prev, axis, reverse):
            def combine(a, b):
                fa, va = a
                fb, vb = b
                return fa & fb, jnp.where(fb, jnp.minimum(va, vb), vb)

            _, out = jax.lax.associative_scan(
                combine, (conn_prev, lab), axis=axis, reverse=reverse
            )
            return out

        def sweep(lab):
            m_ = seg_min_scan(lab, l, axis=1, reverse=False)
            m_ = seg_min_scan(m_, r, axis=1, reverse=True)
            m_ = seg_min_scan(m_, u, axis=0, reverse=False)
            m_ = seg_min_scan(m_, d, axis=0, reverse=True)
            return jnp.where(cand, m_, big)

        def cond(st):
            i, _, changed = st
            return (i < 24) & changed

        def body(st):
            i, lab, _ = st
            new = sweep(lab)
            return i + 1, new, jnp.any(new != lab)

        it, label, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), label, jnp.bool_(True))
        )
        return it, label

    sf = jax.jit(single_fixpoint)
    (it1, lab1), _ = timeit(
        lambda: sf(candidate, left, right, up, down), name="single fixpoint (label)"
    )
    print("  sweeps:", int(it1))

    # -- segment_sum + reshape + broadcast ------------------------------------
    def size_pipeline(label, cand, l, r, u, d):
        flat = label.reshape(-1)
        ones = cand.reshape(-1).astype(jnp.int32)
        sizes = jax.ops.segment_sum(ones, flat, num_segments=H * W + 1)
        size_at_root = jnp.where(label == idx, sizes[: H * W].reshape(H, W), 0)

        def mscan(val, conn_prev, axis, reverse):
            def combine(a, b):
                fa, va = a
                fb, vb = b
                return fa & fb, jnp.where(fb, jnp.maximum(va, vb), vb)

            _, out = jax.lax.associative_scan(
                combine, (conn_prev, val), axis=axis, reverse=reverse
            )
            return out

        def bsweep(v):
            m_ = mscan(v, l, axis=1, reverse=False)
            m_ = mscan(m_, r, axis=1, reverse=True)
            m_ = mscan(m_, u, axis=0, reverse=False)
            m_ = mscan(m_, d, axis=0, reverse=True)
            return jnp.where(cand, m_, 0)

        def cond(st):
            i, _, changed = st
            return (i < 24) & changed

        def body(st):
            i, v, _ = st
            new = bsweep(v)
            return i + 1, new, jnp.any(new != v)

        it, size_all, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), size_at_root, jnp.bool_(True))
        )
        return it, size_all

    sz = jax.jit(size_pipeline)
    (itb, _), _ = timeit(
        lambda: sz(lab1, candidate, left, right, up, down),
        name="segment_sum + size broadcast fixpoint",
    )
    print("  sweeps:", int(itb))

    lc = jax.jit(lambda g: S.label_components(g, cfg))
    _, _ = timeit(lambda: lc(grid), name="label_components (new) total")


if __name__ == "__main__":
    main()

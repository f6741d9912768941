"""Break down label_components cost on the real chip (not part of tests)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops import segmentation as S


def timeit(fn, *args, reps=50, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
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

    conn = jax.jit(lambda g: S._connectivity(g, g.valid & (g.ground != 1), cfg))
    _, _ = timeit(lambda: conn(grid), name="connectivity")
    left, right, up, down = conn(grid)

    # fixpoint only
    def fixpoint(grid):
        cand = grid.valid & (grid.ground != 1)
        l, r, u, d = S._connectivity(grid, cand, cfg)
        idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        big = jnp.int32(H * W)
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

        def sweep(label):
            m_ = seg_min_scan(label, l, axis=1, reverse=False)
            m_ = seg_min_scan(m_, r, axis=1, reverse=True)
            wrapped = jnp.roll(m_, 1, axis=1)
            m_ = jnp.minimum(m_, jnp.where(l, wrapped, big))
            wrapped = jnp.roll(m_, -1, axis=1)
            m_ = jnp.minimum(m_, jnp.where(r, wrapped, big))
            m_ = seg_min_scan(m_, u, axis=0, reverse=False)
            m_ = seg_min_scan(m_, d, axis=0, reverse=True)
            return jnp.where(cand, m_, big)

        def cond(st):
            i, _, changed = st
            return (i < cfg.segmentation.label_prop_iters) & changed

        def body(st):
            i, lab, _ = st
            new = sweep(lab)
            return i + 1, new, jnp.any(new != lab)

        it, label, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), label, jnp.bool_(True))
        )
        return it, label

    fp = jax.jit(lambda g: fixpoint(g))
    (it, label), _ = timeit(lambda: fp(grid), name="fixpoint while_loop")
    print("  sweeps executed:", int(it))

    # stats only
    def stats(label, grid):
        cand = grid.valid & (grid.ground != 1)
        flat = label.reshape(-1)
        ones = cand.reshape(-1).astype(jnp.int32)
        sizes = jax.ops.segment_sum(ones, flat, num_segments=H * W + 1)
        order = jnp.argsort(label, axis=1)
        lab_sorted = jnp.take_along_axis(label, order, axis=1)
        first = jnp.concatenate(
            [jnp.ones((H, 1), bool), lab_sorted[:, 1:] != lab_sorted[:, :-1]],
            axis=1,
        )
        first = first & (lab_sorted < H * W)
        row_counts = jax.ops.segment_sum(
            first.reshape(-1).astype(jnp.int32),
            lab_sorted.reshape(-1),
            num_segments=H * W + 1,
        )
        return sizes, row_counts

    st = jax.jit(lambda l, g: stats(l, g))
    _, _ = timeit(lambda: st(label, grid), name="stats (sizes + row_counts)")

    # sizes only
    st2 = jax.jit(
        lambda l, g: jax.ops.segment_sum(
            (g.valid & (g.ground != 1)).reshape(-1).astype(jnp.int32),
            l.reshape(-1),
            num_segments=H * W + 1,
        )
    )
    _, _ = timeit(lambda: st2(label, grid), name="  sizes segment_sum only")

    # row span via segment min/max — TIMING PROBE ONLY, not semantically
    # equivalent to production row_counts: feasibleSegment counts DISTINCT
    # rows (lineCountFlag), span >= distinct count, so adopting span in
    # label_components would admit segments the reference rejects.
    def span(label, grid):
        rows = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1)
        flat = label.reshape(-1)
        rmin = jax.ops.segment_min(rows, flat, num_segments=H * W + 1)
        rmax = jax.ops.segment_max(rows, flat, num_segments=H * W + 1)
        return rmax - rmin + 1

    sp = jax.jit(lambda l, g: span(l, g))
    _, _ = timeit(lambda: sp(label, grid), name="  row span via segment min/max")

    # full segment_cloud for reference, then packing-only estimate
    segc = jax.jit(lambda g: S.segment_cloud(g, cfg))
    _, _ = timeit(lambda: segc(grid), name="segment_cloud total")
    labf = jax.jit(lambda g: S.label_components(g, cfg))
    _, _ = timeit(lambda: labf(grid), name="label_components total")

    # packing pieces
    def packing(grid, label):
        cols = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
        is_ground = grid.ground == 1
        ground_keep = is_ground & ((cols % 5 == 0) | (cols <= 5) | (cols >= W - 5))
        keep = ((label > 0) | ground_keep) & grid.valid
        order = jnp.argsort(jnp.where(keep, cols, W + cols), axis=1)
        return order

    pk = jax.jit(lambda g, l: packing(g, l))
    _, _ = timeit(lambda: pk(grid, label), name="  row-pack argsort only")

    def outl(grid, label):
        rows = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W))
        cols = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
        outlier = (label == 0) & (rows > cfg.laser.ground_scan_index) & (
            cols % 5 == 0
        )
        No = (H * W) // 5 + 1
        oflat = outlier.reshape(-1)
        oorder = jnp.argsort(~oflat)[:No]
        return oorder

    ol = jax.jit(lambda g, l: outl(g, l))
    _, _ = timeit(lambda: ol(grid, label), name="  outlier argsort only")


if __name__ == "__main__":
    main()

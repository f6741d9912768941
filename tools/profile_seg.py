"""Time segmentation variants on the real chip (not part of tests)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops.segmentation import segment_cloud, label_components


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

    lab = jax.jit(lambda g: label_components(g, cfg))
    _, _ = timeit(lambda: lab(grid), name="label_components")
    seg = jax.jit(lambda g: segment_cloud(g, cfg))
    _, _ = timeit(lambda: seg(grid), name="segment_cloud (labels+stats+pack)")


if __name__ == "__main__":
    main()

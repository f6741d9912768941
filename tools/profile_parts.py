"""Per-stage device timing on the real chip (not part of the test suite).

Times each jitted sub-program with block_until_ready over many reps, after
warmup, to locate the hot spots inside the 24 ms/frame budget.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.pipeline import LegoLoamPipeline


def timeit(fn, *args, reps=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return out, dt


def main():
    cfg = vlp16()
    poses = straight_trajectory(8, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = [render_scan(R, t, cfg, noise=0.01, seed=11 + i) for i, (R, t) in enumerate(poses)]

    pipe = LegoLoamPipeline(cfg)
    # run a few frames to fill state
    for s in scans[:6]:
        pipe.process_scan(s)
    jax.block_until_ready(pipe.bstate.t_map)

    pts, mask = pipe._prep(scans[6])
    fstate = pipe.fstate
    bstate = pipe.bstate

    # full frontend
    _, t_fe = timeit(
        lambda: pipe._frontend(
            pts, mask, fstate, jnp.int32(6), bstate.R_map, bstate.t_map,
            bstate.R_odom, bstate.t_odom,
        ),
        name="frontend (stage1+features+odom)",
    )
    fs2, out = pipe._frontend(
        pts, mask, fstate, jnp.int32(6), bstate.R_map, bstate.t_map,
        bstate.R_odom, bstate.t_odom,
    )
    jax.block_until_ready(fs2)

    # full backend
    _, t_be = timeit(
        lambda: pipe._backend(
            bstate, out["features"], out["segmented"].outlier_xyz,
            out["segmented"].outlier_mask, out["R_world"], out["t_world"],
            jnp.float32(0.6),
        ),
        name="backend (submap+scan2map+kf)",
    )

    # stage1 pieces
    from lego_loam_tpu.frontend import stage1
    from lego_loam_tpu.ops.projection import project_point_cloud
    from lego_loam_tpu.ops.ground import apply_ground
    from lego_loam_tpu.ops.segmentation import segment_cloud
    from lego_loam_tpu.ops.features import extract_features

    key = jax.random.PRNGKey(0)
    proj = jax.jit(lambda p, m: project_point_cloud(p, m, cfg))
    _, _ = timeit(lambda: proj(pts, mask), name="  stage1: projection")
    grid = proj(pts, mask)
    grd = jax.jit(lambda g, k: apply_ground(g, cfg, k))
    _, _ = timeit(lambda: grd(grid, key), name="  stage1: ground")
    grid2 = grd(grid, key)
    seg = jax.jit(lambda g: segment_cloud(g, cfg))
    _, _ = timeit(lambda: seg(grid2), name="  stage1: segmentation")
    _, segd = seg(grid2)
    feat = jax.jit(lambda s: extract_features(s, cfg))
    _, _ = timeit(lambda: feat(segd), name="  features (curv+pick+dbscan)")
    feats = feat(segd)

    # odometry solve alone
    from lego_loam_tpu.odometry import two_step_odometry

    odo = jax.jit(
        lambda f, lc, ls: two_step_odometry(
            f, lc, ls, jnp.eye(3), jnp.zeros(3), cfg
        )
    )
    _, _ = timeit(
        lambda: odo(feats, fstate.last_corner, fstate.last_surf),
        name="  odometry two-step GN",
    )

    # backend pieces
    from lego_loam_tpu.backend import backend_step
    from lego_loam_tpu.mapping import assemble_submap, scan_to_map
    from lego_loam_tpu.types import MapState

    # submap assembly alone (forced rebuild)
    kfv = jnp.arange(bstate.kf_R.shape[0]) < bstate.n_kf
    asm = jax.jit(
        lambda: assemble_submap(
            bstate.kf_corner_view(), bstate.kf_corner_mask,
            bstate.kf_surf_view(), bstate.kf_surf_mask,
            bstate.kf_R, bstate.kf_t, kfv, bstate.t_map, cfg,
        )
    )
    _, _ = timeit(lambda: asm(), name="  backend: submap assemble+DS")
    submap = asm()

    print("submap corners:", int(jnp.sum(submap.corner_mask)),
          "surfs:", int(jnp.sum(submap.surf_mask)))

    print(f"TOTAL fe+be: {t_fe + t_be:.2f} ms -> {1000/(t_fe+t_be):.1f} scans/s serial")


if __name__ == "__main__":
    main()

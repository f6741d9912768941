"""Backend-internal device timing on the real chip (not part of tests)."""

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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return out, dt


def main():
    cfg = vlp16()
    poses = straight_trajectory(24, speed=0.3, yaw_rate=np.deg2rad(1.0))
    scans = [render_scan(R, t, cfg, noise=0.01, seed=11 + i) for i, (R, t) in enumerate(poses)]

    pipe = LegoLoamPipeline(cfg)
    for s in scans[:23]:
        pipe.process_scan(s)
    jax.block_until_ready(pipe.bstate.t_map)

    pts, mask = pipe._prep(scans[23])
    fstate = pipe.fstate
    bstate = pipe.bstate
    fs2, out = pipe._frontend(
        pts, mask, fstate, jnp.int32(23), bstate.R_map, bstate.t_map,
        bstate.R_odom, bstate.t_odom,
    )
    jax.block_until_ready(fs2)
    feats = out["features"]
    oxyz = out["segmented"].outlier_xyz
    omask = out["segmented"].outlier_mask

    from lego_loam_tpu.backend import (
        KF_CORNER_CAP, KF_SURF_CAP, downsample_current_scan, _select_keyframes,
    )
    from lego_loam_tpu.mapping import assemble_submap, scan_to_map
    from lego_loam_tpu.ops.pallas_knn import pallas_topk_l2
    from lego_loam_tpu.ops.voxel import voxel_downsample_masked

    # current-scan downsample
    ds = jax.jit(lambda f, ox, om: downsample_current_scan(f, ox, om, cfg))
    (c_xyz, c_m, s_xyz, s_m), _ = timeit(
        lambda: ds(feats, oxyz, omask), name="backend: downsample_current_scan"
    )

    # submap assembly (full rebuild), args passed explicitly
    def asm(kc, kcm, ks, ksm, kR, kt, kv, origin):
        return assemble_submap(
            kc.reshape(-1, KF_CORNER_CAP, 3), kcm,
            ks.reshape(-1, KF_SURF_CAP, 3), ksm, kR, kt, kv, origin, cfg,
        )

    idx, valid = jax.jit(lambda s, c: _select_keyframes(s, c, cfg))(
        bstate, bstate.t_map
    )
    asm_j = jax.jit(asm)
    args = (
        bstate.kf_corner[idx], bstate.kf_corner_mask[idx],
        bstate.kf_surf[idx], bstate.kf_surf_mask[idx],
        bstate.kf_R[idx], bstate.kf_t[idx], valid, bstate.t_map,
    )
    submap, _ = timeit(lambda: asm_j(*args), name="backend: submap assemble+2xDS (50kf)")

    # scan_to_map GN
    s2m = jax.jit(
        lambda cx, cm, sx, sm2, R0, t0, sub: scan_to_map(
            cx, cm, sx, sm2, R0, t0, sub, cfg
        )
    )
    _, _ = timeit(
        lambda: s2m(c_xyz, c_m, s_xyz, s_m, bstate.R_map, bstate.t_map, submap),
        name="backend: scan_to_map GN (8 it, 2 refresh)",
    )

    # knn kernels alone
    qs = s_xyz
    knn_s = jax.jit(lambda q, t, m: pallas_topk_l2(q, t, m, k=5))
    _, _ = timeit(
        lambda: knn_s(qs, submap.surf_xyz, submap.surf_mask),
        name="knn surf 4096x65536",
    )
    _, _ = timeit(
        lambda: knn_s(c_xyz, submap.corner_xyz, submap.corner_mask),
        name="knn corner 1024x16384",
    )

    # voxel DS alone on the big concat
    cw = bstate.kf_surf[idx].reshape(-1, 3)
    cwm = bstate.kf_surf_mask[idx].reshape(-1)
    vds = jax.jit(
        lambda p, m: voxel_downsample_masked(
            p, m, cfg.mapping.submap_surf_leaf, cfg.pipeline.local_voxel_radius,
            jnp.zeros(3),
        )
    )
    _, _ = timeit(lambda: vds(cw, cwm), name="voxel DS 204800 pts")


if __name__ == "__main__":
    main()

"""Time the chunked pipeline's two halves (batched prepass vs sequential
scan) separately in their exact production context. Run on the real chip.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import render_scan, straight_trajectory
from lego_loam_tpu.pipeline import LegoLoamPipeline


def main():
    cfg = vlp16()
    chunk = 16
    n = 4 * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = [render_scan(R, t, cfg, noise=0.01, seed=11 + i)
             for i, (R, t) in enumerate(poses)]
    pipe = LegoLoamPipeline(cfg)
    prepped = [pipe._prep_many(scans[s:s + chunk]) for s in range(0, n, chunk)]

    # --- full chunk steady state ------------------------------------------
    for c in range(2):
        pipe.process_chunk(*prepped[c])
    jax.block_until_ready(pipe.bstate.t_map)
    t0 = time.perf_counter()
    for c in range(2, 4):
        pipe.process_chunk(*prepped[c])
    jax.block_until_ready(pipe.bstate.t_map)
    dt = (time.perf_counter() - t0) / (2 * chunk) * 1e3
    print(f"full chunk step        {dt:8.3f} ms/frame", flush=True)

    # --- prepass only -------------------------------------------------------
    from lego_loam_tpu.backend import downsample_current_scan
    from lego_loam_tpu.frontend import frontend_prepass

    def prepass(pts, mask, idx):
        key = jax.random.fold_in(jax.random.PRNGKey(0), idx)
        _grid, seg, feats = frontend_prepass(pts, mask, cfg, key)
        ds = downsample_current_scan(feats, seg.outlier_xyz, seg.outlier_mask, cfg)
        return feats, ds

    pre_j = jax.jit(lambda p, m, i0: jax.vmap(prepass)(
        p, m, i0 + jnp.arange(p.shape[0], dtype=jnp.int32)))

    args = [(jnp.asarray(p), jnp.asarray(m)) for p, m in prepped]
    out = pre_j(*args[0], jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for r in range(4):
        outs.append(pre_j(*args[r % 4], jnp.int32(r)))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (4 * chunk) * 1e3
    print(f"vmapped prepass        {dt:8.3f} ms/frame", flush=True)

    # --- single-frame prepass (unbatched), for comparison ------------------
    pre1 = jax.jit(lambda p, m, i: prepass(p, m, i))
    p1, m1 = args[0][0][0], args[0][1][0]
    out = pre1(p1, m1, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [pre1(args[r % 4][0][r % chunk], args[r % 4][1][r % chunk], jnp.int32(r))
            for r in range(16)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 16 * 1e3
    print(f"single-frame prepass   {dt:8.3f} ms/frame", flush=True)

    # --- scan-only runner ----------------------------------------------------
    from functools import partial
    from lego_loam_tpu.backend import backend_step_ds
    from lego_loam_tpu.frontend import frontend_solve
    from lego_loam_tpu.fusion import fuse_pose

    def step(carry, inp):
        fstate, bstate, idx = carry
        feats, ds, t_scan = inp
        fstate, o = frontend_solve(feats, fstate, cfg)
        bstate, _pose, diag = backend_step_ds(
            bstate, *ds, o["R_world"], o["t_world"], t_scan, cfg)
        return (fstate, bstate, idx + 1), o["t_world"]

    @partial(jax.jit, donate_argnums=(0, 1))
    def scan_only(fstate, bstate, idx0, feats, ds, ts):
        (fstate, bstate, _), ys = jax.lax.scan(
            step, (fstate, bstate, idx0), (feats, ds, ts))
        return fstate, bstate, ys

    feats, ds = pre_j(*args[0], jnp.int32(0))
    ts = jnp.arange(chunk, dtype=jnp.float32) * cfg.laser.scan_period
    fstate, bstate = pipe.fstate, pipe.bstate
    fstate, bstate, ys = scan_only(fstate, bstate, jnp.int32(100), feats, ds, ts)
    jax.block_until_ready(ys)
    t0 = time.perf_counter()
    for r in range(4):
        feats, ds = pre_j(*args[r % 4], jnp.int32(0))
        fstate, bstate, ys = scan_only(
            fstate, bstate, jnp.int32(100 + r), feats, ds, ts)
    jax.block_until_ready(ys)
    dt = (time.perf_counter() - t0) / (4 * chunk) * 1e3
    print(f"prepass+scan pipelined {dt:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

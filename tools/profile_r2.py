"""Round-2 steady-state per-stage profile on the real chip.

Each component is timed inside a jitted lax.scan of R iterations (inputs
perturbed per-iteration by the carry so XLA cannot hoist the work), which
removes host-dispatch cost from the measurement — the same regime the
production chunk runner operates in.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.pipeline import LegoLoamPipeline

R = 64


def scan_time(name, fn, *args):
    """Time fn inside lax.scan over R iters. fn(*args, it) -> anything."""

    @jax.jit
    def run(args):
        def body(c, it):
            out = fn(*args, it)
            leaf = jax.tree.leaves(out)[0]
            return c + jnp.sum(leaf.astype(jnp.float32)) * 0, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R))
        return c

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:40s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    cfg = vlp16()
    n = 24
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))

    pipe = LegoLoamPipeline(cfg)
    pts_all, m_all = pipe._prep_many(scans)
    # fill state: run 1 chunk
    pipe.process_chunk(pts_all[:16], m_all[:16])
    jax.block_until_ready(pipe.bstate.t_map)

    from lego_loam_tpu.frontend import frontend_prepass, frontend_solve
    from lego_loam_tpu.backend import (
        backend_step_ds,
        downsample_current_scan,
    )
    from lego_loam_tpu.ops.projection import project_point_cloud
    from lego_loam_tpu.ops.ground import apply_ground
    from lego_loam_tpu.ops.segmentation import segment_cloud
    from lego_loam_tpu.ops.features import extract_features

    pts = jnp.asarray(pts_all[17])
    mask = jnp.asarray(m_all[17])
    key = jax.random.PRNGKey(0)
    fstate = pipe.fstate
    bstate = pipe.bstate

    def perturb(p, it):
        return p + (it.astype(jnp.float32) * 1e-6)[None, None]

    # stage pieces
    grid = jax.jit(lambda p, m: project_point_cloud(p, m, cfg))(pts, mask)
    grid_g = jax.jit(lambda g, k: apply_ground(g, cfg, k))(grid, key)
    grid_s, seg = jax.jit(lambda g: segment_cloud(g, cfg))(grid_g)
    feats = jax.jit(lambda s: extract_features(s, cfg))(seg)
    ds = jax.jit(
        lambda f, ox, om: downsample_current_scan(f, ox, om, cfg)
    )(feats, seg.outlier_xyz, seg.outlier_mask)

    t_proj = scan_time(
        "project_point_cloud",
        lambda p, m, it: project_point_cloud(perturb(p, it), m, cfg),
        pts, mask,
    )
    t_ground = scan_time(
        "apply_ground",
        lambda g, k, it: apply_ground(
            g.replace(xyz=g.xyz + it.astype(jnp.float32) * 1e-6), cfg,
            jax.random.fold_in(k, it),
        ),
        grid, key,
    )
    t_seg = scan_time(
        "segment_cloud",
        lambda g, it: segment_cloud(
            g.replace(xyz=g.xyz + it.astype(jnp.float32) * 1e-6), cfg
        ),
        grid_g,
    )
    t_feat = scan_time(
        "extract_features",
        lambda s, it: extract_features(
            s.replace(xyz=s.xyz + it.astype(jnp.float32) * 1e-6), cfg
        ),
        seg,
    )
    t_ds = scan_time(
        "downsample_current_scan",
        lambda f, ox, om, it: downsample_current_scan(
            f, ox + it.astype(jnp.float32) * 1e-6, om, cfg
        ),
        feats, seg.outlier_xyz, seg.outlier_mask,
    )
    t_solve = scan_time(
        "frontend_solve (two-step GN)",
        lambda f, st, it: frontend_solve(
            f, st.replace(t_world=st.t_world + it.astype(jnp.float32) * 1e-6),
            cfg,
        ),
        feats, fstate,
    )
    t_back = scan_time(
        "backend_step_ds",
        lambda bs, c, cm, s, sm, Ro, to, it: backend_step_ds(
            bs, c + it.astype(jnp.float32) * 1e-6, cm, s, sm, Ro, to,
            jnp.float32(1.0), cfg,
        ),
        bstate, ds[0], ds[1], ds[2], ds[3], fstate.R_world, fstate.t_world,
    )
    total = t_proj + t_ground + t_seg + t_feat + t_ds + t_solve + t_back
    print(f"{'TOTAL (sum of stages)':40s} {total:8.3f} ms")
    print(f"{'implied scans/s':40s} {1000.0 / total:8.1f}")


if __name__ == "__main__":
    main()

"""Prepass bisect: projection / ground / segmentation / features / scan-DS.

Chunked lax.scan runners over 16 frames with stages progressively enabled
(disabled suffix is DCE'd), honest device_get sync.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.io.synthetic import straight_trajectory, swept_scan_sequence
from lego_loam_tpu.backend import downsample_current_scan
from lego_loam_tpu.ops.features import extract_features
from lego_loam_tpu.ops.ground import apply_ground
from lego_loam_tpu.ops.projection import project_point_cloud
from lego_loam_tpu.ops.segmentation import segment_cloud
from lego_loam_tpu.pipeline import LegoLoamPipeline


def build_runner(cfg, level):
    def leaves_sum(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree)
        )

    def step(carry, inp):
        idx = carry
        pts = inp["pts"].astype(jnp.float32) * cfg.pipeline.feed_quant
        mask = inp["mask"]
        key = jax.random.fold_in(jax.random.PRNGKey(0), idx)
        grid = project_point_cloud(pts, mask, cfg)
        probe = jnp.sum(grid.range * jnp.isfinite(grid.range))
        if level >= 2:
            grid = apply_ground(grid, cfg, key)
            probe = jnp.sum(grid.ground.astype(jnp.float32))
        if level >= 3:
            grid, seg = segment_cloud(grid, cfg)
            probe = leaves_sum((seg.xyz, seg.rel_time))
        if level >= 4:
            feats = extract_features(seg, cfg)
            probe = leaves_sum(jax.tree.map(lambda x: x, feats))
        if level >= 5:
            ds = downsample_current_scan(
                feats, seg.outlier_xyz, seg.outlier_mask, cfg
            )
            probe = leaves_sum(ds)
        return idx + 1, probe

    @partial(jax.jit, donate_argnums=(0,))
    def run(idx0, xs):
        idx, ys = jax.lax.scan(step, idx0, xs)
        return idx, ys

    return run


def main():
    cfg = vlp16()
    chunk = 16
    n_chunks = 4
    n = n_chunks * chunk
    poses = straight_trajectory(n, speed=0.15, yaw_rate=np.deg2rad(1.0))
    scans = list(swept_scan_sequence(poses, cfg, noise=0.01, seed=11))
    pipe = LegoLoamPipeline(cfg)
    prepped = [pipe._prep_many(scans[s : s + chunk]) for s in range(0, n, chunk)]
    staged = [
        {"pts": jnp.asarray(p), "mask": jnp.asarray(m)} for p, m in prepped
    ]
    jax.device_get(staged[-1]["mask"][0][:1])

    names = {1: "projection", 2: "+ground", 3: "+segmentation", 4: "+features", 5: "+scanDS"}
    prev = 0.0
    for level in (1, 2, 3, 4, 5):
        runner = build_runner(cfg, level)
        idx = jnp.int32(0)
        t0 = time.perf_counter()
        idx, ys = runner(idx, staged[0])
        jax.device_get(ys[-1])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for c in range(1, n_chunks):
            idx, ys = runner(idx, staged[c])
        jax.device_get(ys[-1])
        dt = time.perf_counter() - t0
        ms = dt * 1e3 / ((n_chunks - 1) * chunk)
        print(
            f"P{level} {names[level]:14s}: {ms:5.2f} ms/frame (delta {ms-prev:+5.2f}, compile {warm:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()

"""Micro-timing of submap-rebuild pieces + mapping 5-NN, honest sync.

Each timed lambda is jitted, fed real-shaped random data, run in a loop of
R reps with a data dependence chained through an accumulator, and closed
with a device_get.
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
from lego_loam_tpu.ops.voxel import voxel_downsample_masked, voxel_keys

cfg = vlp16()
R = 20


def timeit(label, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0.0), *args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(R):
        acc = f(acc, *args)
    jax.device_get(acc.ravel()[:1] if hasattr(acc, "ravel") else acc)
    dt = (time.perf_counter() - t0) * 1e3 / R
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    rs = np.random.RandomState(0)
    N = 204800
    xyz = jnp.asarray(rs.uniform(-50, 50, (N, 3)).astype(np.float32))
    mask = jnp.asarray(rs.rand(N) < 0.55)

    key, _ = voxel_keys(xyz, 0.4, cfg.pipeline.local_voxel_radius)
    key = jax.device_get(key)
    keyd = jnp.asarray(key)

    # 1. argsort of the keys alone
    timeit(
        "argsort 204800 int32",
        lambda acc, k: acc + jnp.argsort(k + (acc == 1e9).astype(jnp.int32))[0],
        keyd,
    )

    # 2. lax.sort of (key, xyz components) together  (4 operands, 1 key)
    def sort4(acc, k, x):
        kk = k + (acc == 1e9).astype(jnp.int32)
        out = jax.lax.sort(
            (kk, x[:, 0], x[:, 1], x[:, 2]), num_keys=1
        )
        return acc + out[1][0]

    timeit("lax.sort key+xyz 204800", sort4, keyd, xyz)

    # 3. segment_sum scatter with monotonic ids
    seg = jnp.asarray(np.sort(rs.randint(0, N, N)).astype(np.int32))

    def segsum(acc, s, x):
        v = jax.ops.segment_sum(x + acc, s, num_segments=N + 1)
        return acc + v[0, 0]

    timeit("segment_sum 204800->N", segsum, seg, xyz)

    # 4. full voxel_downsample_masked (current production)
    def vds(acc, x, m):
        o, om = voxel_downsample_masked(
            x + acc, m, 0.4, cfg.pipeline.local_voxel_radius
        )
        return acc + o[0, 0]

    timeit("voxel_downsample_masked 204800", vds, xyz, mask)

    # 5. corner version (51200)
    xyz_c = xyz[:51200]
    mask_c = mask[:51200]

    def vds_c(acc, x, m):
        o, om = voxel_downsample_masked(
            x + acc, m, 0.2, cfg.pipeline.local_voxel_radius
        )
        return acc + o[0, 0]

    timeit("voxel_downsample_masked 51200", vds_c, xyz_c, mask_c)

    # 6. Pallas 5-NN surf (4096 queries x 32768 targets)
    from lego_loam_tpu.ops.pallas_knn import pallas_topk_l2

    q = jnp.asarray(rs.uniform(-50, 50, (4096, 3)).astype(np.float32))
    tgt = jnp.asarray(rs.uniform(-50, 50, (32768, 3)).astype(np.float32))
    tm = jnp.asarray(np.ones(32768, bool))

    def knn_s(acc, q, t, m):
        idx, d = pallas_topk_l2(q + acc, t, m, k=5)
        return acc + d[0, 0]

    timeit("pallas 5-NN 4096x32768", knn_s, q, tgt, tm)

    # 7. Pallas 5-NN corner (1024 x 8192)
    qc = q[:1024]
    tc = tgt[:8192]

    def knn_c(acc, q, t, m):
        idx, d = pallas_topk_l2(q + acc, t, m[:8192], k=5)
        return acc + d[0, 0]

    timeit("pallas 5-NN 1024x8192", knn_c, qc, tc, tm)

    # 8. top_k over 20480 keyframes
    dists = jnp.asarray(rs.rand(20480).astype(np.float32))

    def topk(acc, d):
        neg, idx = jax.lax.top_k(-(d + acc), 50)
        return acc + neg[0]

    timeit("top_k 50 of 20480", topk, dists)

    # 9. keyframe gathers + transform (50 kf x 4096 pts)
    kf = jnp.asarray(rs.uniform(-1, 1, (20480, 4096 * 3)).astype(np.float32))
    idx50 = jnp.asarray(rs.randint(0, 20480, 50).astype(np.int32))
    Rm = jnp.tile(jnp.eye(3)[None], (50, 1, 1))
    tv = jnp.asarray(rs.uniform(-1, 1, (50, 3)).astype(np.float32))

    def gx(acc, kf, i, Rm, tv):
        g = kf[i].reshape(50, 4096, 3)
        w = jnp.einsum("kij,knj->kni", Rm, g) + tv[:, None, :]
        return acc + w[0, 0, 0]

    timeit("gather+transform 50x4096", gx, kf, idx50, Rm, tv)


if __name__ == "__main__":
    main()

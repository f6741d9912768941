"""Effect of query spatial sorting on the Pallas k-NN tile pruning.

Production reality: targets come out of voxel DS sorted by packed voxel
key; queries arrive in scan order (spatially interleaved). The kernel's
tile-prune only fires when NO query in a 512-row tile improves, so
scattered queries defeat it. Sorting queries by the same voxel key makes
query tiles spatially compact.
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

from lego_loam_tpu.ops.pallas_knn import pallas_topk_l2
from lego_loam_tpu.ops.voxel import voxel_keys

R = 30


def timeit(label, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0.0), *args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(R):
        acc = f(acc, *args)
    jax.device_get(acc)
    dt = (time.perf_counter() - t0) * 1e3 / R
    print(f"{label}: {dt:.2f} ms", flush=True)


def main():
    rs = np.random.RandomState(0)
    # Realistic geometry: a ring-road scene ~80 m across, targets on
    # surfaces. Emulate with clustered points.
    centers = rs.uniform(-40, 40, (300, 3)) * np.array([1, 1, 0.05])
    tgt = (
        centers[rs.randint(0, 300, 32768)]
        + rs.normal(0, 1.5, (32768, 3)) * np.array([1, 1, 0.3])
    ).astype(np.float32)
    q = (
        centers[rs.randint(0, 300, 4096)]
        + rs.normal(0, 1.5, (4096, 3)) * np.array([1, 1, 0.3])
    ).astype(np.float32)

    # Targets sorted by voxel key (what DS produces), ~55% valid packed front
    kt, _ = voxel_keys(jnp.asarray(tgt), 0.4, 102.4)
    tgt = tgt[np.argsort(np.asarray(kt))]
    tm = jnp.asarray(np.ones(32768, bool))

    tgt_d = jnp.asarray(tgt)
    q_d = jnp.asarray(q)

    def knn(acc, q, t, m):
        idx, d = pallas_topk_l2(q + acc, t, m, k=5)
        return acc + d[0, 0] * 0.0

    timeit("unsorted queries", knn, q_d, tgt_d, tm)

    kq, _ = voxel_keys(jnp.asarray(q), 0.4, 102.4)
    q_sorted = q[np.argsort(np.asarray(kq))]
    timeit("sorted queries  ", knn, jnp.asarray(q_sorted), tgt_d, tm)

    # in-program sort + unpermute (what production would do)
    def knn_sortq(acc, q, t, m):
        qk, _ = voxel_keys(q + acc, 0.4, 102.4)
        order = jnp.argsort(qk)
        idx, d = pallas_topk_l2(q[order], t, m, k=5)
        inv = jnp.argsort(order)
        return acc + d[inv][0, 0] * 0.0

    timeit("in-program sort+unpermute", knn_sortq, q_d, tgt_d, tm)

    # corner-sized problem
    qc = jnp.asarray(q[:1024])
    tc = jnp.asarray(tgt[:8192])
    tcm = jnp.asarray(np.ones(8192, bool))
    timeit("corner unsorted", knn, qc, tc, tcm)

    def knn_sortq_c(acc, q, t, m):
        qk, _ = voxel_keys(q + acc, 0.2, 102.4)
        order = jnp.argsort(qk)
        idx, d = pallas_topk_l2(q[order], t, m, k=5)
        inv = jnp.argsort(order)
        return acc + d[inv][0, 0] * 0.0

    timeit("corner sorted  ", knn_sortq_c, qc, tc, tcm)


if __name__ == "__main__":
    main()

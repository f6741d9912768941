"""Voxel-hash NN correctness vs brute force."""

import numpy as np
import jax.numpy as jnp

from lego_loam_tpu.ops.hashgrid import build_grid, query_knn
from lego_loam_tpu.ops.knn import pairwise_sqdist


def test_knn_matches_bruteforce_within_cell():
    rs = np.random.RandomState(0)
    T, Q, k = 20000, 300, 5
    pts = rs.uniform(-8, 8, (T, 3)).astype(np.float32)
    mask = np.ones(T, bool)
    mask[::11] = False
    q = (pts[rs.choice(T, Q)] + rs.randn(Q, 3) * 0.2).astype(np.float32)

    grid = build_grid(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    idx, d2 = query_knn(
        grid, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(q),
        jnp.ones(Q, bool), k,
    )
    idx = np.asarray(idx)
    d2 = np.asarray(d2)

    bf = np.array(pairwise_sqdist(jnp.asarray(q), jnp.asarray(pts)))
    bf[:, ~mask] = 1e30
    bf_sorted = np.sort(bf, axis=1)[:, :k]

    # Wherever the true 5th NN is within the 1 m gate the mapping uses, the
    # grid must return the same distances.
    gate = bf_sorted[:, -1] < 1.0
    assert gate.sum() > 50  # the test actually exercises the claim
    # Recall-style check: slot eviction may drop a true neighbor for a tiny
    # fraction of queries; everything else must match brute force (the two
    # d2 formulas differ by float32 cancellation noise ~1e-4).
    close = np.abs(d2[gate] - bf_sorted[gate]) < 1e-3
    recall = close.all(axis=1).mean()
    assert recall > 0.98, f"5-NN recall {recall:.3f}"
    # Returned indices are valid, unmasked points
    found = idx[gate]
    assert (found >= 0).all()
    assert mask[found].all()


def test_masked_points_never_returned():
    rs = np.random.RandomState(1)
    pts = rs.uniform(-5, 5, (500, 3)).astype(np.float32)
    mask = np.zeros(500, bool)
    mask[:10] = True  # only 10 valid points
    q = pts[:20].copy()
    grid = build_grid(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    idx, d2 = query_knn(
        grid, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(q),
        jnp.ones(20, bool), 5,
    )
    idx = np.asarray(idx)
    ok = idx >= 0
    assert mask[idx[ok]].all()

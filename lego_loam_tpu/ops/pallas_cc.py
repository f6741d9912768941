"""Pallas TPU kernel: connected-components label propagation in VMEM.

The XLA formulation of the range-image connected components
(`segmentation.py::converged_labels`) is op-count bound: each run-min sweep
is ~130 small (16, 1800) ops through HBM, and the root-hooking step that
keeps the iteration count low needs a scatter-min that XLA lowers through a
hidden sort. This kernel instead runs the whole fixpoint inside VMEM — the
grid is only ~120 KB, so all 4 connectivity masks, the candidate mask and
the label image stay resident, and a sweep is ~30 register-level
doubling steps (Hillis-Steele segmented run-min via `pltpu.roll`).

Semantics match `converged_labels` exactly (same oracle-verified partition):
4-neighbor connectivity with wrap-around columns; labels are row-major pixel
indices (root = component minimum), H*W for non-candidates.

Layout: W is padded to a lane multiple (1800 -> 1920). Pad columns carry no
connectivity, and circular rolls stay sound because any doubling window that
crosses the pad contains a zero connectivity flag, which zeroes the
accumulated reach mask (F) for that window. The true column wrap (1799 <-> 0)
is applied once per sweep as an explicit min-exchange through a
`roll(Wp - W + 1)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cc_kernel(l_ref, r_ref, u_ref, d_ref, cand_ref, out_ref, *, H, W, Wp,
               max_iters):
    BIG = jnp.int32(H * W)
    cand = cand_ref[:] > 0
    col = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 0)
    lab0 = jnp.where(cand, row * W + col, BIG)

    incol = (col > 0).astype(jnp.int32)
    Lw = l_ref[:]  # col 0 entry = wrap edge (outside convention)
    Rw = r_ref[:]  # col W-1 entry = wrap edge
    L = Lw * incol  # linear-run connectivity (no wrap)
    R = Rw * jnp.where(col < W - 1, 1, 0)
    U = u_ref[:]
    D = d_ref[:]
    at0 = (col == 0).astype(jnp.int32)
    atW = (col == W - 1).astype(jnp.int32)

    dims = (H, Wp)

    def roll(x, shift, axis):
        # pltpu.roll requires a non-negative shift
        return pltpu.roll(x, shift=shift % dims[axis], axis=axis)

    def run_min(A, F, axis, sign, nsteps):
        """Segmented run-min by doubling: A[p] <- min over the maximal
        connected run behind p (direction = sign along axis)."""
        d = 1
        for _ in range(nsteps):
            A_s = roll(A, sign * d, axis)
            F_s = roll(F, sign * d, axis)
            A = jnp.where(F > 0, jnp.minimum(A, A_s), A)
            F = F * F_s
            d *= 2
        return A

    def sweep(lab):
        m = run_min(lab, L, axis=1, sign=1, nsteps=11)
        m = run_min(m, R, axis=1, sign=-1, nsteps=11)
        # explicit wrap min-exchange: col 0 <- col W-1, col W-1 <- col 0
        k = Wp - W + 1
        from_last = roll(m, k, 1)
        m = jnp.where((Lw * at0) > 0, jnp.minimum(m, from_last), m)
        from_first = roll(m, -k, 1)
        m = jnp.where((Rw * atW) > 0, jnp.minimum(m, from_first), m)
        m = run_min(m, U, axis=0, sign=1, nsteps=4)
        m = run_min(m, D, axis=0, sign=-1, nsteps=4)
        return jnp.where(cand, m, BIG)

    def cond(state):
        i, _, changed = state
        return jnp.logical_and(i < max_iters, changed)

    def body(state):
        i, lab, _ = state
        new = sweep(lab)
        return i + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lab0, jnp.bool_(True))
    )
    out_ref[:] = lab


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def pallas_label_prop(left, right, up, down, candidate, max_iters=64,
                      interpret=False):
    """(H, W) bool connectivity (wrap edges at cols 0 / W-1, outside
    convention) + candidate mask -> (H, W) int32 converged labels
    (row-major root pixel index; H*W for non-candidates)."""
    H, W = candidate.shape
    Wp = ((W + 127) // 128) * 128

    def pad(x):
        return jnp.pad(x.astype(jnp.int32), ((0, 0), (0, Wp - W)))

    kernel = functools.partial(
        _cc_kernel, H=H, W=W, Wp=Wp, max_iters=max_iters
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, Wp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pad(left), pad(right), pad(up), pad(down), pad(candidate))
    return out[:, :W]

"""In-jit chained micro-benchmark harness for the relay-attached TPU.

Per-call dispatch on the relay costs ~1-2 ms, so any op faster than that
must be timed by chaining N dependent evaluations inside ONE jitted
program (fori_loop with the measured op in the body, a scalar carry
perturbing the inputs to defeat CSE/hoisting) and dividing.

Usage:
    from tools.microbench import chain_time
    chain_time("label", op_fn, args..., n=50)
where op_fn(acc, *args) -> scalar contribution (will be added to carry).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def chain_time(label, op, *args, n=50, reps=3):
    """op(acc, *args) -> new scalar; runs n chained evals inside one jit."""

    @jax.jit
    def run(acc0, *args):
        def body(_, acc):
            return op(acc, *args)

        return jax.lax.fori_loop(0, n, body, acc0)

    out = run(jnp.float32(0.0), *args)
    jax.device_get(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(jnp.float32(0.0), *args)
        jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - 1.5) / n  # subtract ~1.5ms dispatch floor
    print(f"{label}: {ms:.3f} ms  (chain of {n}, best of {reps})", flush=True)
    return ms

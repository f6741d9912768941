"""Weak-scaling proxy for the distributed pose-graph solve on the virtual
CPU mesh (the 2-host ICI measurement is hardware-blocked; VERDICT round-1
§Next-round #5 asks for this stand-in).

For device counts 1/2/4/8 (factors scaled proportionally — weak scaling),
reports per-solve step time and the collective traffic of one solve,
extracted from the compiled HLO (all-reduce/all-gather operand bytes).
Writes WEAK_SCALING.json.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/weak_scaling.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

# The environment's sitecustomize force-registers the TPU backend; the env
# var alone is ignored — switch through jax.config.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lego_loam_tpu.config import vlp16
from lego_loam_tpu.distributed import make_mesh, sharded_pose_graph_solver
from lego_loam_tpu.posegraph import Factors

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "bf16": 2,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def collective_bytes(compiled_text: str) -> dict:
    """Sum operand bytes of collectives in the optimized HLO."""
    out = {}
    pat = re.compile(
        r"(\w+) = (\w+)\[([\d,]*)\][^=]*?(all-reduce|all-gather|"
        r"collective-permute|reduce-scatter|all-to-all)\("
    )
    for m in pat.finditer(compiled_text):
        dt, shape, kind = m.group(2), m.group(3), m.group(4)
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        out[kind] = out.get(kind, 0) + n * _DTYPE_BYTES.get(dt, 4)
    return out


def graph_problem(N, F, seed=0):
    rs = np.random.RandomState(seed)
    yaw = np.linspace(0, 2 * np.pi, N).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.zeros((N, 3, 3), np.float32)
    R[:, 0, 0] = c
    R[:, 0, 1] = -s
    R[:, 1, 0] = s
    R[:, 1, 1] = c
    R[:, 2, 2] = 1.0
    t = np.stack([np.sin(yaw) * 3, 1 - np.cos(yaw) * 3, 0 * yaw], axis=1)
    t_noisy = (t + rs.randn(N, 3) * 0.05).astype(np.float32)
    fi = (np.arange(F, dtype=np.int32) % (N - 1))
    fj = fi + 1
    Rm = np.einsum("fab,fbc->fac", R[fi].transpose(0, 2, 1), R[fj])
    tm = np.einsum("fab,fb->fa", R[fi].transpose(0, 2, 1), t[fj] - t[fi])
    return R, t_noisy, dict(
        i=fi, j=fj, R=Rm.astype(np.float32), t=tm.astype(np.float32),
        info=np.full((F, 6), 1e4, np.float32), mask=np.ones((F,), bool),
    )


def main():
    cfg = vlp16()
    results = []
    base_F = 512  # factors per device (weak scaling)
    N = 256  # poses (replicated)
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = make_mesh(ndev)
        solver = sharded_pose_graph_solver(mesh, cfg)
        F = base_F * ndev
        R, t_noisy, f_np = graph_problem(N, F)
        shard = NamedSharding(mesh, P(("graph", "map")))
        rep = NamedSharding(mesh, P())
        factors = Factors(
            i=jax.device_put(f_np["i"], shard),
            j=jax.device_put(f_np["j"], shard),
            R=jax.device_put(f_np["R"], shard),
            t=jax.device_put(f_np["t"], shard),
            info=jax.device_put(f_np["info"], shard),
            mask=jax.device_put(f_np["mask"], shard),
        )
        args = (
            jax.device_put(R, rep), jax.device_put(t_noisy, rep),
            factors, jax.device_put(np.ones((N,), bool), rep),
        )
        lowered = solver.lower(*args)
        comp = lowered.compile()
        coll = collective_bytes(comp.as_text())

        out = solver(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = solver(*args)
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        rec = {
            "devices": ndev,
            "factors": F,
            "poses": N,
            "solve_ms": round(ms, 2),
            "factors_per_ms": round(F / ms, 1),
            "collective_bytes_per_solve": coll,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if len(results) > 1:
        eff = (
            results[-1]["factors_per_ms"] / results[0]["factors_per_ms"]
        )
        print(f"weak-scaling throughput ratio {results[-1]['devices']}dev / "
              f"1dev = {eff:.2f}")
    with open("WEAK_SCALING.json", "w") as f:
        json.dump({"results": results}, f, indent=1)


if __name__ == "__main__":
    main()

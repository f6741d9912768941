"""Child worker for the multi-process pose-graph test (see
tests/test_multihost.py and lego_loam_tpu/launch.py).

Run modes:
  --single           : plain single-process run on the local CPU devices
  (default)          : join the distributed runtime via env vars

Solves the same noisy circle pose graph either way and writes the corrected
translations to --out as .npy (process 0 only in distributed mode).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if not args.single:
        from lego_loam_tpu.launch import init_from_args

        init_from_args()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lego_loam_tpu.config import vlp16
    from lego_loam_tpu.distributed import make_mesh, sharded_pose_graph_solver
    from lego_loam_tpu.posegraph import Factors

    cfg = vlp16()
    mesh = make_mesh()
    ndev = mesh.devices.size

    # noisy circle with a loop-closure factor (deterministic)
    N = 64
    F = 16 * ndev if not args.single else 128
    F = 128  # same factor set in both modes for comparability
    rs = np.random.RandomState(0)
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
    f_np = dict(
        i=fi, j=fj, R=Rm.astype(np.float32), t=tm.astype(np.float32),
        info=np.full((F, 6), 1e4, np.float32), mask=np.ones((F,), bool),
    )

    solver = sharded_pose_graph_solver(mesh, cfg)
    shard = NamedSharding(mesh, P(("graph", "map")))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        if args.single:
            return jax.device_put(jnp.asarray(x), sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    factors = Factors(
        i=put(f_np["i"], shard), j=put(f_np["j"], shard),
        R=put(f_np["R"], shard), t=put(f_np["t"], shard),
        info=put(f_np["info"], shard), mask=put(f_np["mask"], shard),
    )
    Rout, tout = solver(
        put(R, rep), put(t_noisy, rep), factors, put(np.ones((N,), bool), rep)
    )
    t_host = np.asarray(
        jax.device_get(tout.addressable_data(0))
        if not args.single
        else jax.device_get(tout)
    )
    pid = jax.process_index()
    if pid == 0:
        np.save(args.out, t_host)
    print(f"process {pid}/{jax.process_count()} devices={ndev} ok")


if __name__ == "__main__":
    main()

"""Full-pipeline checkpoint/resume.

The reference's only persistence is the /save_map PCD dump + HighDense map
reload (`mapOptmization.cpp:344-434`, `publishHighDenseMap.cpp`) — a crash
restarts from an empty map (SURVEY.md §5). Here the complete SLAM state
(front-end odometry state, device keyframe store, loop factors, frame
counter) round-trips through one compressed npz, so a run can resume
mid-trajectory. Map products (PCDs, trajectory) are separate, via
`pipeline.save_artifacts` + `io/pcd.py`.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax

from .backend import BackendState
from .pipeline import LegoLoamPipeline, LoopFactor
from .types import FeatureCloud, OdometryState


def _flatten(prefix, tree):
    out = {}
    leaves, treedef = jax.tree.flatten(tree)
    host = jax.device_get(leaves)
    for i, leaf in enumerate(host):
        out[f"{prefix}{i}"] = np.asarray(leaf)
    return out, treedef


def save(pipe: LegoLoamPipeline, path: str):
    fs, fs_def = _flatten("f", pipe.fstate)
    bs, bs_def = _flatten("b", pipe.bstate)
    meta = {
        "frame_idx": pipe.frame_idx,
        "loop_factors": [
            {
                "i": f.i,
                "j": f.j,
                "R": f.R.tolist(),
                "t": f.t.tolist(),
                "fitness": f.fitness,
            }
            for f in pipe.loop_factors
        ],
    }
    np.savez_compressed(
        path, __meta__=json.dumps(meta), **fs, **bs
    )


def load(pipe: LegoLoamPipeline, path: str) -> LegoLoamPipeline:
    """Restore state saved by `save` into a freshly constructed pipeline
    (must use the same config)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))

    def unflatten(prefix, template):
        leaves, treedef = jax.tree.flatten(template)
        new = [data[f"{prefix}{i}"] for i in range(len(leaves))]
        for a, b in zip(leaves, new):
            assert a.shape == b.shape, (a.shape, b.shape)
        return jax.tree.unflatten(treedef, [np.asarray(x) for x in new])

    pipe.fstate = unflatten("f", pipe.fstate)
    pipe.bstate = unflatten("b", pipe.bstate)
    if pipe._mesh is not None and pipe.cfg.distributed.shard_backend:
        from .distributed import shard_backend_state

        pipe.bstate = shard_backend_state(pipe._mesh, pipe.bstate)
    pipe.frame_idx = int(meta["frame_idx"])
    pipe._idx_dev = None  # chunk runner's device counter re-syncs lazily
    pipe.loop_factors = [
        LoopFactor(
            i=int(f["i"]),
            j=int(f["j"]),
            R=np.asarray(f["R"], np.float32),
            t=np.asarray(f["t"], np.float32),
            fitness=float(f["fitness"]),
        )
        for f in meta["loop_factors"]
    ]
    pipe._sync_loop_buf()  # device loop-factor buffer mirrors the host list
    return pipe

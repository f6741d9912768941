"""Multi-host launch helpers (new capability; the reference is single-process,
single-machine — SURVEY.md §2.2 "Distributed execution: None").

Two pieces:

- `init_from_args(...)`: join the JAX distributed runtime (thin wrapper over
  `distributed.init_distributed`) — call before building any pipeline so
  `jax.devices()` spans all hosts and `make_mesh` builds a global mesh.
- `spawn_local(...)`: development launcher that runs N copies of a script as
  separate OS processes on ONE machine, each a distinct JAX process with its
  own CPU device set, wired to a shared coordinator. This is how the
  multi-process path is tested without multi-host hardware (JAX's documented
  single-machine multi-process simulation).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys


def init_from_args(coordinator=None, num_processes=None, process_id=None):
    """Join the distributed runtime; unset arguments fall back to the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    (set by spawn_local) and then to JAX's own cluster auto-detection."""
    from .distributed import init_distributed

    if coordinator is None:
        coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    init_distributed(coordinator, num_processes, process_id)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def spawn_local(
    script: str,
    n_processes: int,
    devices_per_process: int = 4,
    extra_args=(),
    timeout: float = 600.0,
):
    """Run `script` as n_processes JAX processes on this machine (CPU
    backend, devices_per_process virtual devices each). The script receives
    the coordinator address / process count / process id via the standard
    JAX env vars and should call `launch.init_from_args()` (no arguments).

    Returns the list of completed subprocess results (raises on nonzero)."""
    port = _free_port()
    procs = []
    for pid in range(n_processes):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "").replace(
                    "--xla_force_host_platform_device_count=8", ""
                )
                + f" --xla_force_host_platform_device_count={devices_per_process}"
            ).strip(),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(n_processes),
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, script, *extra_args],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"process {pid} exited {p.returncode}:\n{out[-4000:]}"
            )
        results.append(out)
    return results

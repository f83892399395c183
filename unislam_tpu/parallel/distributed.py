"""Multi-host wiring: `jax.distributed` initialization + global meshes.

The reference's entire "distributed" story is two processes sharing CUDA
memory on one box (/root/reference/src/UNISLAM.py:90-137) — nothing spans
hosts. The TPU-native story (SURVEY.md §2.3): one controller process per
host, `jax.distributed.initialize` rendezvous over DCN, a single global
device mesh spanning every chip of every host; gradient all-reduces ride
ICI inside a slice, DCN carries only host coordination.

Environment contract (standard cluster launchers can set these; on Cloud
TPU pods `jax.distributed.initialize()` auto-detects and none are needed):

    UNISLAM_COORDINATOR   host:port of process 0        (e.g. 10.0.0.2:8476)
    UNISLAM_NUM_PROCESSES total process count
    UNISLAM_PROCESS_ID    this process's rank

CPU simulation (tests/test_multihost.py): the same wiring runs N processes
x M virtual CPU devices with gloo collectives — set
`XLA_FLAGS=--xla_force_host_platform_device_count=M`, `JAX_PLATFORMS=cpu`
per process and point every process at one coordinator.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unislam_tpu.parallel.sharding import RAY_AXIS

_initialized = False


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or UNISLAM_* env vars.

    Returns the process id (0 for the single-process case). Safe to call
    twice (second call is a no-op). On CPU backends selects the gloo
    cross-process collectives implementation.
    """
    global _initialized
    coordinator = coordinator or os.environ.get("UNISLAM_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("UNISLAM_NUM_PROCESSES", "0")) \
            or None
    if process_id is None:
        pid_env = os.environ.get("UNISLAM_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None

    if coordinator is None and num_processes is None:
        return 0  # single process, nothing to do
    if _initialized:
        return jax.process_index()

    try:
        # CPU multi-process collectives need gloo (no-op on TPU backends)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_index()


def global_ray_mesh() -> Mesh:
    """1-D ('rays',) mesh over EVERY device of EVERY process. On a TPU pod
    slice jax.devices() is ICI-ordered, so neighbouring shards are
    ICI-neighbours and the gradient psum never leaves the slice."""
    return Mesh(np.asarray(jax.devices()), (RAY_AXIS,))


def host_ray_mesh() -> Mesh:
    """2-D ('hosts', 'rays') mesh: rays sharded within a host's chips,
    host axis available for batch-level parallelism (e.g. eval rendering
    row-sharding across hosts)."""
    n_proc = jax.process_count()
    devs = np.asarray(jax.devices()).reshape(n_proc, -1)
    return Mesh(devs, ("hosts", RAY_AXIS))


def replicate(mesh: Mesh, tree):
    """device_put every leaf fully-replicated on the global mesh. All
    processes must pass identical host values (the standard single-
    controller-per-host contract)."""
    s = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(np.asarray(x), s)

    return jax.tree_util.tree_map(put, tree)


def fetch_replicated(x) -> np.ndarray:
    """Host value of a fully-replicated global array (first local shard)."""
    return np.asarray(x.addressable_data(0))

"""Device-mesh utilities for multi-chip scale-out.

The reference is a single-GPU three-process system; its only "distribution"
is shared memory (SURVEY.md §2.4). The TPU framework scales instead via
``jax.sharding``: a 1-D mesh whose ``edge`` axis shards data-parallel work —
candidate-edge decoding (each loop-closure edge's two-view inference is
independent) and per-edge Hessian accumulation in global BA — with XLA
collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host bring-up via ``jax.distributed.initialize``.

    SURVEY.md §5.8: the reference's torch.multiprocessing shared-memory
    backend maps to single-controller JAX per host + jax.distributed across
    hosts; after initialize, ``jax.devices()`` spans the whole slice and
    every mesh built here carries collectives over ICI within a host and
    DCN across. Reads SLAM_COORDINATOR / SLAM_NUM_PROCESSES /
    SLAM_PROCESS_ID when args are omitted; no-op (returns False) for
    single-process runs so callers can invoke it unconditionally.
    """
    import os

    if num_processes is None:
        num_processes = int(os.environ.get("SLAM_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ["SLAM_COORDINATOR"],
        num_processes=num_processes,
        process_id=(process_id if process_id is not None
                    else int(os.environ["SLAM_PROCESS_ID"])),
    )
    return True


def make_mesh(n_devices: int | None = None, axis: str = "edge") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(axes=("host", "edge")) -> Mesh:
    """(n_hosts, chips_per_host) mesh: shard BA edges over the fast axis
    (``edge`` -> ICI) and keyframe/data parallelism over hosts (DCN)."""
    n_hosts = jax.process_count()
    devs = np.asarray(jax.devices()).reshape(n_hosts, -1)
    return Mesh(devs, axes)


def shard_edges(mesh: Mesh, *arrays, axis: str = "edge"):
    """Place arrays with their leading (edge/batch) dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    sharding = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sharding) for a in arrays)


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=0):
    """Pad ``axis`` up to a multiple (sharded dims must divide the mesh)."""
    import jax.numpy as jnp

    n = arr.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(arr, pads, constant_values=fill)

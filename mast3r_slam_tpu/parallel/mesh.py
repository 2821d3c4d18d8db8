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


def make_mesh(n_devices: int | None = None, axis: str = "edge") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


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

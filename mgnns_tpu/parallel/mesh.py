"""Mesh construction and sharded batch placement.

The flagship layout is a 2-D ``('data', 'model')`` mesh over ICI: batches
shard over 'data'; the large text-graph tables and wide projections shard
over 'model'.  The reference has no distributed path at all (DataParallel is
commented out, ``engine/...:365``), so this subsystem is greenfield —
expressed entirely through ``jax.sharding`` + jit so XLA inserts all
collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh from the first data*model devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


# batch fields whose leading axis is the batch dimension
_BATCH_FIELDS = {
    "ids", "lens", "mask", "eids", "label", "weight", "sample_index", "image",
}


def batch_device_put(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh: batch-dim fields sharded over 'data',
    everything else (graph constants) replicated."""
    out = {}
    for k, v in batch.items():
        if k in _BATCH_FIELDS:
            spec = P("data", *([None] * (np.ndim(v) - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out

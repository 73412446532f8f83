"""Multi-host (multi-process) SPMD support.

A v5e pod slice beyond 8 chips spans multiple hosts, each running one
process that owns a subset of the chips.  The reference is strictly
single-GPU (SURVEY §2: no torch.distributed anywhere); this subsystem is
greenfield and follows the standard JAX multi-controller recipe:

1. every process calls :func:`initialize` (JAX coordination service over
   DCN; a no-op when single-process),
2. the mesh is built over ``jax.devices()`` — the GLOBAL device list,
3. each host loads only its shard of the batch
   (:func:`process_batch_slice`), and
4. :func:`host_local_to_global` assembles per-host arrays into global
   jax.Arrays with the batch sharded over the mesh's 'data' axis, so the
   jitted train step is identical single-host and multi-host.

Collectives ride ICI within a slice; XLA routes cross-slice traffic over
DCN.  No hand-written transport anywhere.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the JAX distributed runtime.

    With no arguments, reads the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``;
    on Cloud TPU VMs ``jax.distributed.initialize()`` autodetects from
    metadata) and is a NO-OP when neither arguments nor env are present —
    single-process runs need no coordination service.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_batch_slice(n_samples: int, batch_size: int) -> tuple[int, int, int]:
    """(start, stop, per_host_batch) — this process's contiguous sample range
    and its share of the global batch.

    The global batch must divide by the process count; each host assembles
    ``batch_size // process_count`` samples per step.  Sample ranges are
    balanced to within one sample (the first ``n % p`` hosts get the extra).
    """
    p = jax.process_count()
    i = jax.process_index()
    if batch_size % p:
        raise ValueError(f"process count {p} must divide global batch {batch_size}")
    base, extra = divmod(n_samples, p)
    start = i * base + min(i, extra)
    stop = start + base + (1 if i < extra else 0)
    return start, stop, batch_size // p


def epoch_num_batches(n_samples: int, batch_size: int) -> int:
    """Per-epoch batch count, IDENTICAL on every host.

    Sample ranges are balanced only to within one sample, so hosts can have
    different natural batch counts (N=101, p=2, B=50: host0 has 3, host1
    has 2) — in SPMD the host running the extra step would block forever in
    its collectives.  Pass this as ``DeviceLoader(num_batches=...)``: short
    hosts emit all-padding (``weight`` 0) batches for the tail steps, so
    every host executes the same global program the same number of times.
    """
    p = jax.process_count()
    per_host_batch = batch_size // p
    base, extra = divmod(n_samples, p)
    max_host_n = base + (1 if extra else 0)
    return max(1, (max_host_n + per_host_batch - 1) // per_host_batch)


def host_local_to_global(batch: dict, mesh: Mesh, batch_fields: set[str]) -> dict:
    """Assemble per-host numpy batch shards into global jax.Arrays.

    ``batch_fields`` entries are this host's rows of the global batch (all
    hosts together form the full batch, sharded over 'data'); everything
    else must be identical on every host and is replicated.
    """
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in batch_fields:
            spec = P("data", *([None] * (v.ndim - 1)))
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), v
            )
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out

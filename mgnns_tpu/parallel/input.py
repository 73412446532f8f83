"""SPMD input plans: device-resident data tables sharded over the mesh.

The single-chip fast path keeps a split's text/pixel tensors resident in HBM
as [N, ...] tables and gathers each batch on device by sample index
(``data/loader.py``).  This module makes that path work under a
``('data', 'model')`` mesh — single-process multi-device and multi-process —
so sharded runs get the same zero-per-step-H2D input pipeline instead of
falling back to per-batch host uploads (the round-3 bottleneck: 85.9 vs
1,068.6 samples/s on one chip).

Design (all collectives via XLA; the gather itself is collective-FREE):

- every **data-axis position** ``d`` owns a fixed subset of samples, assigned
  round-robin within each process's contiguous record slice (sample ``j`` of
  a process with positions ``[p0..p0+k)`` goes to position ``p0 + j % k``,
  local row ``j // k``);
- tables are stored **position-major**: global array ``[D*S, ...]`` sharded
  ``P('data', ...)``, so the device(s) at position ``d`` hold exactly rows
  ``[d*S, (d+1)*S)`` — their own samples, padded to the uniform shard size
  ``S``;
- an epoch is a ``[num_batches, B]`` index matrix whose column block for
  position ``d`` contains **position-local row ids**; placed sharded
  ``P(None, 'data')``, each scan step hands every device its own index block
  and the batch gather runs entirely shard-locally via ``shard_map``
  (measured semantics probed in ``tests/test_input_plan.py``);
- epoch metrics are batch-composition-invariant (the confusion matrix and
  the weight-aggregated loss sum over samples), so a sharded epoch's metrics
  equal the single-device epoch's even though batches interleave positions.

The reference has no input pipeline beyond ``torch.utils.data.DataLoader``
workers (``engine/Multi_GCN_Multihead_Att_engine.py:329-342``) and no
distributed path at all; this subsystem is greenfield.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class InputPlan:
    """Static sample-to-shard assignment for one dataset split on one mesh."""

    mesh: Mesh
    D: int                        # global data-axis size
    S: int                        # uniform padded rows per data position
    Bd: int                       # batch slots per data position
    num_batches: int              # epoch length in global batches
    n_global: int                 # real samples across all processes
    position_valid: np.ndarray    # [D] real row count of every position
    local_positions: np.ndarray   # sorted data-axis positions of this process
    local_rows: np.ndarray        # [D_local, S] dataset-LOCAL row ids, -1 pad

    @property
    def batch_size(self) -> int:
        return self.D * self.Bd

    @property
    def table_rows(self) -> int:
        """Global padded table length (leading dim of every sharded table)."""
        return self.D * self.S

    def local_table_rows(self) -> np.ndarray:
        """[D_local*S] dataset-local row id per local table row (pads clamped
        to row 0 — never addressed with nonzero weight)."""
        flat = self.local_rows.reshape(-1)
        return np.where(flat < 0, 0, flat)

    def batch_weight_sums(self) -> np.ndarray:
        """[num_batches] GLOBAL valid-sample count of every batch — identical
        on every process (derived from position_valid, not local data), so
        multihost loss aggregation needs no cross-host exchange."""
        b = np.arange(self.num_batches)[:, None]
        return np.clip(self.position_valid[None, :] - b * self.Bd,
                       0, self.Bd).sum(axis=1).astype(np.float64)


def _position_process(grid_row) -> int:
    """The process owning one data-axis position (all of its devices)."""
    procs = {dev.process_index for dev in np.asarray(grid_row).reshape(-1)}
    if len(procs) != 1:
        raise ValueError(
            f"a data-axis position spans processes {sorted(procs)}; "
            "sharded input tables need each data position on one process "
            "(put 'data' outermost in the mesh)")
    return procs.pop()


def _round_robin_counts(n: int, k: int) -> np.ndarray:
    """Real row count per position when ``n`` samples round-robin over ``k``
    positions (position i gets ceil((n - i) / k))."""
    i = np.arange(k)
    return np.maximum(0, -(-(n - i) // k))


def make_input_plan(mesh: Mesh, n_local: int, per_host_batch: int,
                    *, n_global: int | None = None) -> InputPlan:
    """Build the sample-to-shard assignment.

    ``n_local`` is this process's record count (its contiguous slice under
    multihost, the whole split single-process); ``per_host_batch`` this
    process's share of the global batch.  ``n_global`` must be the global
    split size under multihost (``dataset.global_len``) so padded shard
    sizes and epoch lengths agree across processes.
    """
    if "data" not in mesh.axis_names:
        raise ValueError(f"mesh has no 'data' axis: {mesh.axis_names}")
    D = mesh.shape["data"]
    # device grid transposed so the leading index is the data position
    axis = mesh.axis_names.index("data")
    grid = np.moveaxis(mesh.devices, axis, 0)
    proc_of = [_position_process(grid[d]) for d in range(D)]
    me = jax.process_index()
    local_positions = np.array([d for d in range(D) if proc_of[d] == me])
    dpp = len(local_positions)
    if dpp == 0:
        raise ValueError(f"process {me} owns no data-axis positions")
    if np.any(np.diff(local_positions) != 1):
        raise ValueError(
            f"process {me}'s data positions {local_positions.tolist()} are "
            "not contiguous; jax.make_array_from_process_local_data needs "
            "one contiguous global slice per process")
    if per_host_batch % dpp:
        raise ValueError(
            f"per-host batch {per_host_batch} must divide by this process's "
            f"{dpp} data-axis positions")
    Bd = per_host_batch // dpp

    n_global = n_local if n_global is None else n_global
    # every process's position_valid, derived purely from global facts
    # (global N, the balanced contiguous record split, the mesh layout) —
    # identical on every controller
    position_valid = np.zeros(D, np.int64)
    nproc = jax.process_count()
    base, extra = divmod(n_global, nproc)
    for q in range(nproc):
        q_positions = [d for d in range(D) if proc_of[d] == q]
        if not q_positions:
            continue
        n_q = base + (1 if q < extra else 0)
        position_valid[q_positions] = _round_robin_counts(n_q, len(q_positions))
    if jax.process_count() == 1 and n_local != n_global:
        # single-process caller with a pre-sliced dataset: trust n_local
        position_valid = _round_robin_counts(n_local, D)

    S = int(position_valid.max())
    S = max(S, 1)
    num_batches = max(1, -(-S // Bd))

    # this process's dataset-local row map: local sample j -> position
    # local_positions[j % dpp], row j // dpp
    local_rows = np.full((dpp, S), -1, np.int64)
    for k in range(dpp):
        rows = np.arange(k, n_local, dpp)
        local_rows[k, : len(rows)] = rows
    expect = position_valid[local_positions]
    got = (local_rows >= 0).sum(axis=1)
    if not np.array_equal(got, expect):
        raise ValueError(
            f"local sample count {n_local} disagrees with the global split: "
            f"per-position counts {got.tolist()} != expected {expect.tolist()} "
            "(pass the dataset's global_len as n_global)")

    return InputPlan(
        mesh=mesh, D=D, S=S, Bd=Bd, num_batches=num_batches,
        n_global=n_global, position_valid=position_valid,
        local_positions=local_positions, local_rows=local_rows,
    )


# ------------------------------------------------------------------ placement

def _named(mesh: Mesh, *names) -> NamedSharding:
    return NamedSharding(mesh, P(*names))


def shard_table(plan: InputPlan, local_array: np.ndarray) -> jax.Array:
    """Place this process's position-major table rows ``[D_local*S, ...]`` as
    a global ``[D*S, ...]`` array sharded ``P('data', ...)``."""
    spec = _named(plan.mesh, "data", *([None] * (local_array.ndim - 1)))
    if jax.process_count() == 1:
        return jax.device_put(local_array, spec)
    global_shape = (plan.table_rows,) + local_array.shape[1:]
    return jax.make_array_from_process_local_data(spec, local_array, global_shape)


def shard_epoch_matrix(plan: InputPlan, local_mat: np.ndarray) -> jax.Array:
    """Place this process's epoch column block ``[num_batches, D_local*Bd]``
    as a global ``[num_batches, B]`` array sharded ``P(None, 'data')`` —
    each scan step then hands every device its own index/weight block."""
    spec = _named(plan.mesh, None, "data")
    if jax.process_count() == 1:
        return jax.device_put(local_mat, spec)
    # rows may exceed plan.num_batches when the caller padded the epoch to a
    # forced step count; columns are always this process's block of B
    global_shape = (local_mat.shape[0], plan.batch_size)
    return jax.make_array_from_process_local_data(spec, local_mat, global_shape)


def host_local_columns(arr: jax.Array) -> np.ndarray:
    """This process's column block of a ``P(None, 'data')``-sharded
    ``[num_batches, B]`` result (e.g. fused-epoch preds), reassembled in
    ascending column order.  Single-process this is the whole matrix."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[1].start or 0)
    cols, seen = [], set()
    for s in shards:
        start = s.index[1].start or 0
        if start in seen:  # replicas over 'model'
            continue
        seen.add(start)
        cols.append(np.asarray(s.data))
    return np.concatenate(cols, axis=1)


# -------------------------------------------------------------- epoch indices

def epoch_index_plan(plan: InputPlan, epoch: int, seed: int, shuffle: bool):
    """(idx, weight, rows): this process's epoch column blocks, all
    ``[num_batches, D_local*Bd]``.

    ``idx`` holds POSITION-LOCAL row ids (into the S-row table shard);
    ``weight`` marks real samples; ``rows`` maps back to dataset-local row
    ids (pads -> 0, masked by weight) for labels/prediction dumps.
    Shuffling permutes WITHIN each position with a per-(epoch, position)
    stream, so order is deterministic and process-independent.
    """
    dpp = len(plan.local_positions)
    nb, Bd = plan.num_batches, plan.Bd
    idx = np.zeros((nb, dpp * Bd), np.int32)
    wt = np.zeros((nb, dpp * Bd), np.float32)
    rows = np.zeros((nb, dpp * Bd), np.int64)
    for k, d in enumerate(plan.local_positions):
        n_d = int(plan.position_valid[d])
        order = np.arange(n_d)
        if shuffle and n_d > 1:
            np.random.default_rng((seed + epoch, int(d))).shuffle(order)
        padded = np.zeros(nb * Bd, np.int64)
        padded[:n_d] = order
        block = slice(k * Bd, (k + 1) * Bd)
        idx[:, block] = padded.reshape(nb, Bd)
        w = (np.arange(nb * Bd) < n_d).astype(np.float32)
        wt[:, block] = w.reshape(nb, Bd)
        rows[:, block] = plan.local_rows[k][padded].clip(min=0).reshape(nb, Bd)
    return idx, wt, rows


# ----------------------------------------------------------------- the gather

def table_row_gather(tables: dict, idx, row_shapes: dict) -> dict:
    """Batch-gather rows ``idx`` from every table, via the 2D-reshaped form:
    XLA:TPU lowers the native N-d row gather ~4x slower for large rows
    (27.3 vs 7.1 ms for 128 rows of 448px uint8); the small-table reshapes
    are free inside the program, and flat-stored tables (``row_shapes``,
    mapping key -> logical per-row shape — see ``data/loader._take_rows``)
    skip the reshape entirely.  Shared by the single-device fused epoch
    (``engine/train.py``) and the shard-local body below."""
    out = {}
    for k, v in tables.items():
        flat = v if k in row_shapes else v.reshape(v.shape[0], -1)
        taken = jnp.take(flat, idx, axis=0)
        shape = tuple(row_shapes.get(k, v.shape[1:]))
        out[k] = taken.reshape((idx.shape[0],) + shape)
    return out


def sharded_gather_fn(mesh: Mesh, row_shapes: dict):
    """A batch-gather for ``P('data', ...)``-sharded tables, collective-free:
    ``shard_map`` hands every device its table shard plus its index block and
    the take runs locally; outputs come back batch-sharded over 'data' —
    exactly the layout ``parallel.mesh.batch_device_put`` produces, so the
    downstream jitted step is identical to the streaming path's.

    ``row_shapes`` marks tables STORED flattened as [N, row_elems] (big-row
    pixel tables — see ``data/loader._take_rows``) mapping to the logical
    per-row shape to restore after the gather.
    """
    def gather(tables, idx, weight):
        def local(tabs, idx_l):
            return table_row_gather(tabs, idx_l, row_shapes)

        in_specs = (
            {k: P("data", *([None] * (v.ndim - 1))) for k, v in tables.items()},
            P("data"),
        )
        out_specs = {
            k: P("data", *([None] * len(tuple(row_shapes.get(k, v.shape[1:])))))
            for k, v in tables.items()
        }
        batch = dict(jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        )(tables, idx))
        batch["weight"] = weight
        return batch

    return gather

"""Multi-host helpers (single-process semantics + slicing math).

True multi-process execution needs a pod; what IS testable here: the
per-host slice arithmetic for any process count, and that the
host-local-to-global assembly path produces correctly sharded global arrays
in the 1-process case (where it must agree with batch_device_put).
"""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from mgnns_tpu.parallel.mesh import _BATCH_FIELDS, create_mesh
from mgnns_tpu.parallel.multihost import (
    host_local_to_global,
    initialize,
    process_batch_slice,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_initialize_noop_single_process(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    initialize()  # must not raise or start a coordination service
    assert jax.process_count() == 1


def test_process_batch_slice_single():
    start, stop, per_host = process_batch_slice(103, 16)
    assert (start, stop, per_host) == (0, 103, 16)


def test_slice_math_covers_and_balances():
    """The slice arithmetic must partition [0, n) exactly and balance to
    within one sample for any process count (checked directly, without
    spawning processes)."""

    def slices(n, p):
        base, extra = divmod(n, p)
        out = []
        for i in range(p):
            start = i * base + min(i, extra)
            stop = start + base + (1 if i < extra else 0)
            out.append((start, stop))
        return out

    for n, p in [(103, 4), (8, 8), (10035, 16), (7, 3)]:
        ss = slices(n, p)
        assert ss[0][0] == 0 and ss[-1][1] == n
        sizes = [b - a for a, b in ss]
        assert max(sizes) - min(sizes) <= 1
        for (a1, b1), (a2, b2) in zip(ss, ss[1:]):
            assert b1 == a2  # contiguous, no gaps/overlap


def test_host_local_to_global_matches_device_put():
    from mgnns_tpu.parallel.mesh import batch_device_put

    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    batch = {
        "ids": rng.integers(0, 50, (8, 6)).astype(np.int32),
        "weight": np.ones((8,), np.float32),
        "object_inp": rng.standard_normal((5, 3)).astype(np.float32),
    }
    g = host_local_to_global(batch, mesh, _BATCH_FIELDS)
    ref = batch_device_put(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(ref[k]))
        assert g[k].sharding.spec == ref[k].sharding.spec, k
    assert tuple(g["ids"].sharding.spec) == ("data", None)
    assert g["object_inp"].sharding.spec == P()


def test_epoch_num_batches_identical_across_hosts(monkeypatch):
    """Every host must derive the SAME epoch length from the global split
    size, padding its own short tail with weight-0 batches (the ADVICE r2
    hang: N=101, p=2, B=50 -> host0 ran 3 steps, host1 ran 2)."""
    from mgnns_tpu.parallel import multihost as mh

    def nb(n, batch, p):
        monkeypatch.setattr(mh.jax, "process_count", lambda: p)
        return mh.epoch_num_batches(n, batch)

    # the ADVICE scenario: both hosts must run 3 steps
    assert nb(101, 50, 2) == 3
    # even split: natural count
    assert nb(100, 50, 2) == 2
    assert nb(100, 50, 1) == 2
    # balanced-to-within-one slices: the max host size drives the count
    # (hosts get 26/26/26/25 samples, per-host batch 4 -> ceil(26/4) = 7)
    assert nb(103, 16, 4) == 7
    assert nb(7, 8, 8) == 1


def test_forced_epoch_length_matches_loader_math():
    """Single-process: epoch_num_batches equals the loader's natural count."""
    from mgnns_tpu.parallel.multihost import epoch_num_batches

    for n, b in [(70, 32), (64, 32), (1, 16), (100, 7)]:
        assert epoch_num_batches(n, b) == (n + b - 1) // b

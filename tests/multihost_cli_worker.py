"""Worker for the multi-process CLI integration test.

Launched (2x) by tests/test_multihost_2proc.py.  Each process runs the FULL
training CLI — ``mgnns_tpu.cli.main`` with ``--multihost --mesh_data 2
--mesh_model 2 --device_text`` — over the real reference val/test splits
(limited to 48 records), exercising the whole wiring: jax.distributed
init, per-host record slices, the SPMD table-sharded fused input path,
forced epoch lengths, sharded metrics, and the reference-format result
dumps.  lr/wd/dropout are zeroed so every metric is a pure evaluation —
batch-composition-invariant, hence byte-comparable across process counts.
"""

import json
import os
import sys
import tempfile

N_LIMIT, GLOBAL_BATCH = 48, 16

# same convention as tools/_bench_util.py: MGNNS_DATA overrides the
# default reference-checkout location
DATA_ROOT = os.environ.get("MGNNS_DATA", "/root/reference/data")

CLI_ARGS = [
    "--data_root_path", DATA_ROOT, "--pmi_phase", "val",
    "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
    "--text_only", "--epochs", "2", "-b", str(GLOBAL_BATCH),
    "--limit_samples", str(N_LIMIT),
    "--lr", "0", "--weight_decay", "0", "--dropout", "0",
    "--device_text", "-e",
]


def main():
    out_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mgnns_tpu.cli.main import main as cli_main

    # Checkpoints and result dumps go to ONE directory shared by both
    # processes (the real multihost semantic: a shared filesystem).  Orbax
    # coordinates a single global save; the result dumps gather every
    # host's prediction block and land on process 0 only.
    shared = os.path.dirname(os.path.abspath(out_path))
    res = cli_main(CLI_ARGS + [
        "--multihost", "--mesh_data", "2", "--mesh_model", "2",
        "--save_model_path", os.path.join(shared, "ckpt"),
        "--save_experiment_result_path", os.path.join(shared, "exp"),
        "--save_pred_result_path", os.path.join(shared, "pred"),
    ])

    from jax.experimental import multihost_utils

    from mgnns_tpu.parallel.multihost import process_batch_slice

    start, _, _ = process_batch_slice(N_LIMIT, GLOBAL_BATCH)
    # reference-format pred dump: written by process 0 only, containing the
    # GLOBAL split (the engine gathers every host's block).  Barrier first:
    # process 0's file write happens after the collective gather, so the
    # other process could otherwise look before the file lands.
    multihost_utils.sync_global_devices("cli_worker_dump_done")
    pred_files = []
    pred_root = os.path.join(shared, "pred")
    for root, _, files in os.walk(pred_root):
        pred_files += [os.path.join(root, fn) for fn in files]
    test = res["test"]
    out = {
        "pred_files": sorted(pred_files),
        "pred_rows": (open(pred_files[0]).read().splitlines()
                      if len(pred_files) == 1 else []),
        "process": jax.process_index(),
        "history": [
            {k: {"loss": float(h[k]["loss"]),
                 "accuracy": float(h[k]["accuracy"]),
                 "fused": bool(h[k].get("fused"))}
             for k in ("train", "val")}
            for h in res["history"]
        ],
        "test_loss": float(test["loss"]),
        "test_accuracy": float(test["accuracy"]),
        # host-local preds keyed by GLOBAL record index
        "preds": {str(start + int(i)): int(p)
                  for i, p in zip(np.asarray(test["sample_index"]),
                                  np.asarray(test["preds"]))},
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[cli worker {jax.process_index()}] ok", flush=True)


if __name__ == "__main__":
    main()

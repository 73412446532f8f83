"""Worker for the multihost checkpoint-directory guard test.

Launched (2x) by tests/test_multihost_2proc.py.  Each process builds a
``Checkpointer`` over its OWN private directory — the misconfiguration
that used to deadlock the first coordinated Orbax save (both processes
parked on a cross-process barrier forever).  The guard must instead raise
a clean, actionable error on BOTH processes.  A second construction over
one shared directory must succeed.
"""

import json
import os
import sys
import tempfile


def main():
    out_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mgnns_tpu.parallel.multihost import initialize

    initialize()

    from mgnns_tpu.engine.checkpoint import Checkpointer

    private = tempfile.mkdtemp(prefix=f"ckpt_guard_{jax.process_index()}_")
    try:
        Checkpointer(private)
        raised = False
        message = ""
    except RuntimeError as e:
        raised = True
        message = str(e)

    # one directory shared by both processes must pass the probe
    shared = os.path.join(os.path.dirname(os.path.abspath(out_path)), "ckpt")
    Checkpointer(shared).close()

    # while the 2-process world is up (cheap to reuse): the result-dump
    # prediction gather must reassemble UNEVEN host blocks (process 0
    # holds 3 records, process 1 holds 2) into global order with global ids
    import numpy as np

    from mgnns_tpu.engine.train import Engine

    if jax.process_index() == 0:
        ids, tgt, prd = [0, 1, 2], [10, 11, 12], [20, 21, 22]
    else:
        ids, tgt, prd = [0, 1], [13, 14], [23, 24]
    g_ids, g_tgt, g_prd = Engine._gather_pred_blocks(
        np.array(ids), np.array(tgt), np.array(prd))
    gather_ok = (g_ids.tolist() == [0, 1, 2, 3, 4]
                 and g_tgt.tolist() == [10, 11, 12, 13, 14]
                 and g_prd.tolist() == [20, 21, 22, 23, 24])

    with open(out_path, "w") as f:
        json.dump({"process": jax.process_index(), "raised": raised,
                   "message": message, "gather_ok": gather_ok}, f)
    print(f"[ckpt guard worker {jax.process_index()}] ok", flush=True)


if __name__ == "__main__":
    main()

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

    with open(out_path, "w") as f:
        json.dump({"process": jax.process_index(), "raised": raised,
                   "message": message}, f)
    print(f"[ckpt guard worker {jax.process_index()}] ok", flush=True)


if __name__ == "__main__":
    main()

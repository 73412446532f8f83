"""Full-production-scale fused eval on the real chip.

Runs ONE fused whole-epoch eval over the ENTIRE val split (10,035 samples,
448px) with both pixel AND text tables resident in HBM — the 6 GB pixel
table case.  This is the scale bench.py's default (512 samples) never
reaches, and it exercises the r4 memory guard's PASS side: the program must
analyze under the budget and run (eval temps are small; the guard exists
because the TRAIN epoch at this scale crashed the worker).

Writes results/r4/full_split_fused_eval.json.  One TPU process at a time.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools._bench_util import flagship_data, flagship_model  # noqa: E402


def main():
    import jax
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.engine.train import Engine

    B = int(os.environ.get("FSE_BATCH", "128"))
    data = flagship_data()  # the whole val split
    model = flagship_model(data, bn_mode="batch")
    eng = Engine(model.apply_fn, model.params, model.bstats, num_classes=7,
                 steps_per_epoch=1, eval_only=True)
    loader = DeviceLoader(data.ds, B, shuffle=False, num_threads=8,
                          device_images=True, device_text=True)

    t_up0 = time.time()
    ev0 = eng.eval_epoch(loader)  # table build+upload + fused compile
    warm_s = time.time() - t_up0
    ev = eng.eval_epoch(loader)

    out = {
        "device": str(jax.devices()[0]),
        "n_samples": int(np.asarray(ev["confusion"]).sum()),
        "batch": B,
        "fused": bool(ev.get("fused")),
        "samples_per_sec": round(ev["samples_per_sec"], 1),
        "epoch_seconds": round(ev["epoch_seconds"], 3),
        "warmup_seconds_incl_table_upload_and_compile": round(warm_s, 1),
        "first_epoch_fused": bool(ev0.get("fused")),
    }
    outp = os.path.join(ROOT, "results", "r4", "full_split_fused_eval.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Eval-forward MFU batch ladder (round-5 review item 8, stretch).

The r3 roofline pinned the eval forward at 63% of the measured 162 TFLOP/s
peak at B=32.  Eval has no optimizer/activation HBM pressure, so larger
batches are free to try: this ladder measures the fused fusion forward at
B = 32..512 and reports XLA-counted TFLOP/s and % of measured peak per rung,
plus the winner.  Writes results/r5/eval_batch_ladder.json.

Run ON TPU: python tools/eval_batch_ladder.py.  One TPU process at a time.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools._bench_util import flagship_data, flagship_model, measured_bf16_peak, timed
from tools.roofline import flops_of


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.data.loader import DeviceLoader

    peak = measured_bf16_peak()
    ladder = [int(b) for b in os.environ.get(
        "EVAL_LADDER", "32,64,128,256,512").split(",")]
    data = flagship_data(n_records=max(ladder))
    model = flagship_model(data, bn_mode="frozen", unroll_trunks=True)
    params, bstats, apply_fn = model.params, model.bstats, model.apply_fn

    @jax.jit
    def eval_step(p, bs, b):
        bb = {k: b[k] for k in ("ids", "lens", "mask", "eids", "image")}
        logits, _ = apply_fn(p, bs, bb, train=False, rng=None)
        return jnp.argmax(logits, axis=-1)

    rungs = []
    for B in ladder:
        batch = next(iter(DeviceLoader(data.ds, B, shuffle=False,
                                       num_threads=8,
                                       cache_device_batches=True)))
        batch = {k: batch[k] for k in ("ids", "lens", "mask", "eids", "image")}
        try:
            f = flops_of(eval_step, params, bstats, batch)
            dt = timed(eval_step, (params, bstats, batch), iters=10,
                       readback=lambda o: int(np.asarray(o).sum()))
        except Exception as e:  # OOM rung: record and continue
            rungs.append({"batch": B, "error": f"{type(e).__name__}: {e}"[:200]})
            continue
        tf = (f / dt / 1e12) if f else None
        rungs.append({
            "batch": B,
            "seconds": round(dt, 5),
            "samples_per_sec": round(B / dt, 1),
            "tflops": round(tf, 1) if tf else None,
            "pct_of_peak": round(100 * tf / peak, 1) if tf else None,
        })
        print(f"[ladder] B={B}: {rungs[-1]}", flush=True)

    ok = [r for r in rungs if r.get("tflops")]
    best = max(ok, key=lambda r: r["tflops"]) if ok else None
    out = {
        "peak_bf16_matmul_tflops": round(peak, 1),
        "rungs": rungs,
        "best": best,
        "baseline_b32_pct_of_peak_r3": 63.4,
    }
    outp = os.path.join(ROOT, "results", "r5", "eval_batch_ladder.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

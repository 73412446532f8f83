"""Capture a jax.profiler trace of the flagship fine-tune train step on TPU.

VERDICT r2 item 3 asked for a committed profiler trace of the fine-tune
step.  This traces a handful of already-compiled steps (warmup first, so
compile time stays out of the trace) into ``results/r3/trace/``.

Run ON TPU:  python tools/capture_trace.py
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools._bench_util import flagship_data, flagship_model


def main():
    import jax

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.engine import metrics as M
    from mgnns_tpu.engine.train import Engine

    B = int(os.environ.get("MGNNS_BENCH_BATCH", "32"))
    out_dir = os.path.join(ROOT, "results", "r3", "trace")
    data = flagship_data(n_records=B * 2)
    model = flagship_model(data, bn_mode="frozen", unroll_trunks=True,
                           remat_policy="none")
    batch = next(iter(DeviceLoader(data.ds, B, shuffle=False, num_threads=8)))

    eng = Engine(model.apply_fn, model.params, model.bstats, num_classes=7,
                 steps_per_epoch=1)
    state = eng.state
    for _ in range(3):  # compile + settle before tracing
        state, loss, cm = eng._train_step(state, batch, M.confusion_init(7))
    float(jax.tree_util.tree_leaves(state.params)[0].astype("float32").sum())

    with jax.profiler.trace(out_dir):
        for _ in range(5):
            state, loss, cm = eng._train_step(state, batch, M.confusion_init(7))
        float(jax.tree_util.tree_leaves(state.params)[0].astype("float32").sum())
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main()

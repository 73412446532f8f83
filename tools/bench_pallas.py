"""Microbenchmark: Pallas edge-max kernel vs the XLA jnp path, on TPU.

Settles VERDICT r2 item 5 with numbers: forward, backward, and a fused
train-style step (forward + grads) at flagship shapes (B x L=100 x D=300,
ngram=4).  Prints a markdown table for docs/PERFORMANCE.md plus one JSON
line.

Run ON TPU (default platform):  python tools/bench_pallas.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools._bench_util import timed


def timeit(fn, *args, iters=100, reps=3):
    # real D2H scalar readback as the completion barrier —
    # jax.block_until_ready can return before remote execution completes on
    # a network-attached TPU (see tools/_bench_util.timed).  These programs
    # are ~1 ms, where tunnel jitter dominates single measurements: take the
    # min over independent repetitions (the classic microbench estimator —
    # noise only ever adds time).
    import jax

    def readback(o):
        return float(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    return min(timed(fn, args, iters=iters, readback=readback)
               for _ in range(reps)) * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.kernels.edge_max import window_max_aggregate_pallas
    from mgnns_tpu.nn.text_gcn import window_max_aggregate

    B = int(os.environ.get("B", "64"))
    L, D, ngram = 100, 300, 4
    W = 2 * ngram + 1
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-2, 2, (B, L, W)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, L + 1, (B,)).astype(np.int32))
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, :, None]

    interp = jax.default_backend() == "cpu"

    xla_fwd = jax.jit(lambda e, ww: window_max_aggregate(e, ww, lens, ngram))
    pl_fwd = jax.jit(lambda e, ww: window_max_aggregate_pallas(e, ww, lens, ngram, interp))

    def make_grad(fn):
        def loss(e, ww):
            m = fn(e, ww)
            return jnp.sum(jnp.where(valid, m, 0.0) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    xla_grad = make_grad(lambda e, ww: window_max_aggregate(e, ww, lens, ngram))
    pl_grad = make_grad(lambda e, ww: window_max_aggregate_pallas(e, ww, lens, ngram, interp))

    rows = {
        "fwd_xla_ms": timeit(xla_fwd, emb, w),
        "fwd_pallas_ms": timeit(pl_fwd, emb, w),
        "grad_xla_ms": timeit(xla_grad, emb, w),
        "grad_pallas_ms": timeit(pl_grad, emb, w),
    }
    os.environ["MGNNS_PALLAS_XLA_BWD"] = "1"
    pl_grad_xlabwd = make_grad(
        lambda e, ww: window_max_aggregate_pallas(e, ww, lens, ngram, interp) * 1.0)
    rows["grad_pallas_xla_bwd_ms"] = timeit(pl_grad_xlabwd, emb, w)
    del os.environ["MGNNS_PALLAS_XLA_BWD"]

    # numerical agreement at bench shapes
    ga = xla_grad(emb, w)
    gb = pl_grad(emb, w)
    rows["max_grad_delta"] = float(
        max(jnp.abs(ga[0] - gb[0]).max(), jnp.abs(ga[1] - gb[1]).max()))

    print(f"| op (B={B}, L={L}, D={D}, W={W}) | XLA | Pallas |")
    print("|---|---|---|")
    print(f"| forward | {rows['fwd_xla_ms']:.3f} ms | {rows['fwd_pallas_ms']:.3f} ms |")
    print(f"| forward+grad | {rows['grad_xla_ms']:.3f} ms | {rows['grad_pallas_ms']:.3f} ms "
          f"(jnp-VJP fallback {rows['grad_pallas_xla_bwd_ms']:.3f} ms) |")
    rows["backend"] = jax.default_backend()
    rows["batch"] = B
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in rows.items()}))


if __name__ == "__main__":
    main()

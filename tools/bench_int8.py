"""Decision microbench: does XLA:TPU run int8 convs/matmuls ~2x bf16 here?

The v5e datasheet rates the MXU at 394 int8 TOPS vs 197 bf16 TFLOP/s.  If
XLA lowers int8 `conv_general_dilated` / `dot_general` (int8 operands,
int32 accumulation) onto that path, a post-training-quantized serving mode
for the two ResNet trunks (94% of eval FLOPs) could raise eval throughput
substantially.  This tool measures, on the real chip:

1. chained big-matmul throughput: bf16 vs int8 (both MXU-shaped);
2. representative ResNet-101 conv shapes at the flagship 448px/B=128 eval
   config: bf16 vs int8 operands.

If the int8/bf16 ratio is ~>1.6x on the conv shapes, build the PTQ path;
if ~1x (XLA upcasts or the MXU path is bf16-only via this toolchain),
record the measurement and skip the feature.

Run ON TPU: python tools/bench_int8.py
Writes results/r3/int8_microbench.json.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools._bench_util import measured_bf16_peak, timed


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    results = {"backend": jax.default_backend()}
    n, chain = 8192, 8

    # --- 1. chained matmul peaks -----------------------------------------
    tf16 = measured_bf16_peak(n=n, chain=chain)
    results["matmul_bf16_tflops"] = round(tf16, 1)

    A8 = jax.random.randint(jax.random.key(2), (n, n), -4, 4, jnp.int8)
    x8 = jax.random.randint(jax.random.key(3), (n, n), -4, 4, jnp.int8)

    @jax.jit
    def peak_int8(x, a):
        def body(_, acc):
            y = jax.lax.dot_general(
                acc, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # renormalize back to int8 so the chain stays int8 (the shift is
            # cheap VPU work, amortized over the n^3 MXU cost)
            return (y >> 12).astype(jnp.int8)
        return jax.lax.fori_loop(0, chain, body, x)

    dt8 = timed(peak_int8, (x8, A8), iters=8,
                readback=lambda o: int(o[0, 0]))
    tops8 = chain * 2 * n ** 3 / dt8 / 1e12
    results["matmul_int8_tops"] = round(tops8, 1)
    results["matmul_int8_over_bf16"] = round(tops8 / tf16, 2)

    # --- 2. ResNet conv shapes (B=128 eval at 448px) ----------------------
    B = int(os.environ.get("MGNNS_BENCH_BATCH", "128"))
    dimnums = jax.lax.conv_dimension_numbers(
        (B, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    shapes = [
        # (name, H, Cin, Cout, k, stride) — the hot stage-2..4 convs of
        # ResNet-101 at 448px input (so spatial dims are 2x the 224 classic)
        ("3x3_256_56sq", 56, 256, 256, 3, 1),
        ("3x3_512_28sq", 28, 512, 512, 3, 1),
        ("1x1_1024to512_28sq", 28, 1024, 512, 1, 1),
        ("1x1_512to2048_28sq", 28, 512, 2048, 1, 1),
    ]
    conv_rows = []
    for name, H, cin, cout, k, stride in shapes:
        x16c = jax.random.normal(jax.random.key(4), (B, H, H, cin),
                                 jnp.bfloat16)
        w16 = jax.random.normal(jax.random.key(5), (k, k, cin, cout),
                                jnp.bfloat16) * jnp.bfloat16(0.05)
        x8c = jax.random.randint(jax.random.key(6), (B, H, H, cin), -4, 4,
                                 jnp.int8)
        w8 = jax.random.randint(jax.random.key(7), (k, k, cin, cout), -4, 4,
                                jnp.int8)

        @jax.jit
        def conv16(x, w, s=stride):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dimnums,
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def conv8(x, w, s=stride):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dimnums,
                preferred_element_type=jnp.int32)

        flops = 2 * B * (H // stride) ** 2 * k * k * cin * cout
        d16 = timed(conv16, (x16c, w16), iters=20,
                    readback=lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
        d8 = timed(conv8, (x8c, w8), iters=20,
                   readback=lambda o: int(o[0, 0, 0, 0]))
        row = {"shape": name, "flops": flops,
               "bf16_ms": round(d16 * 1e3, 3),
               "bf16_tflops": round(flops / d16 / 1e12, 1),
               "int8_ms": round(d8 * 1e3, 3),
               "int8_tops": round(flops / d8 / 1e12, 1),
               "int8_over_bf16": round(d16 / d8, 2)}
        conv_rows.append(row)
        print(row, flush=True)
    results["convs"] = conv_rows

    out_path = os.path.join(ROOT, "results", "r3", "int8_microbench.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

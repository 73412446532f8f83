"""Conv-formulation microbench: can an explicit-matmul conv beat XLA:TPU?

The fine-tune train step is 94% trunk gradients, and the roofline
(results/r3/roofline.json) puts the conv backward at 36-51% of this chip's
measured bf16 matmul peak.  Before accepting that as the ceiling, this tool
measures two MXU-native reformulations of the hot ResNet shapes against
XLA's native `lax.conv_general_dilated` lowering, forward and
forward+gradient:

- ``shifted``: a k×k stride-1 conv as the sum of k² shifted 1×1 matmuls
  ``y = Σ_{dy,dx} shift(x, dy, dx) @ W[dy, dx]``.  Autodiff gives
  wgrad = k² plain dots (``shift(x)ᵀ @ g``) and dgrad = k² dots plus
  pad/slice — everything lands on the MXU, no gather/scatter.
- ``im2col``: materialize patches (k² shifted copies concatenated on the
  channel axis) and run ONE [B·H·W, C·k²] × [C·k², K] matmul.  Bigger K
  dimension → better MXU utilization, at the cost of k²× activation HBM
  traffic.

Both are parity-checked against the native conv (same padding/stride
semantics) before timing.  Shapes are the flagship trunks' stages at the
reference's 448px / B=32 bench config (ResNet-101/50 bottleneck widths,
`nn/resnet.py`); per-shape block counts weight the projected step-level win.

Writes results/r3/conv_formulations.json.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

from tools._bench_util import timed

# (name, H, C_in, C_out, k, stride, blocks_r101, blocks_r50) at 448px input.
# 1x1 convs are already plain matmuls to XLA — included as controls.
SHAPES = [
    ("c2_3x3_112_64", 112, 64, 64, 3, 1, 3, 3),
    ("c3_3x3_56_128", 56, 128, 128, 3, 1, 4, 4),
    ("c4_3x3_28_256", 28, 256, 256, 3, 1, 23, 6),
    ("c5_3x3_14_512", 14, 512, 512, 3, 1, 3, 3),
    ("c4_1x1_28_1024_256", 28, 1024, 256, 1, 1, 23, 6),
    ("c4_1x1_28_256_1024", 28, 256, 1024, 1, 1, 23, 6),
]


def conv_native(x, w, stride):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _shifts(x, k):
    """k² spatially shifted views of SAME-padded x, stride 1."""
    import jax.numpy as jnp

    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    return [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(k) for dx in range(k)]


def conv_shifted(x, w, stride):
    """Sum of k² shifted 1×1 matmuls (stride-1 SAME only)."""
    import jax.numpy as jnp

    k = w.shape[0]
    assert stride == 1
    views = _shifts(x, k)
    acc = None
    for i, v in enumerate(views):
        dy, dx = divmod(i, k)
        t = jnp.einsum("bhwc,ck->bhwk", v, w[dy, dx],
                       preferred_element_type=v.dtype)
        acc = t if acc is None else acc + t
    return acc


def conv_im2col(x, w, stride):
    """One big matmul over concatenated shifted views (stride-1 SAME only)."""
    import jax.numpy as jnp

    k = w.shape[0]
    assert stride == 1
    patches = jnp.concatenate(_shifts(x, k), axis=-1)  # [B,H,W,C*k²]
    # _shifts orders views (dy, dx)-major with channels contiguous per view;
    # w is HWIO so a C-order reshape to [k·k·Cin, Cout] matches exactly
    wmat = w.reshape(-1, w.shape[3])
    return jnp.einsum("bhwp,pk->bhwk", patches, wmat,
                      preferred_element_type=x.dtype)


FORMS = {"native": conv_native, "shifted": conv_shifted, "im2col": conv_im2col}


def main():
    import jax
    import jax.numpy as jnp

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    B = int(os.environ.get("CONV_BENCH_BATCH", "32"))
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {"batch": B, "backend": jax.default_backend(), "shapes": {}}

    # ---- parity check (small shape, f32, all formulations) ----
    xs = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.1, jnp.float32)
    ref = np.asarray(conv_native(xs, ws, 1))
    for name in ("shifted", "im2col"):
        got = np.asarray(FORMS[name](xs, ws, 1))
        err = float(np.abs(got - ref).max())
        assert err < 1e-4, (name, err)
    print("parity ok (3x3 SAME stride 1, f32, max |Δ| < 1e-4)")

    # CHAIN iterations inside ONE jitted program (data-dependent fori_loop):
    # these are ~1 ms ops, where per-dispatch overhead on a network-attached
    # TPU dominates a call-per-iteration loop and buries the formulation
    # deltas in noise.  Requires cin == cout / stride 1 (all the 3x3 shapes
    # here) so outputs can feed back into inputs.
    CHAIN = 16

    for name, H, cin, cout, k, stride, b101, b50 in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, H, cin)), dtype)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dtype)
        flops = 2 * B * H * H * cin * cout * k * k / (stride * stride)
        row = {"blocks_r101": b101, "blocks_r50": b50, "gflops": flops / 1e9}
        for fname, fn in FORMS.items():
            if fname != "native" and (k == 1 or cin != cout or stride != 1):
                continue  # 1x1 IS the matmul already; chaining needs cin==cout

            def grad_one(x, w, fn=fn):
                return jax.grad(
                    lambda x, w: jnp.sum(fn(x, w, stride).astype(jnp.float32) ** 2),
                    argnums=(0, 1))(x, w)

            if cin == cout and stride == 1:
                @jax.jit
                def fwd(x, w, fn=fn):
                    def body(_, cx):
                        y = fn(cx, w, stride)
                        return cx + dtype(1e-6) * y  # data dependency

                    return jax.lax.fori_loop(0, CHAIN, body, x)

                @jax.jit
                def gradf(x, w, fn=fn):
                    def body(_, carry):
                        cx, cw = carry
                        dx, dw = grad_one(cx, cw)
                        return (cx + dtype(1e-9) * dx, cw + dtype(1e-9) * dw)

                    return jax.lax.fori_loop(0, CHAIN, body, (x, w))

                div = CHAIN
                rb_f = lambda o: float(o.reshape(-1)[0].astype(jnp.float32))
                rb_g = lambda o: float(o[1].reshape(-1)[0].astype(jnp.float32))
            else:
                fwd = jax.jit(lambda x, w, fn=fn: fn(x, w, stride))
                gradf = jax.jit(grad_one)
                div = 1
                rb_f = lambda o: float(o.reshape(-1)[0].astype(jnp.float32))
                rb_g = lambda o: float(o[1].reshape(-1)[0].astype(jnp.float32))

            t_f = timed(fwd, (x, w), iters=8, readback=rb_f) / div
            t_g = timed(gradf, (x, w), iters=8, readback=rb_g) / div
            row[fname] = {
                "fwd_ms": round(t_f * 1e3, 3),
                "fwd_tflops": round(flops / t_f / 1e12, 1),
                "grad_ms": round(t_g * 1e3, 3),
                # fwd + dgrad + wgrad = 3x fwd FLOPs
                "grad_tflops": round(3 * flops / t_g / 1e12, 1),
            }
            print(f"{name:22s} {fname:8s} fwd {t_f*1e3:7.3f} ms "
                  f"({flops/t_f/1e12:6.1f} TF/s)  fwd+grad {t_g*1e3:7.3f} ms "
                  f"({3*flops/t_g/1e12:6.1f} TF/s)")
        results["shapes"][name] = row

    # ---- composite programs: where does the trunk-level gap come from? ----
    # Per-op chained 3x3 convs run at ~130 TF/s but the full R101 grad
    # measures 82 (roofline.json).  Time the repeating unit — a frozen-BN
    # bottleneck block (1x1 reduce → 3x3 → 1x1 expand + residual, the
    # per-block scale/shift folded like nn/resnet.py's frozen mode) — and
    # the memory-bound stem, to locate the loss.
    def bottleneck(x, p):
        h = jnp.einsum("bhwc,ck->bhwk", x, p["w1"],
                       preferred_element_type=dtype) * p["s1"]
        h = jax.nn.relu(h)
        h = conv_native(h, p["w2"], 1) * p["s2"]
        h = jax.nn.relu(h)
        h = jnp.einsum("bhwc,ck->bhwk", h, p["w3"],
                       preferred_element_type=dtype) * p["s3"]
        return jax.nn.relu(x + h)

    H, cin, width = 28, 1024, 256
    x = jnp.asarray(rng.standard_normal((B, H, H, cin)), dtype)
    p = {"w1": jnp.asarray(rng.standard_normal((cin, width)) * 0.05, dtype),
         "w2": jnp.asarray(rng.standard_normal((3, 3, width, width)) * 0.05, dtype),
         "w3": jnp.asarray(rng.standard_normal((width, cin)) * 0.05, dtype),
         "s1": dtype(1.0), "s2": dtype(1.0), "s3": dtype(1.0)}
    blk_flops = 2 * B * H * H * (cin * width * 2 + width * width * 9)

    CHAIN_B = 12

    @jax.jit
    def blk_fwd(x, p):
        return jax.lax.fori_loop(0, CHAIN_B, lambda _, cx: bottleneck(cx, p), x)

    @jax.jit
    def blk_grad(x, p):
        def body(_, carry):
            cx, cp = carry
            dx, dp = jax.grad(
                lambda x, p: jnp.sum(bottleneck(x, p).astype(jnp.float32) ** 2),
                argnums=(0, 1))(cx, cp)
            cp = jax.tree_util.tree_map(lambda a, b: a + dtype(1e-9) * b, cp, dp)
            return (cx + dtype(1e-9) * dx, cp)

        return jax.lax.fori_loop(0, CHAIN_B, body, (x, p))

    t_f = timed(blk_fwd, (x, p), iters=8,
                readback=lambda o: float(o.reshape(-1)[0].astype(jnp.float32))) / CHAIN_B
    t_g = timed(blk_grad, (x, p), iters=8,
                readback=lambda o: float(o[0].reshape(-1)[0].astype(jnp.float32))) / CHAIN_B
    results["bottleneck_28_1024_256"] = {
        "gflops": blk_flops / 1e9,
        "fwd_ms": round(t_f * 1e3, 3), "fwd_tflops": round(blk_flops / t_f / 1e12, 1),
        "grad_ms": round(t_g * 1e3, 3),
        "grad_tflops": round(3 * blk_flops / t_g / 1e12, 1)}
    print(f"bottleneck_28_1024_256 composite fwd {t_f*1e3:7.3f} ms "
          f"({blk_flops/t_f/1e12:6.1f} TF/s)  fwd+grad {t_g*1e3:7.3f} ms "
          f"({3*blk_flops/t_g/1e12:6.1f} TF/s)")

    # stem: 7x7 stride-2 conv at 448px — memory-bound, can't chain (3→64
    # channels); absolute ms is what matters (paid once per trunk)
    xs7 = jnp.asarray(rng.standard_normal((B, 448, 448, 3)), dtype)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, dtype)
    stem = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    stem_grad = jax.jit(jax.grad(
        lambda x, w: jnp.sum(stem(x, w).astype(jnp.float32) ** 2), argnums=(0, 1)))
    stem_flops = 2 * B * 224 * 224 * 3 * 64 * 49
    t_f = timed(stem, (xs7, w7), iters=20,
                readback=lambda o: float(o.reshape(-1)[0].astype(jnp.float32)))
    t_g = timed(stem_grad, (xs7, w7), iters=20,
                readback=lambda o: float(o[1].reshape(-1)[0].astype(jnp.float32)))
    results["stem_7x7_s2_448"] = {
        "gflops": stem_flops / 1e9, "fwd_ms": round(t_f * 1e3, 3),
        "fwd_tflops": round(stem_flops / t_f / 1e12, 1),
        "grad_ms": round(t_g * 1e3, 3),
        "grad_tflops": round(3 * stem_flops / t_g / 1e12, 1),
        "note": "unchained (3-ch input): includes per-call dispatch overhead"}
    print(f"stem_7x7_s2_448        fwd {t_f*1e3:7.3f} ms "
          f"({stem_flops/t_f/1e12:6.1f} TF/s)  fwd+grad {t_g*1e3:7.3f} ms "
          f"({3*stem_flops/t_g/1e12:6.1f} TF/s)")

    # projected per-trunk-grad deltas if the best formulation were adopted
    for trunk, field in (("r101", "blocks_r101"), ("r50", "blocks_r50")):
        delta = 0.0
        for name, row in results["shapes"].items():
            if "shifted" not in row:
                continue
            best = min(row[f]["grad_ms"] for f in ("shifted", "im2col"))
            delta += (row["native"]["grad_ms"] - best) * row[field]
        results[f"projected_{trunk}_grad_saving_ms"] = round(delta, 2)
        print(f"projected {trunk} grad saving if best formulation adopted: "
              f"{delta:+.2f} ms")

    out = os.path.join(ROOT, "results", "r3", "conv_formulations.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()

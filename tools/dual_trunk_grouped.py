"""Dual-trunk grouped-conv experiment (round-3 verdict item 7).

The fusion model runs TWO ResNet trunks over the SAME image (the engine
feeds one transformed image to both channels — reference
``engine/Multi_GCN_Multihead_Att_engine.py:861-862``): ResNet-101 (object)
and ResNet-50 (place).  Their stem, layer1 (3 blocks), layer2 (4 blocks)
and layer4 (3 blocks) have IDENTICAL shapes — only layer3 differs (23 vs 6
blocks).  Hypothesis: running the shape-matching stages as grouped convs
(``feature_group_count=2`` over channel-stacked activations, kernels
concatenated along the output axis) halves the number of conv dispatches
in those stages and might raise MXU occupancy of the step's dominant cost
(trunk grads = 94% of the fine-tune step, results/r3/roofline.json).

Per group the contraction shape is unchanged, so the MXU work is the same;
any win must come from scheduling/overhead.  This tool measures fwd+bwd of
the full dual-trunk computation both ways at the production config (448px,
bf16 compute, frozen BN, unrolled blocks) and writes
results/r4/dual_trunk_grouped.json — keep or kill on the measured number.

``--check`` verifies grouped == separate numerically (CPU, small shapes).
One TPU process at a time.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.nn import resnet as R


# ----------------------------------------------------------- param plumbing

def _blocks_list(layer_p, layer_s):
    """The stacked _layer_dict stage -> per-block (params, stats) lists."""
    ps, ss = [layer_p["first"]], [layer_s["first"]]
    if "rest" in layer_p:
        n = jax.tree_util.tree_leaves(layer_p["rest"])[0].shape[0]
        for b in range(n):
            ps.append(jax.tree_util.tree_map(lambda a: a[b], layer_p["rest"]))
            ss.append(jax.tree_util.tree_map(lambda a: a[b], layer_s["rest"]))
    return ps, ss


def _group_pair(a, b, axis):
    return jnp.concatenate([a, b], axis=axis)


def group_stage(p1, s1, p2, s2):
    """Channel-stack one shape-matching stage of the two trunks: kernels
    concat along OUT (grouped conv), BN vectors concat along channel."""
    def g(blk1, blk2, stats=False):
        out = {}
        for k in blk1:
            if k.startswith("conv") or k == "downsample_conv":
                out[k] = {"w": _group_pair(blk1[k]["w"], blk2[k]["w"], 3)}
            else:  # bn / downsample_bn dicts of [C] vectors
                out[k] = {kk: _group_pair(blk1[k][kk], blk2[k][kk], 0)
                          for kk in blk1[k]}
        return out

    b1p, b1s = _blocks_list(p1, s1)
    b2p, b2s = _blocks_list(p2, s2)
    assert len(b1p) == len(b2p)
    return ([g(x, y) for x, y in zip(b1p, b2p)],
            [g(x, y) for x, y in zip(b1s, b2s)])


# ----------------------------------------------------------- grouped apply

def g_conv(p, x, stride, padding, dtype):
    w = p["w"].astype(dtype) if dtype is not None else p["w"].astype(x.dtype)
    if dtype is not None:
        x = x.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2)


def g_bn(p, s, x, eps=1e-5):
    inv = jax.lax.rsqrt(s["var"] + eps)
    return (x - s["mean"].astype(x.dtype)) * (inv * p["scale"]).astype(x.dtype) \
        + p["bias"].astype(x.dtype)


def g_bottleneck(p, s, x, stride, dtype):
    out = g_conv(p["conv1"], x, 1, "SAME", dtype)
    out = jax.nn.relu(g_bn(p["bn1"], s["bn1"], out))
    out = g_conv(p["conv2"], out, stride, ((1, 1), (1, 1)), dtype)
    out = jax.nn.relu(g_bn(p["bn2"], s["bn2"], out))
    out = g_conv(p["conv3"], out, 1, "SAME", dtype)
    out = g_bn(p["bn3"], s["bn3"], out)
    if "downsample_conv" in p:
        idn = g_conv(p["downsample_conv"], x, stride, "VALID", dtype)
        idn = g_bn(p["downsample_bn"], s["downsample_bn"], idn)
    else:
        idn = x
    return jax.nn.relu(out + idn)


def single_stage(blocks_p, blocks_s, x, stride, dtype):
    """One trunk's stage as a Python loop of frozen-BN bottlenecks."""
    for i, (p, s) in enumerate(zip(blocks_p, blocks_s)):
        x, _ = R._bottleneck_apply(p, s, x, stride if i == 0 else 1,
                                   train=False, dtype=dtype)
    return x


def grouped_stage(blocks_p, blocks_s, x, stride, dtype):
    for i, (p, s) in enumerate(zip(blocks_p, blocks_s)):
        x = g_bottleneck(p, s, x, stride if i == 0 else 1, dtype)
    return x


def build(dtype=jnp.bfloat16, seed=0):
    """Returns (params_pytree, apply_separate, apply_grouped) for the
    dual-trunk computation image -> ([B,h,w,2048], [B,h,w,2048])."""
    p_obj, s_obj = R.resnet_init(jax.random.key(seed), depth=101)
    p_plc, s_plc = R.resnet_init(jax.random.key(seed + 1), depth=50)

    def separate(params, x):
        po, pp = params["obj"], params["plc"]
        o, _ = R.resnet_apply(po, s_obj, x, depth=101, train=False,
                              dtype=dtype, unroll=True)
        q, _ = R.resnet_apply(pp, s_plc, x, depth=50, train=False,
                              dtype=dtype, unroll=True)
        return o, q

    def grouped(params, x):
        po, pp = params["obj"], params["plc"]
        # stem: same image to both trunks -> duplicate channels, grouped 7x7
        stem = {"w": _group_pair(po["conv1"]["w"], pp["conv1"]["w"], 3)}
        bn1p = {k: _group_pair(po["bn1"][k], pp["bn1"][k], 0) for k in po["bn1"]}
        bn1s = {k: _group_pair(s_obj["bn1"][k], s_plc["bn1"][k], 0)
                for k in s_obj["bn1"]}
        x2 = jnp.concatenate([x, x], axis=-1)
        out = g_conv(stem, x2, 2, ((3, 3), (3, 3)), dtype)
        out = jax.nn.relu(g_bn(bn1p, bn1s, out))
        out = R.max_pool(out, 3, 2, 1)
        for li, stride in (("layer1", 1), ("layer2", 2)):
            gp, gs = group_stage(po[li], s_obj[li], pp[li], s_plc[li])
            out = grouped_stage(gp, gs, out, stride, dtype)
        # layer3 differs (23 vs 6 blocks): split channels, run separately
        c = out.shape[-1] // 2
        o, q = out[..., :c], out[..., c:]
        o = single_stage(*_blocks_list(po["layer3"], s_obj["layer3"]), o, 2, dtype)
        q = single_stage(*_blocks_list(pp["layer3"], s_plc["layer3"]), q, 2, dtype)
        out = jnp.concatenate([o, q], axis=-1)
        gp, gs = group_stage(po["layer4"], s_obj["layer4"],
                             pp["layer4"], s_plc["layer4"])
        out = grouped_stage(gp, gs, out, 2, dtype)
        c = out.shape[-1] // 2
        return out[..., :c], out[..., c:]

    return {"obj": p_obj, "plc": p_plc}, separate, grouped


def check():
    """Numerical parity grouped vs separate at small shapes, in float64:
    a grouped conv computes the exact same dot products as the two separate
    convs, so any true formulation bug shows as a large f64 mismatch, while
    f32 tiling reassociation (amplified by the unnormalized random-init
    trunk, activations ~1e4 at the output) does not."""
    jax.config.update("jax_enable_x64", True)
    params, separate, grouped = build(dtype=jnp.float64)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64), params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)), jnp.float64)
    o1, q1 = jax.jit(separate)(params, x)
    o2, q2 = jax.jit(grouped)(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-9, atol=1e-9)
    print("check ok: grouped == separate (f64 exact)")


def bench(batch=16, size=448, iters=12):
    params, separate, grouped = build(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch, size, size, 3)), jnp.float32)
    r = jax.random.normal(jax.random.key(2), (batch,))

    def timed(apply_fn, label):
        def loss(p):
            o, q = apply_fn(p, x)
            return (jnp.einsum("bhwc,b->", o.astype(jnp.float32), r)
                    + jnp.einsum("bhwc,b->", q.astype(jnp.float32), r))

        step = jax.jit(jax.value_and_grad(loss))
        v, g = step(params)  # compile + warm
        float(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum())
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            v, g = step(params)
            # real D2H readback: a true completion barrier over the tunnel
            float(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum())
            lat.append(time.perf_counter() - t0)
        ms = float(np.median(np.asarray(lat)) * 1e3)
        print(f"[dual-trunk] {label}: fwd+bwd median {ms:.2f} ms "
              f"(batch {batch} @ {size}px)", flush=True)
        return ms

    sep_ms = timed(separate, "separate (production: unrolled, frozen BN)")
    grp_ms = timed(grouped, "grouped layer1/2/4 + stem")
    out = {
        "device": str(jax.devices()[0]), "batch": batch, "image": size,
        "separate_ms": round(sep_ms, 2), "grouped_ms": round(grp_ms, 2),
        "speedup": round(sep_ms / grp_ms, 4),
    }
    outp = os.path.join(ROOT, "results", "r4", "dual_trunk_grouped.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        bench(batch=int(os.environ.get("DT_BATCH", "16")),
              size=int(os.environ.get("DT_SIZE", "448")))

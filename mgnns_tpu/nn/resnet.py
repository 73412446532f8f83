"""Functional ResNet trunks (torchvision-compatible structure) in NHWC.

Supplies the visual backbones the reference takes from torchvision:
ResNet-101 for the object channel and ResNet-50 (Places365 head) for the
scene channel (reference ``models/Multi_GCN_Multihead_att.py:274-294,
586-595``).  Only the trunk (stem + layer1..4) is used by the model — output
is the [B, H/32, W/32, 2048] feature map.

Design notes (TPU-first):
- NHWC layout end to end (XLA's preferred TPU conv layout).
- Convolutions run in the configured compute dtype (bf16 by default in the
  mixed-precision policy) with f32 master parameters; the MXU accumulates
  bf16 operands in f32 natively.
- BatchNorm supports torch-faithful train-mode statistics ('batch': batch
  stats for normalization + running-stat updates with unbiased variance,
  momentum 0.1) and frozen inference stats ('frozen').
- Structure and parameter naming mirror torchvision so
  :func:`import_torch_state_dict` can map a ``resnet{50,101}`` /
  Places365 checkpoint weight-for-weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RESNET_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
EXPANSION = 4


# ---------------------------------------------------------------------------
# primitives


def conv_init(key: jax.Array, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    """Kaiming-normal fan_out (torchvision's ResNet init)."""
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return {"w": std * jax.random.normal(key, (kh, kw, cin, cout), dtype)}


def conv_apply(p: dict, x: jnp.ndarray, stride: int = 1, padding="SAME", dtype=None) -> jnp.ndarray:
    """Convolution in ``dtype`` (bf16 under the mixed-precision policy).

    No ``preferred_element_type`` override: the TPU MXU accumulates bf16
    operands in f32 natively, and a f32 preference with bf16 operands makes
    the conv VJP emit mismatched-dtype cotangents (f32 vs bf16 weights).
    """
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    else:
        w = w.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def stem_s2d_apply(p: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """The 7×7/stride-2 stem conv as an EQUIVALENT 4×4/stride-1 conv over a
    space-to-depth-2 input (the MLPerf-ResNet TPU trick).

    Why: the native stem is the one conv XLA:TPU lowers pathologically —
    3 input channels use 3/128 MXU lanes and the stride-2 backward (dgrad
    over a 448² activation) measured ~7-10 ms per trunk step
    (results/r3/conv_formulations.json `stem_7x7_s2_448`) while the rest of
    the trunk runs at ~84% of matmul peak.  In s2d space the same
    multiply-adds become a stride-1 conv with 12 input channels.

    Derivation (1-D; zero padding 3 each side, stride 2):
      y[i] = Σ_{p=0..6} x[2i+p-3]·w[p]            (native)
           = Σ_{r=0..7} x[2i+r-4]·w8[r]           (r=p+1, w8 = w left-padded by one zero)
           = Σ_{p'=0..3, a∈{0,1}} x[2(i+p'-2)+a]·w8[2p'+a]
           = Σ_{p'} x2[i+p'-2, a]·w4[p', a]       (x2[u,a]=x[2u+a]; pad (2,1))
    The parameter stays the stored [7,7,C,64] tensor — the w→w4 scatter is a
    per-step pad/reshape/transpose (fused by XLA, gradients flow through) —
    so checkpoints and torch imports are unchanged.  Exact same
    multiply-adds ⇒ parity with the native stem to float reassociation.
    """
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    else:
        w = w.astype(x.dtype)
    B, H, W, C = x.shape
    x2 = (x.reshape(B, H // 2, 2, W // 2, 2, C)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(B, H // 2, W // 2, 4 * C))
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    K = w.shape[3]
    w4 = (w8.reshape(4, 2, 4, 2, C, K)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, K))
    return jax.lax.conv_general_dilated(
        x2, w4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_init(c: int, dtype=jnp.float32) -> tuple[dict, dict]:
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def bn_apply(
    p: dict,
    s: dict,
    x: jnp.ndarray,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, dict]:
    """Returns (y, new_state).  Matches ``nn.BatchNorm2d``: train mode
    normalizes by biased batch variance and updates running stats with the
    unbiased variance."""
    if train:
        x32 = x.astype(jnp.float32)
        axes = (0, 1, 2)
        mean = x32.mean(axes)
        var = x32.var(axes)
        n = x32.shape[0] * x32.shape[1] * x32.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * (inv * p["scale"]).astype(x.dtype) + p["bias"].astype(x.dtype)
    return y, new_state


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2, pad: int = 1) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel, stride, padding)`` with ceil_mode=False."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


# ---------------------------------------------------------------------------
# bottleneck block


def _bottleneck_init(key, cin, width, stride, dtype):
    ks = jax.random.split(key, 4)
    cout = width * EXPANSION
    p, s = {}, {}
    p["conv1"] = conv_init(ks[0], 1, 1, cin, width, dtype)
    p["bn1"], s["bn1"] = bn_init(width, dtype)
    p["conv2"] = conv_init(ks[1], 3, 3, width, width, dtype)
    p["bn2"], s["bn2"] = bn_init(width, dtype)
    p["conv3"] = conv_init(ks[2], 1, 1, width, cout, dtype)
    p["bn3"], s["bn3"] = bn_init(cout, dtype)
    if stride != 1 or cin != cout:
        p["downsample_conv"] = conv_init(ks[3], 1, 1, cin, cout, dtype)
        p["downsample_bn"], s["downsample_bn"] = bn_init(cout, dtype)
    return p, s


def _bottleneck_apply(p, s, x, stride, *, train, dtype):
    ns = {}
    out = conv_apply(p["conv1"], x, 1, "SAME", dtype)
    out, ns["bn1"] = bn_apply(p["bn1"], s["bn1"], out, train=train)
    out = jax.nn.relu(out)
    # torchvision puts the stride on the 3x3 conv with padding 1
    out = conv_apply(p["conv2"], out, stride, ((1, 1), (1, 1)), dtype)
    out, ns["bn2"] = bn_apply(p["bn2"], s["bn2"], out, train=train)
    out = jax.nn.relu(out)
    out = conv_apply(p["conv3"], out, 1, "SAME", dtype)
    out, ns["bn3"] = bn_apply(p["bn3"], s["bn3"], out, train=train)
    if "downsample_conv" in p:
        idn = conv_apply(p["downsample_conv"], x, stride, "VALID", dtype)
        idn, ns["downsample_bn"] = bn_apply(p["downsample_bn"], s["downsample_bn"], idn, train=train)
    else:
        idn = x
    return jax.nn.relu(out + idn), ns


# ---------------------------------------------------------------------------
# full trunk


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _layer_dict(blocks_p, blocks_s):
    """Stage layout: the first block (stride / channel change, has the
    downsample path) stays standalone; the remaining blocks are homogeneous
    and stored stacked so the apply can ``lax.scan`` over them — one compiled
    block body per stage instead of 23 copies in layer3 of ResNet-101, which
    cuts full-model XLA compile time by an order of magnitude."""
    p = {"first": blocks_p[0]}
    s = {"first": blocks_s[0]}
    if len(blocks_p) > 1:
        p["rest"] = _stack_trees(blocks_p[1:])
        s["rest"] = _stack_trees(blocks_s[1:])
    return p, s


def resnet_init(key: jax.Array, depth: int = 50, in_chans: int = 3, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, batch_stats) for the trunk of ResNet-{depth}."""
    layers = RESNET_LAYERS[depth]
    key, k_stem = jax.random.split(key)
    p: dict = {"conv1": conv_init(k_stem, 7, 7, in_chans, 64, dtype)}
    s: dict = {}
    p["bn1"], s["bn1"] = bn_init(64, dtype)
    cin = 64
    for li, (blocks, width) in enumerate(zip(layers, (64, 128, 256, 512)), start=1):
        stride = 1 if li == 1 else 2
        bp, bs = [], []
        for b in range(blocks):
            key, kb = jax.random.split(key)
            pb, sb = _bottleneck_init(kb, cin, width, stride if b == 0 else 1, dtype)
            bp.append(pb)
            bs.append(sb)
            cin = width * EXPANSION
        p[f"layer{li}"], s[f"layer{li}"] = _layer_dict(bp, bs)
    return p, s


def resnet_apply(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    *,
    depth: int = 50,
    train: bool = False,
    dtype=None,
    unroll: bool = False,
    block_remat: bool = False,
    stem_s2d: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """x: [B, H, W, 3] normalized images.  Returns ([B, H/32, W/32, 2048],
    new_batch_stats).

    ``unroll=True`` replaces the per-stage ``lax.scan`` with a Python loop
    over static block slices: same numerics (the blocks are identical
    programs either way), slower compile, ~19% faster ResNet-101 backward
    (XLA schedules each block's dgrad/wgrad individually instead of through
    the scan's stacked-carry machinery).

    ``block_remat=True`` wraps each bottleneck block in ``jax.checkpoint``:
    only block-boundary activations stay resident across the backward and
    each block's interior is recomputed one block at a time — per-block
    peak memory instead of whole-trunk, without 'trunk'-remat's full second
    forward before the backward can start."""
    layers = RESNET_LAYERS[depth]
    block = _bottleneck_apply
    if block_remat:
        def block(p, s, x, stride, *, train, dtype):
            fn = lambda p_, s_, x_: _bottleneck_apply(
                p_, s_, x_, stride, train=train, dtype=dtype)
            return jax.checkpoint(fn)(p, s, x)
    ns: dict = {}
    if stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        out = stem_s2d_apply(params["conv1"], x, dtype)
    else:
        out = conv_apply(params["conv1"], x, 2, ((3, 3), (3, 3)), dtype)
    out, ns["bn1"] = bn_apply(params["bn1"], state["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = max_pool(out, 3, 2, 1)
    for li in range(1, len(layers) + 1):
        lp, ls = params[f"layer{li}"], state[f"layer{li}"]
        stride = 1 if li == 1 else 2
        out, ns_first = block(lp["first"], ls["first"], out, stride,
                              train=train, dtype=dtype)
        ns_layer = {"first": ns_first}
        if "rest" in lp:
            if unroll:
                n = jax.tree_util.tree_leaves(lp["rest"])[0].shape[0]
                ns_rest = []
                for b in range(n):
                    pb = jax.tree_util.tree_map(lambda a: a[b], lp["rest"])
                    sb = jax.tree_util.tree_map(lambda a: a[b], ls["rest"])
                    out, nsb = block(pb, sb, out, 1, train=train, dtype=dtype)
                    ns_rest.append(nsb)
                ns_layer["rest"] = _stack_trees(ns_rest)
            else:
                def body(x_carry, ps):
                    pb, sb = ps
                    y, nsb = block(pb, sb, x_carry, 1, train=train, dtype=dtype)
                    return y, nsb

                out, ns_layer["rest"] = jax.lax.scan(body, out, (lp["rest"], ls["rest"]))
        ns[f"layer{li}"] = ns_layer
    return out, ns


# ---------------------------------------------------------------------------
# torch checkpoint import


def import_torch_state_dict(state_dict: dict, depth: int) -> tuple[dict, dict]:
    """Convert a torchvision-format ResNet ``state_dict`` (e.g. the Places365
    ``resnet50_places365.pth.tar`` after stripping the ``module.`` prefix,
    reference ``models/Multi_GCN_Multihead_att.py:586-595``) into this
    module's (params, batch_stats) pytrees.  Tensors may be torch tensors or
    numpy arrays."""

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def conv_w(name):
        w = arr(state_dict[name])  # [O, I, kh, kw] -> [kh, kw, I, O]
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32)}

    def bn(name):
        p = {
            "scale": jnp.asarray(arr(state_dict[f"{name}.weight"]), jnp.float32),
            "bias": jnp.asarray(arr(state_dict[f"{name}.bias"]), jnp.float32),
        }
        s = {
            "mean": jnp.asarray(arr(state_dict[f"{name}.running_mean"]), jnp.float32),
            "var": jnp.asarray(arr(state_dict[f"{name}.running_var"]), jnp.float32),
        }
        return p, s

    layers = RESNET_LAYERS[depth]
    p: dict = {"conv1": conv_w("conv1.weight")}
    s: dict = {}
    p["bn1"], s["bn1"] = bn("bn1")
    for li, blocks in enumerate(layers, start=1):
        bp, bs = [], []
        for b in range(blocks):
            pre = f"layer{li}.{b}"
            pb: dict = {}
            sb: dict = {}
            for ci in (1, 2, 3):
                pb[f"conv{ci}"] = conv_w(f"{pre}.conv{ci}.weight")
                pb[f"bn{ci}"], sb[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in state_dict:
                pb["downsample_conv"] = conv_w(f"{pre}.downsample.0.weight")
                pb["downsample_bn"], sb["downsample_bn"] = bn(f"{pre}.downsample.1")
            bp.append(pb)
            bs.append(sb)
        p[f"layer{li}"], s[f"layer{li}"] = _layer_dict(bp, bs)
    return p, s

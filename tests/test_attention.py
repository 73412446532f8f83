"""Attention-block parity against torch oracles built from the reference's
published equations (scaled-dot MHA + FFN + torch-std LayerNorm; elementwise
label-query attention)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from mgnns_tpu.nn import attention as attn


def torch_mha_oracle(p, q, k, v, mask, n_head, d_k, d_v):
    """Reference MultiHeadAttention math (submodules.py:55-94), dropout off."""
    q, k, v = map(torch.from_numpy, (q, k, v))
    B, Lq, dm = q.shape
    Lk = k.shape[1]
    W = lambda name: torch.from_numpy(np.asarray(p[name]["w"]))
    bias = lambda name: torch.from_numpy(np.asarray(p[name]["b"]))
    residual = q
    qh = (q @ W("w_qs") + bias("w_qs")).view(B, Lq, n_head, d_k)
    kh = (k @ W("w_ks") + bias("w_ks")).view(B, Lk, n_head, d_k)
    vh = (v @ W("w_vs") + bias("w_vs")).view(B, Lk, n_head, d_v)
    qh = qh.permute(2, 0, 1, 3).reshape(-1, Lq, d_k)
    kh = kh.permute(2, 0, 1, 3).reshape(-1, Lk, d_k)
    vh = vh.permute(2, 0, 1, 3).reshape(-1, Lk, d_v)
    a = qh @ kh.transpose(1, 2) / np.power(d_k, 0.5)
    if mask is not None:
        m = torch.from_numpy(mask).repeat(n_head, 1, 1)
        a = a.masked_fill(m == 0.0, float("-inf"))
    a = torch.softmax(a, dim=2)
    out = a @ vh
    out = out.view(n_head, B, Lq, d_v).permute(1, 2, 0, 3).reshape(B, Lq, -1)
    out = out @ W("fc") + bias("fc")
    out = out + residual
    mean = out.mean(-1, keepdim=True)
    std = out.std(-1, keepdim=True)
    gamma = torch.from_numpy(np.asarray(p["ln"]["gamma"]))
    beta = torch.from_numpy(np.asarray(p["ln"]["beta"]))
    return gamma * (out - mean) / (std + 1e-6) + beta


@pytest.mark.parametrize("with_mask", [False, True])
def test_mha_matches_oracle(rng, with_mask):
    B, Lq, Lk, dm, H, dk = 3, 1, 7, 12, 4, 5
    p = attn.mha_init(jax.random.key(0), H, dm, dk, dk)
    q = rng.standard_normal((B, Lq, dm)).astype(np.float32)
    k = rng.standard_normal((B, Lk, dm)).astype(np.float32)
    v = rng.standard_normal((B, Lk, dm)).astype(np.float32)
    mask = None
    if with_mask:
        mask = (rng.uniform(size=(B, Lq, Lk)) > 0.3).astype(np.float32)
        mask[:, :, 0] = 1.0  # keep at least one valid key
    out, a = attn.mha_apply(p, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask) if mask is not None else None,
                            n_head=H, d_k=dk, d_v=dk, train=False)
    oracle = torch_mha_oracle(p, q, k, v, mask, H, dk, dk)
    np.testing.assert_allclose(np.asarray(out), oracle.numpy(), atol=2e-5)


def test_mha_head_diversity_value(rng):
    B, H, dv = 4, 3, 6
    x = rng.standard_normal((B, H, dv)).astype(np.float32)
    ours = np.asarray(attn.head_diversity(jnp.asarray(x)))
    xt = torch.nn.functional.normalize(torch.from_numpy(x), p=2, dim=-1)
    cos = xt @ xt.transpose(1, 2)
    cos2 = cos**2
    idx = torch.arange(H)
    cos2[:, idx, idx] = 0
    expected = cos2.sum(dim=[1, 2]) / (H * (H - 1))
    np.testing.assert_allclose(ours, expected.numpy(), atol=1e-5)


def test_ffn_matches_oracle(rng):
    B, L, dm = 2, 3, 10
    p = attn.ffn_init(jax.random.key(1), dm, dm)
    x = rng.standard_normal((B, L, dm)).astype(np.float32)
    out = attn.ffn_apply(p, jnp.asarray(x), train=False)
    xt = torch.from_numpy(x)
    W1 = torch.from_numpy(np.asarray(p["w_1"]["w"]))
    b1 = torch.from_numpy(np.asarray(p["w_1"]["b"]))
    W2 = torch.from_numpy(np.asarray(p["w_2"]["w"]))
    b2 = torch.from_numpy(np.asarray(p["w_2"]["b"]))
    o = torch.relu(xt @ W1 + b1) @ W2 + b2
    o = o + xt
    mean, std = o.mean(-1, keepdim=True), o.std(-1, keepdim=True)
    o = (o - mean) / (std + 1e-6)
    np.testing.assert_allclose(np.asarray(out), o.numpy(), atol=2e-5)


def test_my_mha_shapes(rng):
    B, L, dm = 4, 9, 300
    p = attn.my_mha_init(jax.random.key(2), 4, dm, 128)
    q = jnp.asarray(rng.standard_normal((B, dm)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((B, L, dm)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.float32)
    out, a = attn.my_mha_apply(p, q, kv, kv, mask, n_head=4, d_kv=128, train=False)
    assert out.shape == (B, dm)
    out2, a2, hd = attn.my_mha_apply(p, q, kv, kv, mask, n_head=4, d_kv=128, train=False, is_regu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    assert hd.shape == (B,)


def naive_label_attention(p, query, key, value, n_heads):
    """Loop transcription of reference Attention.forward (:88-133)."""
    C, hid = query.shape
    B = key.shape[0]
    dh = hid // n_heads
    Q = (query @ np.asarray(p["w_q"]["w"]) + np.asarray(p["w_q"]["b"])).reshape(C, n_heads, dh)
    K = (key @ np.asarray(p["w_k"]["w"]) + np.asarray(p["w_k"]["b"])).reshape(B, n_heads, dh)
    V = (value @ np.asarray(p["w_v"]["w"]) + np.asarray(p["w_v"]["b"])).reshape(B, n_heads, dh)
    scale = np.sqrt(hid // n_heads)
    out = np.zeros((B, C, hid), np.float32)
    for b in range(B):
        energy = Q * K[b][None, :, :] / scale  # [C, H, dh]
        e = np.exp(energy - energy.max(-1, keepdims=True))
        a = e / e.sum(-1, keepdims=True)
        x = a * V[b][None, :, :]
        out[b] = x.reshape(C, hid)
    return out @ np.asarray(p["fc"]["w"]) + np.asarray(p["fc"]["b"])


def test_label_attention_matches_naive(rng):
    C, hid, img_dim, B, H = 7, 300, 80, 3, 5
    p = attn.label_attention_init(jax.random.key(3), hid, img_dim)
    q = rng.standard_normal((C, hid)).astype(np.float32)
    kv = rng.standard_normal((B, img_dim)).astype(np.float32)
    ours = np.asarray(attn.label_attention_apply(p, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                                                 n_heads=H, train=False))
    expected = naive_label_attention(p, q, kv, kv, H)
    np.testing.assert_allclose(ours, expected, atol=2e-5)
    assert ours.shape == (B, C, hid)

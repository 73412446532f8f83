"""Attention blocks: cross-modal multi-head attention, position-wise FFN, and
the label-query element-wise attention over GCN-fused image vectors.

Behavioral parity targets:

- :func:`mha_apply` — reference ``models/submodules.py:15-119``
  (``MultiHeadAttention`` + ``ScaledDotProductAttention``): scaled dot
  product with temperature sqrt(d_k), ``mask == 0 -> -inf``, attention
  dropout, output projection + dropout, residual + torch-std LayerNorm,
  optional head-diversity penalty (``diff_outputs``, ``:38-53``).
- :func:`my_mha_apply` — the 1-query wrapper + position-wise FFN
  (reference ``models/moudles.py:198-230``; FFN at ``submodules.py:122-139``).
- :func:`label_attention_apply` — the nonstandard label-query attention
  (reference ``models/Multi_GCN_Multihead_att.py:65-133``): per-head
  *element-wise* Q*K energies (not dot products), softmax over the per-head
  feature slice, element-wise product with V.  The reference's Python loop
  over the batch is replaced by broadcasting.

All heavy contractions run through ``jnp.einsum`` so XLA tiles them onto the
MXU; no (batch*head) reshuffling is materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.nn.core import (
    RngStream,
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)


# ---------------------------------------------------------------------------
# Multi-head cross attention (reference submodules.MultiHeadAttention)


def mha_init(key: jax.Array, n_head: int, d_model: int, d_k: int, d_v: int, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    std_qk = ("normal", np.sqrt(2.0 / (d_model + d_k)))
    std_v = ("normal", np.sqrt(2.0 / (d_model + d_v)))
    return {
        "w_qs": linear_init(k1, d_model, n_head * d_k, w_init=std_qk, dtype=dtype),
        "w_ks": linear_init(k2, d_model, n_head * d_k, w_init=std_qk, dtype=dtype),
        "w_vs": linear_init(k3, d_model, n_head * d_v, w_init=std_v, dtype=dtype),
        "fc": linear_init(k4, n_head * d_v, d_model, w_init="xavier_normal", dtype=dtype),
        "ln": layer_norm_init(d_model, dtype),
    }


def head_diversity(output_heads: jnp.ndarray) -> jnp.ndarray:
    """Mean squared pairwise cosine similarity across heads (reference
    ``diff_outputs``, ``models/submodules.py:38-53``).

    Args:
      output_heads: [B, n_head, d_v] per-head outputs for the single query.
    Returns:
      [B] penalty.
    """
    # sqrt(sum^2 + eps) rather than ||x|| + eps: the norm's gradient at an
    # exactly-zero head (dropout can produce one) is NaN and would poison the
    # whole update through the regularizer.
    x = output_heads / jnp.sqrt(
        jnp.sum(output_heads**2, axis=-1, keepdims=True) + 1e-12
    )
    n_head = output_heads.shape[1]
    if n_head < 2:
        # no cross-head pairs to decorrelate; 0/0 would NaN the loss
        return jnp.zeros(output_heads.shape[0], output_heads.dtype)
    cos = jnp.einsum("bhd,bgd->bhg", x, x)
    cos = cos * (1.0 - jnp.eye(n_head, dtype=cos.dtype))
    cos2 = cos**2
    return cos2.sum(axis=(1, 2)) / (n_head * (n_head - 1))


def mha_apply(
    p: dict,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    n_head: int,
    d_k: int,
    d_v: int,
    dropout_rate: float = 0.1,
    train: bool = False,
    rng: jax.Array | None = None,
    is_regu: bool = False,
    dtype=None,
):
    """q [B, Lq, d_model], k/v [B, Lk, d_model], mask [B, Lq, Lk] float
    (0.0 = masked).  Head geometry (n_head, d_k, d_v) is static, not stored in
    the param pytree.  Returns (out [B, Lq, d_model], attn [B, H, Lq, Lk]) or
    (out, attn, head_diff [B]) when ``is_regu``."""
    H = n_head
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    rngs = RngStream(rng)

    residual = q
    qh = linear_apply(p["w_qs"], q, dtype).reshape(B, Lq, H, d_k)
    kh = linear_apply(p["w_ks"], k, dtype).reshape(B, Lk, H, d_k)
    vh = linear_apply(p["w_vs"], v, dtype).reshape(B, Lk, H, d_v)

    attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d_k).astype(np.float32)
    if mask is not None:
        attn = jnp.where(mask[:, None, :, :] == 0.0, -jnp.inf, attn)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
    attn = dropout(attn, dropout_rate, rngs.next("attn"), train)
    out_h = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)  # [B, Lq, H, d_v]

    regu = None
    if is_regu:
        regu = head_diversity(out_h[:, 0, :, :])

    out = linear_apply(p["fc"], out_h.reshape(B, Lq, H * d_v), dtype)
    out = dropout(out, dropout_rate, rngs.next("proj"), train)
    out = layer_norm_apply(p["ln"], out + residual)
    if is_regu:
        return out, attn, regu
    return out, attn


# ---------------------------------------------------------------------------
# Position-wise feed-forward (reference submodules.PositionwiseFeedForward)


def ffn_init(key: jax.Array, d_in: int, d_hid: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w_1": linear_init(k1, d_in, d_hid, dtype=dtype),
        "w_2": linear_init(k2, d_hid, d_in, dtype=dtype),
        "ln": layer_norm_init(d_in, dtype),
    }


def ffn_apply(
    p: dict,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.1,
    train: bool = False,
    rng: jax.Array | None = None,
    dtype=None,
) -> jnp.ndarray:
    residual = x
    out = linear_apply(p["w_2"], jax.nn.relu(linear_apply(p["w_1"], x, dtype)), dtype)
    out = dropout(out, dropout_rate, rng, train)
    return layer_norm_apply(p["ln"], out + residual)


# ---------------------------------------------------------------------------
# The 1-query wrapper (reference moudles.MyMultiHeadAttention)


def my_mha_init(key: jax.Array, n_head: int, d_model: int, d_kv: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "slf_attn": mha_init(k1, n_head, d_model, d_kv, d_kv, dtype),
        "pos_ffn": ffn_init(k2, d_model, d_model, dtype),
    }


def my_mha_apply(
    p: dict,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    n_head: int,
    d_kv: int,
    dropout_rate: float = 0.1,
    train: bool = False,
    rng: jax.Array | None = None,
    is_regu: bool = False,
    dtype=None,
):
    """q [B, d_model]; k/v [B, L, d_model]; mask [B, L] float or None.
    Returns (out [B, d_model], attn) (+ head_diff when is_regu)."""
    rngs = RngStream(rng)
    q3 = q[:, None, :]
    mask3 = mask[:, None, :] if mask is not None else None
    res = mha_apply(
        p["slf_attn"], q3, k, v, mask3,
        n_head=n_head, d_k=d_kv, d_v=d_kv,
        dropout_rate=dropout_rate, train=train, rng=rngs.next("mha"),
        is_regu=is_regu, dtype=dtype,
    )
    out = ffn_apply(p["pos_ffn"], res[0], dropout_rate=dropout_rate, train=train,
                    rng=rngs.next("ffn"), dtype=dtype)
    out = out[:, 0, :]
    if is_regu:
        return out, res[1], res[2]
    return out, res[1]


# ---------------------------------------------------------------------------
# "Another" 1-query MHA (reference moudles.MyAnotherMultiHeadAttention)
#
# The reference's AnotherMultiHeadAttention (moudles.py:232-288) differs from
# MultiHeadAttention only in how it interleaves the (batch, head) axes before
# the batched matmul — per-(b, h) attention math is identical, and its two
# call sites pass no mask (need_mask=False), so the einsum formulation above
# covers both exactly.  Provided as named aliases for API parity; the
# text_object_text / text_place_text stages built from it are commented out
# of the reference forward (Multi_GCN_Multihead_att.py:516-532).

my_another_mha_init = my_mha_init
my_another_mha_apply = my_mha_apply


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (reference submodules.PositionalEncoding)


def positional_encoding_table(d_hid: int, n_position: int = 200) -> jnp.ndarray:
    """[n_position, d_hid] sinusoid table (reference ``submodules.py:159-179``):
    angle(pos, j) = pos / 10000^(2*(j//2)/d_hid); sin on even dims, cos on odd.

    The reference defines this module but never instantiates it (no call site
    in any forward), so the table appears in no checkpoint; it is provided as
    a pure function for API-surface parity and for encoder variants that want
    absolute positions.  Computed vectorized instead of the reference's
    per-position Python list comprehension.
    """
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angles = pos / np.power(10000.0, 2.0 * np.floor(j / 2.0) / d_hid)
    table = np.where(np.arange(d_hid)[None, :] % 2 == 0,
                     np.sin(angles), np.cos(angles))
    return jnp.asarray(table, jnp.float32)


def add_positional_encoding(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """x [B, L, D] + table[:L] (reference ``submodules.py:181-182``:
    ``x + pos_table[:, :x.size(1)].detach()``)."""
    return x + jax.lax.stop_gradient(table[: x.shape[1]])[None, :, :]


# ---------------------------------------------------------------------------
# Label-query element-wise attention (reference Multi_GCN_Multihead_att.Attention)


def label_attention_init(
    key: jax.Array, hid_dim: int, image_dim: int, dtype=jnp.float32
) -> dict:
    """The query count (num_labels) is not a parameter shape — queries come
    from the label-embedding constant at apply time."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_q": linear_init(k1, hid_dim, hid_dim, dtype=dtype),
        "w_k": linear_init(k2, image_dim, hid_dim, dtype=dtype),
        "w_v": linear_init(k3, image_dim, hid_dim, dtype=dtype),
        "fc": linear_init(k4, hid_dim, hid_dim, dtype=dtype),
    }


def label_attention_apply(
    p: dict,
    query: jnp.ndarray,
    key_: jnp.ndarray,
    value: jnp.ndarray,
    *,
    n_heads: int = 5,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """query: label embeddings [num_labels, hid_dim]; key_/value: fused image
    vectors [B, image_dim].  Returns [B, num_labels, hid_dim].

    Faithful to reference ``models/Multi_GCN_Multihead_att.py:88-133``:
    energies are *element-wise* products Q*K reshaped to heads, scaled by
    sqrt(hid_dim / n_heads), softmaxed over the per-head feature slice, and
    multiplied element-wise with V (the batch loop at ``:111-116`` is a
    broadcast here).
    """
    hid_dim = query.shape[-1]
    n_labels = query.shape[0]
    dh = hid_dim // n_heads
    Q = linear_apply(p["w_q"], query).reshape(n_labels, n_heads, dh)
    K = linear_apply(p["w_k"], key_).reshape(-1, n_heads, dh)
    V = linear_apply(p["w_v"], value).reshape(-1, n_heads, dh)
    scale = jnp.sqrt(jnp.asarray(float(dh), jnp.float32))
    energy = Q[None, :, :, :] * K[:, None, :, :] / scale        # [B, C, H, dh]
    attn = jax.nn.softmax(energy, axis=-1)
    attn = dropout(attn, dropout_rate, rng, train)
    x = attn * V[:, None, :, :]                                  # [B, C, H, dh]
    x = x.reshape(x.shape[0], n_labels, hid_dim)
    return linear_apply(p["fc"], x)

"""Core primitives: linear, layer norm, dropout, embedding, RNG streams.

Initializers reproduce the PyTorch defaults the reference relies on:
``nn.Linear`` draws W and b from U(-1/sqrt(fan_in), +1/sqrt(fan_in));
``nn.Embedding`` draws N(0, 1); the custom ``LayerNorm`` in reference
``models/submodules.py:142-156`` normalizes by the *unbiased* standard
deviation with eps added to std (not to variance).
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# RNG streams


def fold(key: jax.Array, name: str) -> jax.Array:
    """Derive a named sub-key deterministically from ``key``.

    Uses crc32, NOT Python's ``hash`` — str hashing is salted per process, so
    hash-derived fold-in constants would make dropout masks irreproducible
    under a fixed seed and would diverge across hosts in multi-host SPMD.
    """
    h = np.uint32(zlib.crc32(name.encode()))
    return jax.random.fold_in(key, h)


class RngStream:
    """Hands out per-call-site dropout keys derived from one root key.

    Usage inside an apply function::

        rngs = RngStream(rng)
        x = dropout(x, 0.5, rngs.next("attn"), train)
    """

    def __init__(self, key: jax.Array | None):
        self._key = key
        self._count = 0

    def next(self, name: str = "") -> jax.Array | None:
        if self._key is None:
            return None
        self._count += 1
        return fold(jax.random.fold_in(self._key, self._count), name)


# ---------------------------------------------------------------------------
# Linear


def linear_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    w_init: str = "torch",
    dtype=jnp.float32,
) -> dict:
    """``w_init``: 'torch' (U(+-1/sqrt(in))), 'xavier_normal', or
    ('normal', std)."""
    kw, kb = jax.random.split(key)
    if w_init == "torch":
        bound = 1.0 / np.sqrt(in_dim)
        w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    elif w_init == "xavier_normal":
        std = np.sqrt(2.0 / (in_dim + out_dim))
        w = std * jax.random.normal(kw, (in_dim, out_dim), dtype)
    elif isinstance(w_init, tuple) and w_init[0] == "normal":
        w = w_init[1] * jax.random.normal(kw, (in_dim, out_dim), dtype)
    else:
        raise ValueError(f"unknown w_init {w_init!r}")
    p = {"w": w}
    if bias:
        bound = 1.0 / np.sqrt(in_dim)
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear_apply(p: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = x @ w
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (torch-std flavor used by the reference)


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}


def layer_norm_apply(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """``gamma * (x - mean) / (std + eps) + beta`` with *unbiased* std —
    faithful to reference ``models/submodules.py:153-156`` (``x.std`` in torch
    defaults to ddof=1)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    n = x.shape[-1]
    var = ((x32 - mean) ** 2).sum(-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    out = p["gamma"] * (x32 - mean) / (std + eps) + p["beta"]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array | None, train: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or rng is None."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Embedding


def embedding_init(
    key: jax.Array,
    vocab_size: int,
    dim: int,
    padding_idx: int | None = None,
    weights: np.ndarray | None = None,
    dtype=jnp.float32,
) -> dict:
    """N(0,1) init like ``nn.Embedding``, optionally overridden by a
    pretrained matrix; the padding row is zeroed either way (reference
    ``models/Multi_GCN_Multihead_att.py:353-364``)."""
    if weights is not None:
        table = jnp.asarray(weights, dtype)
        assert table.shape == (vocab_size, dim), (table.shape, vocab_size, dim)
    else:
        table = jax.random.normal(key, (vocab_size, dim), dtype)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {"table": table}


def embedding_apply(p: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return p["table"][ids]


# ---------------------------------------------------------------------------
# Gather with MXU-friendly backward
#
# The VJP of a row gather is a scatter-add, which XLA:TPU executes as a slow
# serialized loop (~8 ms for [16x100] rows into [20k, 300] — measured).  The
# same contraction expressed as one_hot(ids)^T @ g is a single MXU matmul
# (~0.2 ms) that XLA fuses the iota-compare one-hot into.  Numerics are
# identical up to f32 summation order.


import functools


@functools.lru_cache(maxsize=None)
def _take_rows_fn(tshape: tuple, tdtype: str):
    """custom_vjp gather specialized to a (static) table shape/dtype."""

    @jax.custom_vjp
    def f(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], ids

    def bwd(ids, g):
        V = tshape[0]
        flat_ids = ids.reshape(-1)                                  # [N]
        gf = g.reshape(flat_ids.shape[0], -1).astype(jnp.float32)   # [N, D]
        onehot = flat_ids[:, None] == jnp.arange(V, dtype=flat_ids.dtype)[None, :]
        gtab = jnp.einsum("nv,nd->vd", onehot.astype(jnp.float32), gf)
        return gtab.reshape(tshape).astype(tdtype), None

    f.defvjp(fwd, bwd)
    return f


# above this many one-hot elements the matmul backward's [N, V] operand gets
# memory-expensive; fall back to XLA's scatter-add
_TAKE_ROWS_MATMUL_LIMIT = 256 * 1024 * 1024


def take_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` whose backward is an MXU matmul instead of a scatter."""
    n = int(np.prod(ids.shape)) if ids.ndim else 1
    if n * table.shape[0] <= _TAKE_ROWS_MATMUL_LIMIT:
        return _take_rows_fn(tuple(table.shape), jnp.dtype(table.dtype).name)(table, ids)
    return table[ids]


# ---------------------------------------------------------------------------
# Activations


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)

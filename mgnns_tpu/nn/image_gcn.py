"""Dense label-graph convolution for the image channels.

Reference ``models/Multi_GCN_Multihead_att.py:30-63`` (``GraphConvolution``):
``out = adj @ (x @ W)`` with U(+-1/sqrt(out_features)) init (the reference's
``stdv = 1/sqrt(weight.size(1))`` with weight [in, out]), optional bias.
The 80/365-node graphs are tiny, so these are plain MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def graph_conv_init(
    key: jax.Array, in_features: int, out_features: int, bias: bool = False, dtype=jnp.float32
) -> dict:
    kw, kb = jax.random.split(key)
    stdv = 1.0 / np.sqrt(out_features)
    p = {"w": jax.random.uniform(kw, (in_features, out_features), dtype, -stdv, stdv)}
    if bias:
        p["b"] = jax.random.uniform(kb, (1, 1, out_features), dtype, -stdv, stdv)
    return p


def graph_conv_apply(p: dict, x: jnp.ndarray, adj: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w = p["w"]
    if dtype is not None:
        x, w, adj = x.astype(dtype), w.astype(dtype), adj.astype(dtype)
    support = x @ w
    out = adj @ support
    if "b" in p:
        out = out + p["b"].reshape(-1).astype(out.dtype)
    return out

"""Text-level GCN with edge-weighted max aggregation, batch-static on TPU.

Reformulates the reference's per-document DGL subgraph pipeline
(``models/Text_GCN.py:142-275``) as dense, statically-shaped tensor ops:

reference semantics (per document):
  1. de-pad; nodes = unique words; trainable GloVe-init node embeddings;
  2. edges = sliding window of radius ``ngram`` over token positions, plus a
     self loop per position; each edge carries a trainable scalar weight
     looked up by the *global* (src_word, dst_word) edge id, with id 0 shared
     by all pairs absent from the PMI graph (``models/Text_GCN.py:58-72``,
     ``utils/pmi.py:89-105``);
  3. message = src_embedding * edge_weight; reduce = **max** over incoming
     messages (``dgl.function.src_mul_edge`` + ``max``, ``:242-249``);
     message-less nodes produce zeros;
  4. the eta gate is freshly zero-filled every forward (``:258-262``), so the
     post-gate embedding equals the aggregated message — reproduced by
     simply using the aggregation output;
  5. readout = sum over unique-word nodes -> dropout -> ReLU (``:268-275``).

TPU formulation (batch [B, L], L = max_len, W = 2*ngram+1):
  - per-position messages: for window offset o, the source embedding is a
    static shift of the token-embedding tensor and the edge weight is a
    gather from the [E, 1] weight table via host-precomputed window edge ids
    (:func:`mgnns_tpu.graphs.pmi.doc_window_edge_ids`) — no per-doc Python,
    no dynamic shapes, no D2H sync;
  - the unique-word max is a scatter-max of per-position maxima into each
    word's first-occurrence slot, and the readout sums those slots once.

Because padding is suffix-only, window offsets over de-padded positions equal
raw-position offsets, so validity is a pure function of ``lens``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.nn.core import dropout, take_rows

NEG_INF = -jnp.inf


def text_gcn_init(
    key: jax.Array,
    vocab_size: int,
    hidden_size: int,
    num_edges: int,
    node_weights: np.ndarray | None = None,
    edge_weights: np.ndarray | None = None,
    dtype=jnp.float32,
) -> dict:
    """``node_weights``: optional [V, D] GloVe matrix (reference
    ``models/Text_GCN.py:76``); ``edge_weights``: optional [E, 1] table
    (ones for the reference's trainable_edges=True, ``:68``)."""
    if node_weights is None:
        node_emb = jax.random.normal(key, (vocab_size, hidden_size), dtype)
    else:
        node_emb = jnp.asarray(node_weights, dtype)
    if edge_weights is None:
        edge_w = jnp.ones((num_edges, 1), dtype)
    else:
        edge_w = jnp.asarray(edge_weights, dtype)
    return {"node_embedding": node_emb, "edge_weight": edge_w}


def window_max_aggregate(
    emb: jnp.ndarray,      # [B, L, D] token embeddings
    w: jnp.ndarray,        # [B, L, W] edge weights (dst-major window)
    lens: jnp.ndarray,     # [B]
    ngram: int,
) -> jnp.ndarray:
    """Per-position max over edge-weighted window messages.

    ``out[b, j] = max_{o in [-g, g], 0 <= j+o < len_b} emb[b, j+o] * w[b, j, g+o]``
    for valid j, -inf rows for padded j.  This is the op the Pallas kernel in
    :mod:`mgnns_tpu.kernels.edge_max` accelerates; this jnp version is the
    reference implementation (XLA fuses it into a small number of VPU loops).
    """
    B, L, D = emb.shape
    pos = jnp.arange(L)
    valid_j = pos[None, :] < lens[:, None]  # [B, L]
    m = jnp.full((B, L, D), NEG_INF, emb.dtype)
    for k, o in enumerate(range(-ngram, ngram + 1)):
        s_pos = jnp.clip(pos + o, 0, L - 1)
        src = emb[:, s_pos, :]
        valid = ((pos + o >= 0) & (pos + o < lens[:, None]) & valid_j)  # [B, L]
        msg = src * w[:, :, k][:, :, None]
        m = jnp.maximum(m, jnp.where(valid[:, :, None], msg, NEG_INF))
    return m


def unique_word_readout(
    per_pos_max: jnp.ndarray,  # [B, L, D], -inf at invalid positions
    ids: jnp.ndarray,          # [B, L]
    lens: jnp.ndarray,         # [B]
) -> jnp.ndarray:
    """Sum over unique words of the max over that word's positions.

    Each position's aggregate is scatter-maxed into the slot of its word's
    first occurrence; the readout sums each slot once.  Matches DGL's
    node-level max over the union of all occurrences' incoming edges followed
    by ``dgl.sum_nodes`` (reference ``models/Text_GCN.py:242-268``).
    """
    B, L, D = per_pos_max.shape
    pos = jnp.arange(L)
    valid = pos[None, :] < lens[:, None]
    # Canonical slot = the word's FIRST occurrence, found in O(L log L) via a
    # stable per-row sort (invalid positions sort last behind a sentinel)
    # instead of an O(L^2) id-equality cube — so raising max_len for larger
    # corpora scales near-linearly.
    sentinel = jnp.iinfo(jnp.int32).max
    key_ids = jnp.where(valid, ids.astype(jnp.int32), sentinel)
    sidx = jnp.argsort(key_ids, axis=1, stable=True)          # [B, L]
    sorted_ids = jnp.take_along_axis(key_ids, sidx, axis=1)
    head = jnp.concatenate(
        [jnp.ones((B, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]], axis=1)
    # stable sort => within a segment of equal ids the original indices are
    # increasing, so the segment head carries the first occurrence; fill it
    # forward with a last-flagged-value-wins associative scan
    def fill(a, b):
        (va, fa), (vb, fb) = a, b
        return jnp.where(fb, vb, va), fa | fb

    canon_sorted, _ = jax.lax.associative_scan(
        fill, (jnp.where(head, sidx, 0), head), axis=1)
    b_idx = jnp.arange(B)[:, None]
    canon = jnp.zeros((B, L), jnp.int32).at[b_idx, sidx].set(canon_sorted)
    canon = jnp.where(valid, canon, L)                # dummy slot for padding
    out = jnp.full((B, L + 1, D), NEG_INF, per_pos_max.dtype)
    out = out.at[b_idx, canon].max(per_pos_max)
    out = out[:, :L, :]
    return jnp.where(jnp.isfinite(out), out, 0.0).sum(axis=1)


def text_gcn_apply(
    params: dict,
    ids: jnp.ndarray,    # [B, L] int token ids (0 = PAD, suffix padding)
    lens: jnp.ndarray,   # [B] true lengths
    eids: jnp.ndarray,   # [B, L, W] window edge ids from the host pipeline
    *,
    ngram: int,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng: jax.Array | None = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Document representations [B, D]."""
    emb = take_rows(params["node_embedding"], ids)   # [B, L, D] (matmul bwd)
    w = params["edge_weight"][:, 0][eids]            # [B, L, W]
    if use_pallas:
        from mgnns_tpu.kernels.edge_max import window_max_aggregate_pallas

        # interpreter mode off-TPU (CPU tests); compiled Mosaic kernel on TPU
        interpret = jax.default_backend() == "cpu"
        m = window_max_aggregate_pallas(emb, w, lens, ngram, interpret)
    else:
        m = window_max_aggregate(emb, w, lens, ngram)
    h = unique_word_readout(m, ids, lens)            # [B, D]
    h = dropout(h, dropout_rate, rng, train)
    return jax.nn.relu(h)

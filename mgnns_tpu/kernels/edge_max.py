"""Pallas kernel: windowed edge-weighted max aggregation for the text GCN.

This is the custom op that replaces DGL's ``src_mul_edge`` + ``max``
update_all (reference ``models/Text_GCN.py:242-249``) on TPU.  The jnp
reference implementation lives in
:func:`mgnns_tpu.nn.text_gcn.window_max_aggregate`; this kernel computes the
same ``out[b, j] = max_o emb[b, j+o] * w[b, j, g+o]`` but keeps the whole
[L, D] tile resident in VMEM across all 2*ngram+1 window offsets — one HBM
read of the embedding tile per document instead of one per offset, with the
shift realized as a VMEM ``pltpu.roll`` (no gather).

Grid: one program per document (B programs).  VMEM footprint per program is
L*D + L*W floats (~120 KB at L=100, D=300) — far under the ~16 MB budget.

Gradients: the op is wrapped in ``jax.custom_vjp`` whose backward pass is a
second Pallas kernel (:func:`_bwd_kernel`) that recomputes the forward max
chain in VMEM and distributes the cotangent through it with ``jnp.maximum``'s
balanced-tie semantics (0.5/0.5 at exact ties), so training with
``use_pallas=True`` produces gradients identical to the XLA path — without
XLA re-running its own forward inside the backward (set
``MGNNS_PALLAS_XLA_BWD=1`` to fall back to the jnp VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jax_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lens_ref, emb_ref, w_ref, out_ref, *, ngram: int):
    L, D = out_ref.shape
    # lens arrives whole via scalar prefetch; pick this program's document
    length = lens_ref[pl.program_id(0)]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    emb = emb_ref[:]
    w = w_ref[:]
    neg = jnp.float32(-jnp.inf)
    acc = jnp.full((L, D), neg, jnp.float32)
    for k, o in enumerate(range(-ngram, ngram + 1)):
        # source row j+o aligned to row j via circular roll; wrap-around rows
        # are killed by the validity mask.
        src = pltpu.roll(emb, (-o) % L, 0) if o != 0 else emb
        valid = (rows + o >= 0) & (rows + o < length) & (rows < length)
        msg = src * w[:, k][:, None]
        acc = jnp.maximum(acc, jnp.where(valid, msg, neg))
    out_ref[:] = acc


def _forward(emb: jnp.ndarray, w: jnp.ndarray, lens: jnp.ndarray, ngram: int,
             interpret: bool = False) -> jnp.ndarray:
    B, L, D = emb.shape
    W = 2 * ngram + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens [B] lives in SMEM, whole
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, L, D), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec((None, L, W), lambda b, lens: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, L, D), lambda b, lens: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, ngram=ngram),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
        interpret=interpret,
    )(lens.astype(jnp.int32), emb.astype(jnp.float32), w.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_max_aggregate_pallas(emb, w, lens, ngram: int, interpret: bool = False):
    """Drop-in Pallas replacement for
    :func:`mgnns_tpu.nn.text_gcn.window_max_aggregate`.

    Args:
      emb: [B, L, D] token embeddings.
      w: [B, L, W] window edge weights (destination-major).
      lens: [B] valid lengths.
      ngram: window radius (static).
      interpret: run in the Pallas interpreter (CPU testing).
    """
    return _forward(emb, w, lens, ngram, interpret)


def _bwd_kernel(lens_ref, emb_ref, w_ref, g_ref, demb_ref, dw_ref, *, ngram: int):
    """Backward: recompute the forward max chain, then walk it in reverse.

    ``jnp.maximum``'s VJP sends the cotangent to each operand via
    ``(operand == ans) / (1 + (other == ans))`` — 1 to a strict winner,
    0.5/0.5 at an exact tie — with the running accumulator's initial
    ``full(-inf)`` a constant that absorbs no gradient.  Reproducing that
    chain exactly keeps pallas-trained gradients bit-comparable to the XLA
    path (parity-tested incl. engineered ties).
    """
    L, D = demb_ref.shape
    length = lens_ref[pl.program_id(0)]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    emb = emb_ref[:]
    w = w_ref[:]
    g = g_ref[:]
    neg = jnp.float32(-jnp.inf)
    offsets = list(range(-ngram, ngram + 1))

    # forward chain, keeping every intermediate accumulator in VMEM
    accs = [jnp.full((L, D), neg, jnp.float32)]
    msgs, valids, srcs = [], [], []
    for k, o in enumerate(offsets):
        src = pltpu.roll(emb, (-o) % L, 0) if o != 0 else emb
        valid = (rows + o >= 0) & (rows + o < length) & (rows < length)
        msg = jnp.where(valid, src * w[:, k][:, None], neg)
        accs.append(jnp.maximum(accs[-1], msg))
        msgs.append(msg)
        valids.append(valid)
        srcs.append(src)

    g_acc = g
    d_emb = jnp.zeros((L, D), jnp.float32)
    dw_cols = [None] * len(offsets)
    one = jnp.float32(1.0)
    for k in range(len(offsets) - 1, -1, -1):
        prev, msg, out = accs[k], msgs[k], accs[k + 1]
        msg_hits = (msg == out).astype(jnp.float32)
        prev_hits = (prev == out).astype(jnp.float32)
        d_msg = g_acc * msg_hits / (one + prev_hits)
        g_acc = g_acc * prev_hits / (one + msg_hits)
        # msg = where(valid, src * w, -inf): gradient only where valid
        d_msg = jnp.where(valids[k], d_msg, 0.0)
        dw_cols[k] = jnp.sum(d_msg * srcs[k], axis=1)
        d_src = d_msg * w[:, k][:, None]
        o = offsets[k]
        # src = roll(emb, -o): its VJP is the inverse roll
        d_emb += pltpu.roll(d_src, o % L, 0) if o != 0 else d_src
    demb_ref[:] = d_emb
    dw_ref[:] = jnp.stack(dw_cols, axis=1)


def _backward(emb, w, lens, g, ngram: int, interpret: bool = False):
    B, L, D = emb.shape
    W = 2 * ngram + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, L, D), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec((None, L, W), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec((None, L, D), lambda b, lens: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, L, D), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec((None, L, W), lambda b, lens: (b, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, ngram=ngram),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, L, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, W), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.int32), emb.astype(jnp.float32),
      w.astype(jnp.float32), g.astype(jnp.float32))


def _fwd(emb, w, lens, ngram, interpret):
    return _forward(emb, w, lens, ngram, interpret), (emb, w, lens)


def _bwd(ngram, interpret, res, g):
    import os

    emb, w, lens = res
    if os.environ.get("MGNNS_PALLAS_XLA_BWD") == "1":
        from mgnns_tpu.nn.text_gcn import window_max_aggregate

        _, vjp = jax.vjp(lambda e, ww: window_max_aggregate(e, ww, lens, ngram), emb, w)
        d_emb, d_w = vjp(g)
    else:
        d_emb, d_w = _backward(emb, w, lens, g, ngram, interpret)
        d_emb = d_emb.astype(emb.dtype)
        d_w = d_w.astype(w.dtype)
    zero_lens = np.zeros(lens.shape, jax_dtypes.float0)
    return d_emb, d_w, zero_lens


window_max_aggregate_pallas.defvjp(_fwd, _bwd)

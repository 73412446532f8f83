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

Gradients: the op is wrapped in ``jax.custom_vjp`` whose backward pass is the
VJP of the jnp reference implementation, so training with ``use_pallas=True``
produces gradients identical to the XLA path.
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


def _fwd(emb, w, lens, ngram, interpret):
    return _forward(emb, w, lens, ngram, interpret), (emb, w, lens)


def _bwd(ngram, interpret, res, g):
    from mgnns_tpu.nn.text_gcn import window_max_aggregate

    emb, w, lens = res
    _, vjp = jax.vjp(lambda e, ww: window_max_aggregate(e, ww, lens, ngram), emb, w)
    d_emb, d_w = vjp(g)
    zero_lens = np.zeros(lens.shape, jax_dtypes.float0)
    return d_emb, d_w, zero_lens


window_max_aggregate_pallas.defvjp(_fwd, _bwd)

"""Text-only classification model: the minimum end-to-end slice.

Text-level GCN -> linear head, i.e. the reference's ``Text_GCN.Model`` with
its (otherwise unused) classification Linear attached (reference
``models/Text_GCN.py:95,273``).  Used for the first end-to-end train/eval
loop on TumEmo text and as a lightweight engine-integration target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.nn import text_gcn
from mgnns_tpu.nn.core import RngStream, linear_apply, linear_init


def text_model_init(
    key: jax.Array,
    vocab_size: int,
    num_labels: int,
    num_edges: int,
    hidden_size: int = 300,
    node_embedding: np.ndarray | None = None,
    edge_weights: np.ndarray | None = None,
) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "text_gcn": text_gcn.text_gcn_init(
            k1, vocab_size, hidden_size, num_edges,
            node_weights=node_embedding, edge_weights=edge_weights,
        ),
        "head": linear_init(k2, hidden_size, num_labels),
    }


def text_model_apply(
    params: dict,
    batch: dict,
    *,
    ngram: int,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng: jax.Array | None = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """batch: ``ids`` [B, L], ``lens`` [B], ``eids`` [B, L, W].  Returns
    logits [B, num_labels]."""
    rngs = RngStream(rng)
    h = text_gcn.text_gcn_apply(
        params["text_gcn"], batch["ids"], batch["lens"], batch["eids"],
        ngram=ngram, dropout_rate=dropout_rate, train=train,
        rng=rngs.next("text_gcn"), use_pallas=use_pallas,
    )
    return linear_apply(params["head"], h)

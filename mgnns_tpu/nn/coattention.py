"""Additive co-attention over text/object/place features.

API-parity implementation of reference ``models/moudles.py:51-196``
(``CoAttention``) — constructed by the reference codebase but *unused* by the
final fusion model; provided so users of the reference find the same
building block here.  Also exposes the reference's ``masked_mean`` /
``masked_max`` / ``MaskedSoftmax`` helpers (``moudles.py:9-49``).

Math (forward, ``:141-196``):
  - text->image scores: ``v^T tanh(project(img_feats) + project(text_feat))``
    per image region; softmax over regions; context = weighted sum.
  - image->text scores: symmetric, with the text mask applied through the
    renormalized masked softmax (``:37-49``).
  - output = linear(concat(4 contexts)) -> dropout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mgnns_tpu.nn.core import dropout as _dropout
from mgnns_tpu.nn.core import linear_apply, linear_init


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None = None, axis: int = 1) -> jnp.ndarray:
    """Mean over ``axis`` counting only mask==1 rows (reference ``:9-20``)."""
    if mask is None:
        return x.mean(axis=axis)
    m = mask[..., None]
    return (x * m).sum(axis=axis) / jnp.maximum(m.sum(axis=axis), 1e-12)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray | None = None, axis: int = 1) -> jnp.ndarray:
    """Max over ``axis`` with masked entries at -inf (reference ``:23-34``)."""
    if mask is None:
        return x.max(axis=axis)
    m = mask[..., None]
    return jnp.where(m == 0.0, -jnp.inf, x).max(axis=axis)


def masked_softmax(logit: jnp.ndarray, mask: jnp.ndarray | None = None, axis: int = 1) -> jnp.ndarray:
    """Softmax then mask then renormalize (reference ``MaskedSoftmax``,
    ``:37-49``) — note this differs from masking the logits."""
    dist = jax.nn.softmax(logit - logit.max(axis=axis, keepdims=True), axis=axis)
    if mask is None:
        return dist
    dist = dist * mask
    return dist / jnp.maximum(dist.sum(axis=axis, keepdims=True), 1e-12)


def coattention_init(
    key: jax.Array,
    text_feat_size: int,
    img_object_feat_size: int,
    img_place_feat_size: int,
) -> dict:
    ks = jax.random.split(key, 13)
    T, O, P = text_feat_size, img_object_feat_size, img_place_feat_size
    return {
        "v_text_object": linear_init(ks[0], T, 1, bias=False),
        "v_text_place": linear_init(ks[1], T, 1, bias=False),
        "v_img_object": linear_init(ks[2], O, 1, bias=False),
        "v_img_place": linear_init(ks[3], P, 1, bias=False),
        "text2img_object_project": linear_init(ks[4], T, O, bias=False),
        "text2img_place_project": linear_init(ks[5], T, P, bias=False),
        "img_object2text_project": linear_init(ks[6], O, T, bias=False),
        "img_place2text_project": linear_init(ks[7], P, T, bias=False),
        "img_object_project": linear_init(ks[8], O, O),
        "img_place_project": linear_init(ks[9], P, P),
        "text_object_project": linear_init(ks[10], T, T),
        "text_place_project": linear_init(ks[11], T, T),
        "linear": linear_init(ks[12], 2 * T + O + P, T),
    }


def _text_att_scores(p, text_feat, img_feats, img_type):
    """[B, img_num] additive scores (reference ``:81-110``)."""
    img_proj = linear_apply(p[f"img_{img_type}2text_project"], img_feats)
    text_proj = linear_apply(p[f"text_{img_type}_project"], text_feat)[:, None, :]
    e = jnp.tanh(img_proj + text_proj)
    return linear_apply(p[f"v_text_{img_type}"], e)[..., 0]


def _img_att_scores(p, img_feat, text_feats, img_type):
    """[B, max_src_len] additive scores (reference ``:112-139``)."""
    text_proj = linear_apply(p[f"text2img_{img_type}_project"], text_feats)
    img_proj = linear_apply(p[f"img_{img_type}_project"], img_feat)[:, None, :]
    e = jnp.tanh(text_proj + img_proj)
    return linear_apply(p[f"v_img_{img_type}"], e)[..., 0]


def coattention_apply(
    p: dict,
    text_feat: jnp.ndarray,        # [B, T]
    text_feats: jnp.ndarray,       # [B, L, T]
    img_object_feat: jnp.ndarray,  # [B, O]
    img_object_feats: jnp.ndarray, # [B, N_o, O]
    img_place_feat: jnp.ndarray,   # [B, P]
    img_place_feats: jnp.ndarray,  # [B, N_p, P]
    src_mask: jnp.ndarray,         # [B, L] float
    *,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Returns the combined [B, T] representation (reference ``:141-196``)."""
    to_scores = _text_att_scores(p, text_feat, img_object_feats, "object")
    to_dist = masked_softmax(to_scores, axis=1)
    img_object_context = jnp.einsum("bn,bnd->bd", to_dist, img_object_feats)

    tp_scores = _text_att_scores(p, text_feat, img_place_feats, "place")
    tp_dist = masked_softmax(tp_scores, axis=1)
    img_place_context = jnp.einsum("bn,bnd->bd", tp_dist, img_place_feats)

    ot_scores = _img_att_scores(p, img_object_feat, text_feats, "object")
    ot_dist = masked_softmax(ot_scores, src_mask, axis=1)
    text_object_context = jnp.einsum("bl,bld->bd", ot_dist, text_feats)

    pt_scores = _img_att_scores(p, img_place_feat, text_feats, "place")
    pt_dist = masked_softmax(pt_scores, src_mask, axis=1)
    text_place_context = jnp.einsum("bl,bld->bd", pt_dist, text_feats)

    combined = jnp.concatenate(
        [img_object_context, img_place_context, text_object_context, text_place_context],
        axis=1,
    )
    combined = linear_apply(p["linear"], combined)
    return _dropout(combined, dropout_rate, rng, train)

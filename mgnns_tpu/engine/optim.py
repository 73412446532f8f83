"""Optimizer: Adam with per-group learning-rate multipliers and step decay.

Reproduces the reference's optimization setup
(``Tumblr_...py:164-168`` + ``models/Multi_GCN_Multihead_att.py:569-585``):
torch ``Adam(lr, weight_decay)`` over parameter groups

    text_features x10, lstm x10, trunks x lrp, gc1/gc2 x1,
    object/place label attention x1, the four MHA stacks x1,

global-norm gradient clipping at 10.0 (``engine/...:848``), and the engine's
step LR decay (``lr *= 0.2`` at the epochs in ``epoch_step``,
``engine/...:645-652``).

The reference's group list *omits* the sequence embedding, the image linear
maps, the label-attention output linears, the classifier head and the A
matrices — torch therefore never updates them.  ``faithful=True`` reproduces
that; ``faithful=False`` trains everything except the A matrices (whose
gradients are structurally zero anyway) at base lr.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax

# param-subtree -> group name, in reference get_config_optim order
_GROUPS_LISTED = {
    "text_gcn": "text",            # text_features, lr*10
    "object_trunk": "trunk",       # lr*lrp
    "place_trunk": "trunk",
    "gc1": "base",
    "gc2": "base",
    "object_attention": "base",
    "place_attention": "base",
    "lstm": "lstm",                # lr*10
    "img_object_text_mha": "base",
    "img_place_text_mha": "base",
    "text_img_object_mha": "base",
    "text_img_place_mha": "base",
}
_ALWAYS_FROZEN = {"object_A", "place_A"}
# dead reference modules (mgnns_init(include_dead_modules=True)): constructed
# but never run, absent from the reference's optimizer groups — must never be
# updated (weight decay alone would otherwise mutate them under
# faithful=False, breaking checkpoint equivalence with the reference)
_ALWAYS_FROZEN |= {
    "rnn", "object_gate", "place_gate", "text_head",
    "text_object_text_mha", "text_place_text_mha",
    *(f"{side}_linear_{i}" for side in ("object", "place") for i in (1, 2, 3)),
}


def label_params(params: dict, faithful: bool = False, freeze_trunks: bool = False) -> dict:
    """Pytree of group labels matching ``params``' structure."""

    def subtree_label(name):
        if name in _ALWAYS_FROZEN:
            return "frozen"
        if freeze_trunks and _GROUPS_LISTED.get(name) == "trunk":
            return "frozen"
        if name in _GROUPS_LISTED:
            return _GROUPS_LISTED[name]
        return "frozen" if faithful else "base"

    return {
        name: jax.tree_util.tree_map(lambda _: subtree_label(name), sub)
        for name, sub in params.items()
    }


def lr_schedule(base_lr: float, steps_per_epoch: int, epoch_step: Sequence[int], decay: float):
    """Step decay: multiply by ``decay`` once the epoch index reaches each
    entry of ``epoch_step`` (reference ``adjust_learning_rate``)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        lr = base_lr
        for e in epoch_step:
            lr = jax.numpy.where(epoch >= e, lr * decay, lr)
        return lr

    return schedule


def make_optimizer(
    params: dict,
    *,
    lr: float = 5e-5,
    lrp: float = 0.1,
    weight_decay: float = 1e-5,
    grad_clip: float = 10.0,
    steps_per_epoch: int = 1,
    epoch_step: Sequence[int] = (10,),
    lr_decay: float = 0.2,
    faithful: bool = False,
    accumulation_steps: int = 1,
    freeze_trunks: bool = False,
    algo: str = "adam",
) -> optax.GradientTransformation:
    """torch-Adam-equivalent chain: clip -> L2-to-grad -> Adam moments ->
    per-group multiplier -> -lr(step).

    ``accumulation_steps > 1`` wraps the chain in ``optax.MultiSteps`` —
    a *working* version of the reference's parsed-but-unused
    ``--accumulation_steps`` flag (``Tumblr_...py:76``); the effective batch
    is ``accumulation_steps * batch_size`` and ``steps_per_epoch`` should
    count applied (outer) steps.

    ``algo='sgd'`` drops the Adam moment estimator (plain SGD over the same
    clip/decay/group/schedule chain).  The reference trains Adam-only; SGD
    exists for numerics-parity harnesses — Adam's first-step update is
    ``sign(g)*lr`` per parameter, which chaotically amplifies float32
    reduction-order noise on near-zero gradients, while SGD perturbs
    parameters proportionally to the gradient error (bounded, comparable).
    """
    labels = label_params(params, faithful, freeze_trunks)
    multipliers = {
        "base": optax.scale(1.0),
        "text": optax.scale(10.0),
        "lstm": optax.scale(10.0),
        "trunk": optax.scale(lrp),
        "frozen": optax.set_to_zero(),
    }
    if algo not in ("adam", "sgd"):
        raise ValueError(f"unknown optimizer algo {algo!r}")
    sched = lr_schedule(lr, steps_per_epoch, epoch_step, lr_decay)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),
        (optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
         if algo == "adam" else optax.identity()),
        optax.multi_transform(multipliers, labels),
        optax.scale_by_schedule(lambda step: -sched(step)),
    )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx

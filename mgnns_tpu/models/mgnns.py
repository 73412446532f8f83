"""The MGNNS fusion model: three channels + cross-modal attention fusion.

Pure-function re-design of reference ``models/Multi_GCN_Multihead_att.py``
(class ``Multi_GCN_Multihead_Att``, init ``:135-351``, forward ``:431-567``):

text channel      — text-level GCN over the global PMI graph -> [B, 300]
                    (reference ``:444``; our statically-shaped formulation in
                    :mod:`mgnns_tpu.nn.text_gcn`), plus a 2-layer BiLSTM
                    memory bank [B, L, 300] (``:447``, ``:366-398``).
object channel    — ResNet-101 trunk -> [B, 14, 14, 2048]; 196-token memory
                    bank via 2048->300 linear (``:400-416``); global max-pool
                    [B, 2048]; 2-layer GCN over the 80-node object
                    co-occurrence graph fused by ``feature @ x^T`` -> [B, 80]
                    (``:450-474``); label-query attention -> 700 -> 300
                    (``:476-479``).
scene channel     — same with the Places365 ResNet-50 trunk and the 365-node
                    scene graph (``:482-506``).
fusion            — four stacked 1-query cross-attention directions
                    (obj->text, place->text, text->obj-img, text->place-img,
                    ``:508-546``), concat [B, 1200] -> 300 -> num_labels
                    (``:560-567``).

Deviations from the reference, by design:
- dead modules are not instantiated (GRU ``:172``, gates ``:186-187``,
  ``object/place_linear_1..3`` ``:316-326``, and the commented-out
  text_object_text/text_place_text attentions ``:516-532`` — available as
  ``another_mha`` in :mod:`mgnns_tpu.nn.attention` for API parity);
- both trunks consume the same image tensor explicitly (the reference engine
  feeds ``input[5]`` to both, ``engine/...:861-862``);
- constants (label GloVe query, object/place GloVe inputs) are device
  constants uploaded once, not re-shipped per batch (fixing
  ``engine/...:799-810``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs.cooccur import gen_adj
from mgnns_tpu.nn import attention, image_gcn, lstm, resnet, text_gcn
from mgnns_tpu.nn.core import (
    RngStream,
    dropout,
    embedding_init,
    leaky_relu,
    linear_apply,
    linear_init,
    take_rows,
)

# ImageNet statistics (reference Multi_GCN_Multihead_att.py:350-351)
_IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image_batch(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """On-device ImageNet normalization for raw uint8 pixels.

    The host pipeline ships uint8 (4x fewer H2D bytes); float inputs are
    assumed already normalized (test/compat path) and pass through.
    """
    if x.dtype == jnp.uint8:
        scale = (1.0 / (255.0 * _IMAGE_STD)).astype(np.float32)
        bias = (-_IMAGE_MEAN / _IMAGE_STD).astype(np.float32)
        return x.astype(dtype) * scale.astype(dtype) + bias.astype(dtype)
    return x


def mgnns_init(
    key: jax.Array,
    cfg: ModelConfig,
    *,
    num_edges: int,
    label_embedding: np.ndarray,
    object_A: np.ndarray,
    place_A: np.ndarray,
    vocab_embedding: np.ndarray | None = None,
    node_embedding: np.ndarray | None = None,
    edge_weights: np.ndarray | None = None,
    object_trunk: tuple[dict, dict] | None = None,
    place_trunk: tuple[dict, dict] | None = None,
    include_dead_modules: bool = False,
) -> tuple[dict, dict, dict]:
    """Build (params, batch_stats, consts).

    Args:
      num_edges: PMI edge-table size (``PmiGraph.num_edges``).
      label_embedding: [num_labels, 300] label GloVe (reference ``:20-27``).
      object_A / place_A: outputs of :func:`mgnns_tpu.graphs.cooccur.gen_A`.
      vocab_embedding: optional [V, 300] GloVe for the sequence embedding.
      node_embedding: optional [V, 300] GloVe for the text-GCN nodes.
      object_trunk / place_trunk: optional imported (params, stats) ResNet
        pytrees (:func:`mgnns_tpu.nn.resnet.import_torch_state_dict`).
      include_dead_modules: also initialize the reference modules that are
        constructed but never used in its forward (GRU ``rnn`` ``:172-177``,
        ``object/place_gate`` ``:186-187``, ``object/place_linear_1..3``
        ``:316-326``, the ``text_object_text``/``text_place_text`` attention
        blocks ``:214-245`` whose calls are commented out ``:516-532``, and
        Text_GCN's unused ``Linear`` head ``Text_GCN.py:95``).  They receive
        no gradient and do not run in :func:`mgnns_apply`; turning them on
        makes exported checkpoints satisfy a reference-side
        ``load_state_dict(strict=True)``.
    """
    ks = jax.random.split(key, 24)
    d = cfg.bi_hidden_size
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}

    p["text_gcn"] = text_gcn.text_gcn_init(
        ks[0], cfg.vocab_size, cfg.emb_size, num_edges,
        node_weights=node_embedding, edge_weights=edge_weights,
    )
    p["embedding"] = embedding_init(
        ks[1], cfg.vocab_size, cfg.emb_size, padding_idx=0, weights=vocab_embedding
    )
    p["lstm"] = lstm.lstm_init(ks[2], cfg.emb_size, cfg.hidden_size, cfg.num_layers, cfg.bidirectional)

    if object_trunk is None:
        object_trunk = resnet.resnet_init(ks[3], depth=101)
    if place_trunk is None:
        place_trunk = resnet.resnet_init(ks[4], depth=50)
    p["object_trunk"], s["object_trunk"] = object_trunk
    p["place_trunk"], s["place_trunk"] = place_trunk

    p["liner_img_object"] = linear_init(ks[5], 2048, d)
    p["liner_img_place"] = linear_init(ks[6], 2048, d)

    # gc1/gc2 shared by both image channels (reference :304-305,470-472,496-498)
    p["gc1"] = image_gcn.graph_conv_init(ks[7], cfg.in_channel, cfg.gcn_hidden)
    p["gc2"] = image_gcn.graph_conv_init(ks[8], cfg.gcn_hidden, cfg.gcn_out)

    p["object_attention"] = attention.label_attention_init(ks[9], 300, cfg.object_num_classes)
    p["place_attention"] = attention.label_attention_init(ks[10], 300, cfg.place_num_classes)
    p["object_linear_5"] = linear_init(ks[11], 300, 100)
    p["object_x_linear"] = linear_init(ks[12], cfg.num_labels * 100, 300)
    p["place_linear_5"] = linear_init(ks[13], 300, 100)
    p["place_x_linear"] = linear_init(ks[14], cfg.num_labels * 100, 300)

    def mha_stack(k):
        return [attention.my_mha_init(kk, cfg.n_head, d, cfg.d_kv) for kk in jax.random.split(k, cfg.stack_num)]

    p["img_object_text_mha"] = mha_stack(ks[15])
    p["img_place_text_mha"] = mha_stack(ks[16])
    p["text_img_object_mha"] = mha_stack(ks[17])
    p["text_img_place_mha"] = mha_stack(ks[18])

    p["multi_linear_1"] = linear_init(ks[19], 4 * d, d)
    p["multi_linear_2"] = linear_init(ks[20], d, cfg.num_labels)

    if include_dead_modules:
        kd = jax.random.split(ks[23], 12)
        # GRU text encoder the reference builds but never calls (:172-177)
        p["rnn"] = lstm.gru_init(kd[0], cfg.emb_size, cfg.hidden_size,
                                 cfg.num_layers, cfg.bidirectional)
        # gates (:186-187): Linear(600 -> 300), never applied
        p["object_gate"] = linear_init(kd[1], 2 * d, d)
        p["place_gate"] = linear_init(kd[2], 2 * d, d)
        # per-channel linear pyramids (:316-326), never applied
        for side, kk in (("object", kd[3]), ("place", kd[4])):
            k1, k2, k3 = jax.random.split(kk, 3)
            p[f"{side}_linear_1"] = linear_init(k1, 2048, 1024)
            p[f"{side}_linear_2"] = linear_init(k2, 1024, 512)
            p[f"{side}_linear_3"] = linear_init(k3, 512, 256)
        # text_object_text / text_place_text MyAnotherMultiHeadAttention
        # blocks (:214-245); their forward uses are commented out (:516-532)
        p["text_object_text_mha"] = attention.my_another_mha_init(
            kd[5], cfg.n_head, d, cfg.d_kv)
        p["text_place_text_mha"] = attention.my_another_mha_init(
            kd[6], cfg.n_head, d, cfg.d_kv)
        # Text_GCN's unused classification head (Text_GCN.py:95,273)
        p["text_head"] = linear_init(kd[7], cfg.emb_size, cfg.num_labels)

    # A matrices are nn.Parameters in the reference but receive no gradient
    # (gen_adj output is detached, :461,:490) and are absent from the
    # optimizer groups — kept in params for checkpoint parity, frozen by the
    # optimizer label map.
    p["object_A"] = jnp.asarray(object_A, jnp.float32)
    p["place_A"] = jnp.asarray(place_A, jnp.float32)

    consts = {"label_query": jnp.asarray(label_embedding, jnp.float32)}
    return p, s, consts


def mgnns_init_jitted(key: jax.Array, cfg: ModelConfig, **kw) -> tuple[dict, dict, dict]:
    """:func:`mgnns_init` compiled as ONE program.

    Eager init dispatches thousands of small device ops; on a remote/tunneled
    device each costs a round trip (~80 ms observed), turning init into
    minutes.  Tracing the whole init into a single jitted executable makes it
    one compile + one dispatch.
    """
    return jax.jit(lambda k: mgnns_init(k, cfg, **kw))(key)


def _image_channel(
    trunk_params,
    trunk_state,
    liner_img,
    gc1,
    gc2,
    A,
    inp,
    label_query,
    label_attn_params,
    linear_5,
    x_linear,
    image,
    *,
    cfg: ModelConfig,
    depth: int,
    train: bool,
    rngs: RngStream,
    name: str,
):
    """One image channel (reference ``:450-479`` object / ``:482-506`` place).

    Returns (memory_bank [B, 196, d], channel_vec [B, 300], new_trunk_state).
    """
    dtype = cfg.cdtype
    # bn_mode='batch' is the torch-faithful behavior (train-mode batch stats,
    # running-stat updates); 'frozen' always normalizes with running stats —
    # the standard choice when fine-tuning imported trunks.  Frozen trunks
    # always use running stats.
    bn_train = train and cfg.bn_mode == "batch" and not cfg.freeze_trunks

    def trunk_fn(tp, ts, img):
        return resnet.resnet_apply(
            tp, ts, img, depth=depth, train=bn_train, dtype=dtype,
            unroll=cfg.unroll_trunks,
            block_remat=cfg.remat_policy == "block",
            stem_s2d=cfg.stem_s2d)

    if ((cfg.remat_trunks or cfg.remat_policy == "trunk")
            and cfg.remat_policy != "block"):
        # rematerialize trunk activations in the backward pass (HBM for
        # FLOPs).  Skipped under the per-block policy: wrapping the
        # already-block-remat'd trunk in a second whole-trunk checkpoint
        # would recompute each block inside a full-trunk recompute —
        # strictly slower than either policy alone ('block' wins when both
        # are requested, e.g. --remat_trunks --remat_policy block).
        trunk_fn = jax.checkpoint(trunk_fn)
    feats, new_state = trunk_fn(trunk_params, trunk_state, image)
    if cfg.freeze_trunks:
        # feature extraction: the whole conv backward disappears from the
        # train step (trunk params are additionally frozen in the optimizer)
        feats = jax.lax.stop_gradient(feats)
        new_state = trunk_state
    B, H, W, C = feats.shape
    feats32 = feats.astype(jnp.float32)
    # memory bank: [B, H*W, 2048] -> linear -> [B, 196, d]
    memory_bank = linear_apply(liner_img, feats32.reshape(B, H * W, C))
    # global max pool over the spatial grid (reference nn.MaxPool2d(14,14))
    pooled = feats32.max(axis=(1, 2))  # [B, 2048]

    adj = jax.lax.stop_gradient(gen_adj(A))  # reference detaches (:461)
    x = image_gcn.graph_conv_apply(gc1, inp, adj)
    x = leaky_relu(x)  # reference nn.LeakyReLU(0.2)
    x = image_gcn.graph_conv_apply(gc2, x, adj)          # [C_cls, 2048]
    x = pooled @ x.T                                      # [B, C_cls]

    att = attention.label_attention_apply(
        label_attn_params, label_query, x, x,
        n_heads=cfg.n_label_heads, dropout_rate=cfg.dropout,
        train=train, rng=rngs.next(f"{name}_label_attn"),
    )                                                     # [B, num_labels, 300]
    att = linear_apply(linear_5, att)                     # [B, num_labels, 100]
    att = att.reshape(B, -1)                              # [B, num_labels*100]
    channel_vec = linear_apply(x_linear, att)             # [B, 300]
    return memory_bank, channel_vec, new_state


def mgnns_apply(
    params: dict,
    state: dict,
    consts: dict,
    batch: dict,
    *,
    cfg: ModelConfig,
    train: bool = False,
    rng: jax.Array | None = None,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, dict, dict]:
    """Full forward pass.

    Args:
      batch: dict with
        ``ids`` [B, L] int32 token ids (PAD=0, suffix padding),
        ``lens`` [B] int32,
        ``mask`` [B, L] float32 (1 = real token),
        ``eids`` [B, L, 2*ngram+1] int32 window edge ids,
        ``image`` [B, H, W, 3] float32 normalized pixels (fed to both trunks,
        matching the reference engine ``:861-862``),
        ``object_inp`` [80, 300] / ``place_inp`` [365, 300] GloVe constants.
    Returns:
      (logits [B, num_labels], new_batch_stats, aux dict).
    """
    rngs = RngStream(rng)
    new_state = {}
    aux: dict[str, Any] = {}

    # ---- text channel -----------------------------------------------------
    text_feature = text_gcn.text_gcn_apply(
        params["text_gcn"], batch["ids"], batch["lens"], batch["eids"],
        ngram=(batch["eids"].shape[-1] - 1) // 2,
        dropout_rate=cfg.text_dropout, train=train,
        rng=rngs.next("text_gcn"), use_pallas=use_pallas,
    )  # [B, 300]

    emb = take_rows(params["embedding"]["table"], batch["ids"])
    text_memory_bank, (h_final, _) = lstm.lstm_apply(
        params["lstm"], emb, batch["lens"],
        dropout_rate=cfg.dropout, train=train, rng=rngs.next("lstm"),
    )  # [B, L, 300]
    # (backward, forward) concat of the last layer, reference :392
    aux["text_final_state"] = jnp.concatenate([h_final[-1], h_final[-2]], axis=-1)

    # ---- image channels ---------------------------------------------------
    batch = dict(batch)
    batch["image"] = normalize_image_batch(batch["image"], cfg.cdtype)
    img_object_memory_bank, object_x_attention, new_state["object_trunk"] = _image_channel(
        params["object_trunk"], state["object_trunk"], params["liner_img_object"],
        params["gc1"], params["gc2"], params["object_A"], batch["object_inp"],
        consts["label_query"], params["object_attention"],
        params["object_linear_5"], params["object_x_linear"], batch["image"],
        cfg=cfg, depth=101, train=train, rngs=rngs, name="object",
    )
    img_place_memory_bank, place_x_attention, new_state["place_trunk"] = _image_channel(
        params["place_trunk"], state["place_trunk"], params["liner_img_place"],
        params["gc1"], params["gc2"], params["place_A"], batch["place_inp"],
        consts["label_query"], params["place_attention"],
        params["place_linear_5"], params["place_x_linear"], batch["image"],
        cfg=cfg, depth=50, train=train, rngs=rngs, name="place",
    )

    # ---- cross-modal fusion ----------------------------------------------
    head_diffs: list[jnp.ndarray] = []

    def run_stack(stack, q, k, v, mask, name, is_regu=False):
        out = q
        for i, blk in enumerate(stack):
            res = attention.my_mha_apply(
                blk, out, k, v, mask,
                n_head=cfg.n_head, d_kv=cfg.d_kv,
                dropout_rate=cfg.dropout, train=train,
                rng=rngs.next(f"{name}{i}"), is_regu=is_regu,
            )
            out = res[0]
            if is_regu:
                head_diffs.append(res[2])
        return out

    # the image->text stacks carry the head-diversity regularizer when
    # cfg.is_regu (reference constructs them with is_regu, :198-199,:225-226;
    # the text->image stacks never do, :250-252,:262-264)
    mask = batch["mask"]
    img_object_text = run_stack(params["img_object_text_mha"], object_x_attention,
                                text_memory_bank, text_memory_bank, mask, "iot",
                                is_regu=cfg.is_regu)
    img_place_text = run_stack(params["img_place_text_mha"], place_x_attention,
                               text_memory_bank, text_memory_bank, mask, "ipt",
                               is_regu=cfg.is_regu)
    text_img_object = run_stack(params["text_img_object_mha"], text_feature,
                                img_object_memory_bank, img_object_memory_bank, None, "tio")
    text_img_place = run_stack(params["text_img_place_mha"], text_feature,
                               img_place_memory_bank, img_place_memory_bank, None, "tip")
    if head_diffs:
        aux["head_diversity"] = jnp.stack(head_diffs).mean()

    multi = jnp.concatenate(
        [text_img_object, text_img_place, img_object_text, img_place_text], axis=1
    )  # [B, 1200]
    multi = linear_apply(params["multi_linear_1"], multi)
    multi = dropout(multi, cfg.dropout, rngs.next("classifier"), train)
    logits = linear_apply(params["multi_linear_2"], multi)
    return logits, new_state, aux

"""FULL-MODEL numerical parity: our fusion forward vs an independent torch
implementation of the reference's forward math (reference
``models/Multi_GCN_Multihead_att.py:431-567``), sharing weights through the
reference-format state dict.

The torch side is written from the reference's equations (not from our JAX
code): packed-LSTM memory bank, trunk->memory-bank/maxpool, gen_adj + 2-layer
GCN + feature@x^T, element-wise label attention, 4 stacked 1-query MHA
directions with FFN + torch-std LayerNorm, concat->classifier.  The text-GCN
channel comes from the loop-level DGL-semantics oracle in
``naive_reference``.  Eval mode: dropout off, BN running stats.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs import build_vocab, cal_pmi, gen_A
from mgnns_tpu.graphs.pmi import doc_window_edge_ids
from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
from mgnns_tpu.models import mgnns_init, mgnns_apply
from mgnns_tpu.models.import_reference import export_reference_state_dict

from tests.naive_reference import naive_doc_graph_forward
from tests.test_resnet import TorchTrunk
from mgnns_tpu.nn.resnet import RESNET_LAYERS


def t(sd, name):
    return torch.from_numpy(np.ascontiguousarray(sd[name]))


def torch_linear(sd, name, x):
    return x @ t(sd, f"{name}.weight").T + t(sd, f"{name}.bias")


def torch_layer_norm(sd, name, x):
    mean = x.mean(-1, keepdim=True)
    std = x.std(-1, keepdim=True)
    return t(sd, f"{name}.gamma") * (x - mean) / (std + 1e-6) + t(sd, f"{name}.beta")


def torch_mha_block(sd, prefix, q, k, v, mask, n_head, d_kv):
    """MyMultiHeadAttention + pos_ffn (reference submodules.py:55-94,122-139;
    moudles.py:207-230), eval mode."""
    B, Lq, dm = q.shape
    Lk = k.shape[1]
    residual = q
    qh = torch_linear(sd, f"{prefix}.slf_attn.w_qs", q).view(B, Lq, n_head, d_kv)
    kh = torch_linear(sd, f"{prefix}.slf_attn.w_ks", k).view(B, Lk, n_head, d_kv)
    vh = torch_linear(sd, f"{prefix}.slf_attn.w_vs", v).view(B, Lk, n_head, d_kv)
    qh = qh.permute(2, 0, 1, 3).reshape(-1, Lq, d_kv)
    kh = kh.permute(2, 0, 1, 3).reshape(-1, Lk, d_kv)
    vh = vh.permute(2, 0, 1, 3).reshape(-1, Lk, d_kv)
    attn = qh @ kh.transpose(1, 2) / np.power(d_kv, 0.5)
    if mask is not None:
        m = mask.unsqueeze(1).repeat(n_head, 1, 1)
        attn = attn.masked_fill(m == 0.0, float("-inf"))
    attn = torch.softmax(attn, dim=2)
    out = attn @ vh
    out = out.view(n_head, B, Lq, d_kv).permute(1, 2, 0, 3).reshape(B, Lq, -1)
    out = torch_linear(sd, f"{prefix}.slf_attn.fc", out)
    out = torch_layer_norm(sd, f"{prefix}.slf_attn.layer_norm", out + residual)
    # position-wise FFN: two 1x1 convs == two linears
    res2 = out
    h = torch.relu(out @ t(sd, f"{prefix}.pos_ffn.w_1.weight")[:, :, 0].T
                   + t(sd, f"{prefix}.pos_ffn.w_1.bias"))
    h = h @ t(sd, f"{prefix}.pos_ffn.w_2.weight")[:, :, 0].T + t(sd, f"{prefix}.pos_ffn.w_2.bias")
    return torch_layer_norm(sd, f"{prefix}.pos_ffn.layer_norm", h + res2)


def torch_label_attention(sd, prefix, query, kv, n_heads=5):
    """Reference Attention (:88-133), element-wise energies, eval mode."""
    C, hid = query.shape
    B = kv.shape[0]
    dh = hid // n_heads
    Q = torch_linear(sd, f"{prefix}.w_q", query).view(C, n_heads, dh)
    K = torch_linear(sd, f"{prefix}.w_k", kv).view(B, n_heads, dh)
    V = torch_linear(sd, f"{prefix}.w_v", kv).view(B, n_heads, dh)
    scale = np.sqrt(hid // n_heads)
    energy = Q.unsqueeze(0) * K.unsqueeze(1) / scale       # [B, C, H, dh]
    a = torch.softmax(energy, dim=-1)
    x = (a * V.unsqueeze(1)).reshape(B, C, hid)
    return torch_linear(sd, f"{prefix}.fc", x)


def torch_gen_adj(A):
    D = torch.pow(A.sum(1).float(), -0.5)
    D = torch.diag(D)
    return (A @ D).T @ D


def torch_trunk_from_sd(sd, prefix, depth):
    seq = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
           "6": "layer3", "7": "layer4"}
    trunk = TorchTrunk(RESNET_LAYERS[depth])
    remap = {}
    for k, v in sd.items():
        if not k.startswith(prefix + "."):
            continue
        rest = k[len(prefix) + 1:]
        idx, _, tail = rest.partition(".")
        name = seq[idx] + ("." + tail if tail else "")
        name = name.replace(".downsample.", ".down.")
        remap[name] = torch.from_numpy(np.ascontiguousarray(v))
    missing, unexpected = trunk.load_state_dict(remap, strict=False)
    assert not [m for m in missing if "num_batches" not in m], missing
    return trunk.eval()


def torch_image_channel(sd, side, depth, image_nchw, inp, label_query, num_labels):
    trunk = torch_trunk_from_sd(sd, f"{side}_features", depth)
    with torch.no_grad():
        feats = trunk(image_nchw)                              # [B, 2048, h, w]
    B, C, H, W = feats.shape
    bank = feats.view(B, C, -1).permute(0, 2, 1)               # [B, hw, 2048]
    bank = torch_linear(sd, f"liner_img_{side}", bank)         # [B, hw, 300]
    pooled = F.max_pool2d(feats, (H, W)).view(B, C)            # [B, 2048]
    A = t(sd, f"{side}_A")
    adj = torch_gen_adj(A)
    x = inp @ t(sd, "gc1.weight")
    x = adj @ x
    x = F.leaky_relu(x, 0.2)
    x = adj @ (x @ t(sd, "gc2.weight"))                        # [C_cls, 2048]
    x = pooled @ x.T                                           # [B, C_cls]
    att = torch_label_attention(sd, f"{side}_attention", label_query, x)
    att = torch_linear(sd, f"{side}_linear_5", att)
    att = att.reshape(B, -1)
    return bank, torch_linear(sd, f"{side}_x_linear", att)


def torch_reference_forward(sd, batch, label_query, mapping, node_emb, edge_w,
                            ngram, n_head, d_kv, stack_num, num_labels):
    ids = torch.from_numpy(batch["ids"].astype(np.int64))
    lens = torch.from_numpy(batch["lens"].astype(np.int64))
    mask = torch.from_numpy(batch["mask"])
    B, L = ids.shape

    # text channel via the loop-level DGL-semantics oracle + ReLU (eval: no dropout)
    text_feature = torch.stack([
        torch.from_numpy(
            naive_doc_graph_forward(batch["ids"][b], int(lens[b]), ngram,
                                    node_emb, edge_w, mapping).astype(np.float32))
        for b in range(B)
    ])
    text_feature = torch.relu(text_feature)

    # BiLSTM memory bank with packed semantics
    lstm = torch.nn.LSTM(300, 150, 2, bidirectional=True, batch_first=True)
    lstm_sd = {k[len("lstm."):]: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items() if k.startswith("lstm.")}
    lstm.load_state_dict(lstm_sd)
    emb_tab = t(sd, "embedding.weight")
    text_embed = emb_tab[ids]
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        text_embed, lens, batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        bank, _ = lstm(packed)
    bank, _ = torch.nn.utils.rnn.pad_packed_sequence(bank, batch_first=True,
                                                     total_length=L)

    image = torch.from_numpy(batch["image"].transpose(0, 3, 1, 2))
    obj_bank, obj_vec = torch_image_channel(
        sd, "object", 101, image, torch.from_numpy(batch["object_inp"]),
        label_query, num_labels)
    plc_bank, plc_vec = torch_image_channel(
        sd, "place", 50, image, torch.from_numpy(batch["place_inp"]),
        label_query, num_labels)

    def run_stack(prefix, q, k, v, m):
        out = q
        for i in range(stack_num):
            out = torch_mha_block(sd, f"{prefix}.{i}", out.unsqueeze(1), k, v,
                                  m, n_head, d_kv).squeeze(1)
        return out

    iot = run_stack("img_object_text_multi_head_att", obj_vec, bank, bank, mask)
    ipt = run_stack("img_place_text_multi_head_att", plc_vec, bank, bank, mask)
    tio = run_stack("text_img_object_multi_head_att", text_feature, obj_bank, obj_bank, None)
    tip = run_stack("text_img_place_multi_head_att", text_feature, plc_bank, plc_bank, None)

    multi = torch.cat([tio, tip, iot, ipt], dim=1)
    multi = torch_linear(sd, "multi_linear_1", multi)
    return torch_linear(sd, "multi_linear_2", multi)


CORPUS = ["the cat sat on the mat", "a dog met a cat", "the mat sat still",
          "dogs and cats and logs"]


def test_full_model_logit_parity():
    vocab = build_vocab(CORPUS, 1)
    graph = cal_pmi(CORPUS, vocab, 3, 1, max_len=10)
    r = np.random.default_rng(0)
    cfg = ModelConfig(vocab_size=len(vocab), edges_num=graph.num_edges,
                      image_size=64, object_num_classes=5, place_num_classes=6)
    oA, _ = gen_A(5, 0.4, {"nums": r.integers(1, 5, 5).astype(float),
                           "adj": r.integers(0, 4, (5, 5)).astype(float)})
    pA, _ = gen_A(6, 0.3, {"nums": r.integers(1, 5, 6).astype(float),
                           "adj": r.integers(0, 4, (6, 6)).astype(float)})
    label_emb = r.standard_normal((7, 300)).astype(np.float32)
    params, state, consts = mgnns_init(
        jax.random.key(0), cfg, num_edges=graph.num_edges,
        label_embedding=label_emb, object_A=oA, place_A=pA)

    w2i = make_word_to_id(vocab)
    B, L = len(CORPUS), 10
    ids = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int32)
    for n, txt in enumerate(CORPUS):
        toks = words_to_ids(txt.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    batch_np = {
        "ids": ids, "lens": lens,
        "mask": (np.arange(L)[None] < lens[:, None]).astype(np.float32),
        "eids": doc_window_edge_ids(ids, lens, 2, graph),
        "image": r.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "object_inp": r.standard_normal((5, 300)).astype(np.float32),
        "place_inp": r.standard_normal((6, 300)).astype(np.float32),
    }

    ours, _, _ = mgnns_apply(
        params, state, consts,
        {k: jnp.asarray(v) for k, v in batch_np.items()},
        cfg=cfg, train=False)

    sd = export_reference_state_dict(params, state)
    theirs = torch_reference_forward(
        sd, batch_np, torch.from_numpy(label_emb),
        graph.dense_edges_mapping(),
        np.asarray(params["text_gcn"]["node_embedding"]),
        np.asarray(params["text_gcn"]["edge_weight"]),
        ngram=2, n_head=cfg.n_head, d_kv=cfg.d_kv,
        stack_num=cfg.stack_num, num_labels=7,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               atol=5e-3, rtol=1e-3)

"""Tests for API-parity extras: CoAttention, masked helpers, another-MHA,
head-diversity regularizer wiring, gradient accumulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.nn import coattention as co
from mgnns_tpu.nn import attention as attn


def test_masked_softmax_renormalizes(rng):
    logit = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    d = co.masked_softmax(logit, mask, axis=1)
    np.testing.assert_allclose(np.asarray(d.sum(1)), 1.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d)[0, 2:], 0.0)
    # unmasked row equals plain softmax
    np.testing.assert_allclose(
        np.asarray(d)[1], np.asarray(jax.nn.softmax(logit[1])), atol=1e-6
    )


def test_masked_mean_max(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    mm = co.masked_mean(x, mask)
    np.testing.assert_allclose(np.asarray(mm)[0], np.asarray(x)[0, :2].mean(0), atol=1e-6)
    mx = co.masked_max(x, mask)
    np.testing.assert_allclose(np.asarray(mx)[0], np.asarray(x)[0, :2].max(0), atol=1e-6)


def _np_linear(p, x):
    out = x @ np.asarray(p["w"])
    if "b" in p:
        out = out + np.asarray(p["b"])
    return out


def test_coattention_matches_numpy_oracle(rng):
    T, O, P, B, L, No, Np_ = 6, 5, 4, 3, 7, 9, 8
    p = co.coattention_init(jax.random.key(0), T, O, P)
    text_feat = rng.standard_normal((B, T)).astype(np.float32)
    text_feats = rng.standard_normal((B, L, T)).astype(np.float32)
    io_feat = rng.standard_normal((B, O)).astype(np.float32)
    io_feats = rng.standard_normal((B, No, O)).astype(np.float32)
    ip_feat = rng.standard_normal((B, P)).astype(np.float32)
    ip_feats = rng.standard_normal((B, Np_, P)).astype(np.float32)
    mask = (rng.uniform(size=(B, L)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    out = co.coattention_apply(
        p, *map(jnp.asarray, (text_feat, text_feats, io_feat, io_feats, ip_feat, ip_feats, mask)),
        train=False,
    )

    def np_softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    # oracle for one branch: text -> object
    img_proj = _np_linear(p["img_object2text_project"], io_feats)
    txt_proj = _np_linear(p["text_object_project"], text_feat)[:, None, :]
    scores = _np_linear(p["v_text_object"], np.tanh(img_proj + txt_proj))[..., 0]
    dist = np_softmax(scores, 1)
    ctx = np.einsum("bn,bnd->bd", dist, io_feats)
    # oracle for the masked branch: object -> text
    tproj = _np_linear(p["text2img_object_project"], text_feats)
    iproj = _np_linear(p["img_object_project"], io_feat)[:, None, :]
    s2 = _np_linear(p["v_img_object"], np.tanh(tproj + iproj))[..., 0]
    d2 = np_softmax(s2, 1) * mask
    d2 = d2 / d2.sum(1, keepdims=True)
    ctx2 = np.einsum("bl,bld->bd", d2, text_feats)

    # reconstruct combined output with the other two branches from the impl
    assert out.shape == (B, T)
    # verify the two oracle branches appear in the concat (recompute full)
    tp_scores = _np_linear(p["v_text_place"], np.tanh(
        _np_linear(p["img_place2text_project"], ip_feats)
        + _np_linear(p["text_place_project"], text_feat)[:, None, :]))[..., 0]
    tp_ctx = np.einsum("bn,bnd->bd", np_softmax(tp_scores, 1), ip_feats)
    pt_s = _np_linear(p["v_img_place"], np.tanh(
        _np_linear(p["text2img_place_project"], text_feats)
        + _np_linear(p["img_place_project"], ip_feat)[:, None, :]))[..., 0]
    pt_d = np_softmax(pt_s, 1) * mask
    pt_d = pt_d / pt_d.sum(1, keepdims=True)
    pt_ctx = np.einsum("bl,bld->bd", pt_d, text_feats)
    combined = np.concatenate([ctx, tp_ctx, ctx2, pt_ctx], axis=1)
    expected = _np_linear(p["linear"], combined)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


def test_another_mha_alias(rng):
    assert attn.my_another_mha_init is attn.my_mha_init
    assert attn.my_another_mha_apply is attn.my_mha_apply


def test_is_regu_head_diversity_in_aux(rng):
    """cfg.is_regu=True must produce a finite head-diversity penalty in aux."""
    from tests.test_model import tiny_setup  # fixture function, reuse builder

    # build manually (fixtures can't be called): small config
    from mgnns_tpu.config import ModelConfig
    from mgnns_tpu.graphs import build_vocab, cal_pmi, gen_A
    from mgnns_tpu.models import mgnns_init, mgnns_apply
    import dataclasses

    vocab = build_vocab(["a b c d", "b c d e"], 1)
    graph = cal_pmi(["a b c d", "b c d e"], vocab, 2, 1, max_len=6)
    cfg = ModelConfig(vocab_size=len(vocab), object_num_classes=4,
                      place_num_classes=5, image_size=64,
                      edges_num=graph.num_edges, is_regu=True)
    r = np.random.default_rng(0)
    oA, _ = gen_A(4, 0.4, {"nums": np.ones(4), "adj": np.ones((4, 4))})
    pA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    params, state, consts = mgnns_init(
        jax.random.key(0), cfg, num_edges=graph.num_edges,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA)
    B, L = 2, 6
    batch = {
        "ids": jnp.asarray([[2, 3, 4, 0, 0, 0], [3, 4, 5, 6, 0, 0]]),
        "lens": jnp.asarray([3, 4]),
        "mask": jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]], jnp.float32),
        "eids": jnp.zeros((B, L, 5), jnp.int32),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((4, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
    }
    logits, _, aux = mgnns_apply(params, state, consts, batch, cfg=cfg, train=False)
    assert "head_diversity" in aux
    hd = float(aux["head_diversity"])
    assert np.isfinite(hd) and 0.0 <= hd <= 1.0


def test_gradient_accumulation_matches_large_batch():
    """k micro-steps with MultiSteps == one step on the averaged gradient."""
    from mgnns_tpu.engine.optim import make_optimizer
    import optax

    params = {"gc1": {"w": jnp.ones((4,))}}
    kw = dict(lr=1e-2, weight_decay=0.0, grad_clip=1e9, steps_per_epoch=100,
              epoch_step=(1000,))
    tx_acc = make_optimizer(params, accumulation_steps=2, **kw)
    tx_ref = make_optimizer(params, **kw)

    g1 = {"gc1": {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}}
    g2 = {"gc1": {"w": jnp.asarray([3.0, 2.0, 1.0, 0.0])}}
    g_avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    s = tx_acc.init(params)
    u1, s = tx_acc.update(g1, s, params)
    assert float(jnp.abs(u1["gc1"]["w"]).sum()) == 0.0  # no update yet
    u2, s = tx_acc.update(g2, s, params)
    sr = tx_ref.init(params)
    ur, _ = tx_ref.update(g_avg, sr, params)
    np.testing.assert_allclose(np.asarray(u2["gc1"]["w"]), np.asarray(ur["gc1"]["w"]), rtol=1e-5)

"""Full-model forward tests on a tiny configuration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs import build_vocab, cal_pmi, gen_A
from mgnns_tpu.graphs.pmi import doc_window_edge_ids
from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
from mgnns_tpu.models import mgnns_init, mgnns_apply, text_model_init, text_model_apply

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog met",
    "the mat sat still",
]


@pytest.fixture(scope="module")
def tiny_setup():
    vocab = build_vocab(CORPUS, min_count=1)
    graph = cal_pmi(CORPUS, vocab, window_size=3, min_cooccurrence=1, max_len=12)
    cfg = ModelConfig(
        num_labels=7, vocab_size=len(vocab), object_num_classes=5,
        place_num_classes=9, image_size=64, edges_num=graph.num_edges,
    )
    rng = np.random.default_rng(0)
    adj_o = {"nums": rng.integers(1, 9, 5).astype(float),
             "adj": rng.integers(0, 5, (5, 5)).astype(float)}
    adj_p = {"nums": rng.integers(1, 9, 9).astype(float),
             "adj": rng.integers(0, 5, (9, 9)).astype(float)}
    object_A, _ = gen_A(5, 0.4, adj_o)
    place_A, _ = gen_A(9, 0.3, adj_p)
    label_emb = rng.standard_normal((7, 300)).astype(np.float32)

    params, state, consts = mgnns_init(
        jax.random.key(0), cfg,
        num_edges=graph.num_edges, label_embedding=label_emb,
        object_A=object_A, place_A=place_A,
    )

    w2i = make_word_to_id(vocab)
    B, L, ngram = len(CORPUS), 12, 2
    ids = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int32)
    for n, t in enumerate(CORPUS):
        toks = words_to_ids(t.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    eids = doc_window_edge_ids(ids, lens, ngram, graph)
    batch = {
        "ids": jnp.asarray(ids),
        "lens": jnp.asarray(lens),
        "mask": jnp.asarray((np.arange(L)[None] < lens[:, None]).astype(np.float32)),
        "eids": jnp.asarray(eids),
        "image": jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(rng.standard_normal((5, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(rng.standard_normal((9, 300)).astype(np.float32)),
    }
    return cfg, graph, params, state, consts, batch


def test_forward_shapes_and_determinism(tiny_setup):
    cfg, graph, params, state, consts, batch = tiny_setup
    logits, ns, aux = mgnns_apply(params, state, consts, batch, cfg=cfg, train=False)
    assert logits.shape == (4, 7)
    assert np.isfinite(np.asarray(logits)).all()
    assert aux["text_final_state"].shape == (4, 300)
    logits2, _, _ = mgnns_apply(params, state, consts, batch, cfg=cfg, train=False)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    # eval mode must not change batch stats
    flat1 = jax.tree_util.tree_leaves(state)
    flat2 = jax.tree_util.tree_leaves(ns)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_train_mode_updates_stats_and_dropout(tiny_setup):
    cfg, graph, params, state, consts, batch = tiny_setup
    logits_a, ns, _ = mgnns_apply(params, state, consts, batch, cfg=cfg, train=True,
                                  rng=jax.random.key(1))
    logits_b, _, _ = mgnns_apply(params, state, consts, batch, cfg=cfg, train=True,
                                 rng=jax.random.key(2))
    assert not np.allclose(np.asarray(logits_a), np.asarray(logits_b))
    # batch stats moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(ns))
    )
    assert moved


def test_forward_jit_and_grads(tiny_setup):
    cfg, graph, params, state, consts, batch = tiny_setup
    labels = jnp.asarray([0, 1, 2, 3])

    @jax.jit
    def loss_fn(p):
        logits, _, _ = mgnns_apply(p, state, consts, batch, cfg=cfg, train=False)
        logp = jax.nn.log_softmax(logits)
        return -logp[jnp.arange(4), labels].mean()

    g = jax.grad(loss_fn)(params)
    # gradients reach every trainable subtree the reference optimizes
    for name in ["text_gcn", "lstm", "gc1", "gc2", "object_attention",
                 "img_object_text_mha", "multi_linear_1"]:
        total = sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(g[name]))
        assert total > 0, f"no grad reached {name}"
    # A matrices must NOT receive gradient (gen_adj is detached)
    assert np.abs(np.asarray(g["object_A"])).sum() == 0
    assert np.abs(np.asarray(g["place_A"])).sum() == 0


def test_text_only_model(tiny_setup):
    cfg, graph, params, state, consts, batch = tiny_setup
    p = text_model_init(jax.random.key(0), cfg.vocab_size, 7, graph.num_edges)
    logits = text_model_apply(p, batch, ngram=2, train=False)
    assert logits.shape == (4, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_bn_mode_frozen_keeps_stats(tiny_setup):
    """bn_mode='frozen': train-mode forward must not touch running stats."""
    import dataclasses

    cfg, graph, params, state, consts, batch = tiny_setup
    frozen_cfg = dataclasses.replace(cfg, bn_mode="frozen")
    _, ns, _ = mgnns_apply(params, state, consts, batch, cfg=frozen_cfg,
                           train=True, rng=jax.random.key(0))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(ns)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unroll_trunks_matches_scan(tiny_setup):
    """unroll_trunks=True must be numerically identical to the scan path."""
    import dataclasses

    cfg, graph, params, state, consts, batch = tiny_setup
    ref, _, _ = mgnns_apply(params, state, consts, batch, cfg=cfg, train=False)
    ucfg = dataclasses.replace(cfg, unroll_trunks=True)
    out, _, _ = mgnns_apply(params, state, consts, batch, cfg=ucfg, train=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5, rtol=1e-5)


def test_freeze_trunks_zero_grads_and_frozen_opt(tiny_setup):
    """freeze_trunks: trunk grads are structurally zero, trunk params frozen
    by the optimizer label map, batch stats untouched."""
    import dataclasses
    from mgnns_tpu.engine.optim import label_params

    cfg, graph, params, state, consts, batch = tiny_setup
    fcfg = dataclasses.replace(cfg, freeze_trunks=True)
    labels = jnp.asarray((np.arange(batch["ids"].shape[0]) % 7).astype(np.int32))

    def loss_fn(p, s):
        logits, new_s, _ = mgnns_apply(p, s, consts, batch, cfg=fcfg, train=True,
                                       rng=jax.random.key(0))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -lp[jnp.arange(logits.shape[0]), labels].mean(), new_s

    (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
    assert np.isfinite(float(loss))
    for trunk in ("object_trunk", "place_trunk"):
        g = jax.tree_util.tree_leaves(grads[trunk])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in g)
        # frozen BN stats pass through unchanged
        for a, b in zip(jax.tree_util.tree_leaves(new_s[trunk]),
                        jax.tree_util.tree_leaves(state[trunk])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-trunk grads are alive
    assert float(jnp.abs(grads["multi_linear_2"]["w"]).max()) > 0.0
    # optimizer labels mark trunks frozen
    lbl = label_params(params, freeze_trunks=True)
    assert set(jax.tree_util.tree_leaves(lbl["object_trunk"])) == {"frozen"}
    assert set(jax.tree_util.tree_leaves(lbl["lstm"])) == {"lstm"}

"""Pallas kernel equivalence vs the jnp reference (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.kernels.edge_max import window_max_aggregate_pallas
from mgnns_tpu.nn.text_gcn import window_max_aggregate


def _inputs(rng, B=4, L=16, D=8, ngram=3):
    W = 2 * ngram + 1
    emb = rng.standard_normal((B, L, D)).astype(np.float32)
    w = rng.uniform(-2, 2, (B, L, W)).astype(np.float32)
    lens = rng.integers(1, L + 1, (B,)).astype(np.int32)
    return jnp.asarray(emb), jnp.asarray(w), jnp.asarray(lens)


@pytest.mark.parametrize("ngram", [1, 3])
def test_pallas_matches_jnp_forward(rng, ngram):
    emb, w, lens = _inputs(rng, ngram=ngram)
    ref = window_max_aggregate(emb, w, lens, ngram)
    out = window_max_aggregate_pallas(emb, w, lens, ngram, True)
    # compare only valid rows (invalid rows are -inf in both)
    L = emb.shape[1]
    valid = np.arange(L)[None, :] < np.asarray(lens)[:, None]
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid], atol=1e-6)
    assert np.all(np.isneginf(np.asarray(out)[~valid]))


def test_pallas_gradients_match_jnp(rng):
    emb, w, lens = _inputs(rng, ngram=2)
    ngram = 2
    L = emb.shape[1]
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, :, None]

    def loss_ref(e, ww):
        m = window_max_aggregate(e, ww, lens, ngram)
        return jnp.sum(jnp.where(valid, m, 0.0) ** 2)

    def loss_pl(e, ww):
        m = window_max_aggregate_pallas(e, ww, lens, ngram, True)
        return jnp.sum(jnp.where(valid, m, 0.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(emb, w)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]), atol=1e-5)


def test_pallas_under_jit(rng):
    emb, w, lens = _inputs(rng, ngram=2)
    f = jax.jit(lambda e, ww, l: window_max_aggregate_pallas(e, ww, l, 2, True))
    out = f(emb, w, lens)
    ref = window_max_aggregate(emb, w, lens, 2)
    valid = np.arange(emb.shape[1])[None, :] < np.asarray(lens)[:, None]
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid], atol=1e-6)


def test_text_gcn_apply_pallas_path(rng):
    from mgnns_tpu.nn import text_gcn

    V, D, E, B, L, ngram = 30, 8, 12, 3, 10, 2
    params = text_gcn.text_gcn_init(jax.random.key(0), V, D, E)
    ids = rng.integers(1, V, (B, L)).astype(np.int32)
    lens = np.array([10, 4, 7], np.int32)
    for b, ln in enumerate(lens):
        ids[b, ln:] = 0
    eids = rng.integers(0, E, (B, L, 2 * ngram + 1)).astype(np.int32)
    a = text_gcn.text_gcn_apply(params, jnp.asarray(ids), jnp.asarray(lens),
                                jnp.asarray(eids), ngram=ngram, use_pallas=False)
    b_ = text_gcn.text_gcn_apply(params, jnp.asarray(ids), jnp.asarray(lens),
                                 jnp.asarray(eids), ngram=ngram, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_pallas_backward_tie_semantics(rng):
    """Exact ties across window offsets: jnp.maximum's VJP splits the
    cotangent 0.5/0.5 down the max chain; the Pallas backward must
    reproduce that, not winner-takes-all."""
    B, L, D, ngram = 2, 8, 4, 2
    W = 2 * ngram + 1
    # constant embedding + unit weights => every in-window message ties
    emb = jnp.ones((B, L, D), jnp.float32) * 0.5
    w = jnp.ones((B, L, W), jnp.float32)
    lens = jnp.array([8, 5], jnp.int32)
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, :, None]

    def mk(fn):
        def loss(e, ww):
            m = fn(e, ww)
            return jnp.sum(jnp.where(valid, m, 0.0) * jnp.arange(1, D + 1))
        return jax.grad(loss, argnums=(0, 1))

    g_ref = mk(lambda e, ww: window_max_aggregate(e, ww, lens, ngram))(emb, w)
    g_pl = mk(lambda e, ww: window_max_aggregate_pallas(e, ww, lens, ngram, True))(emb, w)
    # the tie-split produces fractional (non-binary) gradient mass
    assert len(np.unique(np.round(np.asarray(g_ref[1]), 6))) > 2
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]), atol=1e-6)

"""Text-level GCN vs the loop-level DGL-semantics oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.graphs import build_vocab, cal_pmi
from mgnns_tpu.graphs.pmi import doc_window_edge_ids
from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
from mgnns_tpu.nn import text_gcn

from tests.naive_reference import naive_doc_graph_forward

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log the dog",
    "a cat and a dog met a cat",
    "the cat chased the dog around the mat",
    "dogs and cats and logs and dogs",
    "the mat sat still",
]


def _setup(ngram=2, L=12, seed=0):
    vocab = build_vocab(CORPUS, min_count=1)
    graph = cal_pmi(CORPUS, vocab, window_size=3, min_cooccurrence=1, max_len=L)
    w2i = make_word_to_id(vocab)
    ids = np.zeros((len(CORPUS), L), np.int32)
    lens = np.zeros((len(CORPUS),), np.int32)
    for n, t in enumerate(CORPUS):
        toks = words_to_ids(t.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    eids = doc_window_edge_ids(ids, lens, ngram, graph)
    rng = np.random.default_rng(seed)
    node_emb = rng.standard_normal((len(vocab), 8)).astype(np.float32)
    edge_w = rng.uniform(-1.5, 1.5, size=(graph.num_edges, 1)).astype(np.float32)
    params = text_gcn.text_gcn_init(
        jax.random.key(0), len(vocab), 8, graph.num_edges,
        node_weights=node_emb, edge_weights=edge_w,
    )
    return vocab, graph, ids, lens, eids, params, node_emb, edge_w


def test_text_gcn_matches_dgl_semantics_oracle():
    ngram = 2
    vocab, graph, ids, lens, eids, params, node_emb, edge_w = _setup(ngram)
    mapping = graph.dense_edges_mapping()

    # pre-activation readout: run aggregation + readout directly
    emb = params["node_embedding"][jnp.asarray(ids)]
    w = params["edge_weight"][:, 0][jnp.asarray(eids)]
    m = text_gcn.window_max_aggregate(emb, w, jnp.asarray(lens), ngram)
    h = np.asarray(text_gcn.unique_word_readout(m, jnp.asarray(ids), jnp.asarray(lens)))

    for n in range(len(CORPUS)):
        expected = naive_doc_graph_forward(ids[n], lens[n], ngram, node_emb, edge_w, mapping)
        np.testing.assert_allclose(h[n], expected, atol=1e-5, err_msg=f"doc {n}")


def test_text_gcn_apply_relu_and_shape():
    ngram = 2
    _, _, ids, lens, eids, params, _, _ = _setup(ngram)
    out = text_gcn.text_gcn_apply(
        params, jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(eids),
        ngram=ngram, train=False,
    )
    assert out.shape == (len(CORPUS), 8)
    assert (np.asarray(out) >= 0).all()  # ReLU


def test_text_gcn_duplicate_words_counted_once():
    """'a b a' must read out emb-count for {a, b}, not 3 positions."""
    vocab = ["PAD", "UNK", "a", "b"]
    graph = cal_pmi(["a b a"], vocab, window_size=2, min_cooccurrence=1, max_len=5)
    ids = np.array([[2, 3, 2, 0, 0]], np.int32)
    lens = np.array([3], np.int32)
    ngram = 1
    eids = doc_window_edge_ids(ids, lens, ngram, graph)
    node_emb = np.array([[0.0], [0.0], [1.0], [10.0]], np.float32)
    edge_w = np.ones((graph.num_edges, 1), np.float32)
    params = text_gcn.text_gcn_init(jax.random.key(0), 4, 1, graph.num_edges,
                                    node_weights=node_emb, edge_weights=edge_w)
    emb = params["node_embedding"][jnp.asarray(ids)]
    w = params["edge_weight"][:, 0][jnp.asarray(eids)]
    m = text_gcn.window_max_aggregate(emb, w, jnp.asarray(lens), ngram)
    h = np.asarray(text_gcn.unique_word_readout(m, jnp.asarray(ids), jnp.asarray(lens)))
    # node a: incoming from {a, b} -> max(1, 10) = 10; node b: {a, b} -> 10
    np.testing.assert_allclose(h[0], [20.0], atol=1e-6)


def test_text_gcn_grads_flow():
    ngram = 2
    _, _, ids, lens, eids, params, _, _ = _setup(ngram)

    def loss(p):
        out = text_gcn.text_gcn_apply(p, jnp.asarray(ids), jnp.asarray(lens),
                                      jnp.asarray(eids), ngram=ngram, train=False)
        return (out**2).sum()

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["node_embedding"])).all()
    assert np.isfinite(np.asarray(g["edge_weight"])).all()
    assert np.abs(np.asarray(g["edge_weight"])).sum() > 0


def test_unique_word_readout_long_sequences():
    """The sort-based readout supports raised max_len (the large-corpus
    scaling envelope): exact vs a naive per-row oracle at L=512."""
    import jax.numpy as jnp

    from mgnns_tpu.nn.text_gcn import unique_word_readout

    rng = np.random.default_rng(3)
    B, L, D, V = 4, 512, 16, 40  # small V => many duplicate words per row
    ids = rng.integers(1, V, (B, L)).astype(np.int32)
    lens = np.array([512, 1, 300, 511], np.int32)
    m = rng.standard_normal((B, L, D)).astype(np.float32)
    m = np.where((np.arange(L)[None, :, None] < lens[:, None, None]), m, -np.inf)

    got = np.asarray(unique_word_readout(
        jnp.asarray(m), jnp.asarray(ids), jnp.asarray(lens)))

    want = np.zeros((B, D), np.float32)
    for b in range(B):
        for w in np.unique(ids[b, : lens[b]]):
            pos = np.where(ids[b, : lens[b]] == w)[0]
            want[b] += m[b, pos].max(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5)

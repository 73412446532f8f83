"""Golden-value and oracle tests for vocab / PMI / co-occurrence builders."""

import numpy as np
import pytest

from mgnns_tpu.graphs import (
    build_vocab,
    cal_pmi,
    build_cooccurrence,
    gen_A,
    gen_adj,
)
from mgnns_tpu.graphs.pmi import pad_and_filter, doc_window_edge_ids
from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids

from tests.naive_reference import naive_pmi, naive_gen_adj

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog met",
    "the cat chased the dog around the mat",
    "dogs and cats and logs",
    "the mat sat still",
]


def test_build_vocab_order_and_specials():
    vocab = build_vocab(CORPUS, min_count=2)
    assert vocab[0] == "PAD" and vocab[1] == "UNK"
    # first-occurrence order among kept words
    kept = vocab[2:]
    assert kept[0] == "the"
    freq = {}
    for t in CORPUS:
        for w in t.split(" "):
            freq[w] = freq.get(w, 0) + 1
    assert all(freq[w] >= 2 for w in kept)
    assert "chased" not in vocab  # freq 1


def test_build_vocab_min_count_one_keeps_all():
    vocab = build_vocab(CORPUS, min_count=1)
    words = {w for t in CORPUS for w in t.split(" ")}
    assert set(vocab) == words | {"PAD", "UNK"}


def test_pad_and_filter_drops_long_docs():
    docs = pad_and_filter(["a b c", "x " * 200], max_len=100)
    assert len(docs) == 1
    assert len(docs[0]) == 100
    assert docs[0][:3] == ["a", "b", "c"] and docs[0][3] == "PAD"


@pytest.mark.parametrize("window,minco", [(2, 1), (3, 2), (6, 2)])
def test_cal_pmi_matches_naive(window, minco):
    vocab = build_vocab(CORPUS, min_count=1)
    graph = cal_pmi(CORPUS, vocab, window_size=window, min_cooccurrence=minco, max_len=20)
    docs = pad_and_filter(CORPUS, max_len=20)
    weights, mapping, count = naive_pmi(docs, vocab, window, minco)
    assert graph.num_edges == count
    np.testing.assert_array_equal(graph.dense_edges_mapping(), mapping)
    np.testing.assert_allclose(
        graph.initial_edge_weights(trainable_init_one=False)[:, 0], weights, rtol=1e-6
    )
    np.testing.assert_array_equal(
        graph.initial_edge_weights(trainable_init_one=True),
        np.ones((count, 1), np.float32),
    )


def test_cal_pmi_oov_and_pad_excluded():
    vocab = build_vocab(CORPUS, min_count=2)  # some words OOV
    graph = cal_pmi(CORPUS, vocab, window_size=3, min_cooccurrence=1, max_len=20)
    src, dst = np.divmod(graph.keys, graph.vocab_size)
    assert (src != 0).all(), "PAD must never be an edge source"
    assert (dst != 0).all(), "PAD targets are zeroed by their unigram count"


def test_lookup_matches_dense():
    vocab = build_vocab(CORPUS, min_count=1)
    graph = cal_pmi(CORPUS, vocab, window_size=4, min_cooccurrence=1, max_len=20)
    dense = graph.dense_edges_mapping()
    rng = np.random.default_rng(0)
    src = rng.integers(0, len(vocab), size=(7, 5))
    dst = rng.integers(0, len(vocab), size=(7, 5))
    np.testing.assert_array_equal(graph.lookup(src, dst), dense[src, dst])


def test_doc_window_edge_ids():
    vocab = build_vocab(CORPUS, min_count=1)
    graph = cal_pmi(CORPUS, vocab, window_size=4, min_cooccurrence=1, max_len=20)
    dense = graph.dense_edges_mapping()
    w2i = make_word_to_id(vocab)
    L = 10
    ids = np.zeros((2, L), dtype=np.int64)
    lens = np.zeros((2,), dtype=np.int64)
    for n, text in enumerate(CORPUS[:2]):
        toks = words_to_ids(text.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    ngram = 2
    eids = doc_window_edge_ids(ids, lens, ngram, graph)
    assert eids.shape == (2, L, 2 * ngram + 1)
    for n in range(2):
        for j in range(L):
            for k, o in enumerate(range(-ngram, ngram + 1)):
                s = j + o
                if j < lens[n] and 0 <= s < lens[n]:
                    assert eids[n, j, k] == dense[ids[n, s], ids[n, j]]
                else:
                    assert eids[n, j, k] == 0


def test_build_cooccurrence_counts():
    sets = [[0, 1, 1], [1, 2], [0, 2], [2]]
    out = build_cooccurrence(sets, num_classes=4)
    np.testing.assert_array_equal(out["nums"], [2, 2, 3, 1])  # class 3 -> 1 (0/0 guard)
    assert out["adj"][0, 1] == 1 and out["adj"][1, 0] == 1
    assert out["adj"][1, 2] == 1 and out["adj"][2, 1] == 1
    assert out["adj"][0, 2] == 1
    assert out["adj"][0, 0] == 0  # dedup: no self pairs
    assert out["adj"][3].sum() == 0


def test_gen_A_threshold_and_selfloops():
    adj_data = {
        "nums": np.array([4.0, 2.0, 1.0]),
        "adj": np.array([[0, 3, 1], [3, 0, 0], [1, 0, 0]], dtype=float),
    }
    A, nums = gen_A(3, t=0.5, adj_data=adj_data, gama=0.2)
    # P(j|i): row0 = [0, .75, .25]; row1 = [1.5, 0, 0]; row2 = [1, 0, 0]
    binar = np.array([[0, 1, 0], [1, 0, 0], [1, 0, 0]], dtype=float)
    expected = binar * 0.2 / (binar.sum(0, keepdims=True) + 1e-6) + 0.8 * np.eye(3)
    np.testing.assert_allclose(A, expected, rtol=1e-9)


def test_gen_adj_matches_naive():
    rng = np.random.default_rng(1)
    A = rng.uniform(0.1, 1.0, size=(6, 6))
    np.testing.assert_allclose(np.asarray(gen_adj(A)), naive_gen_adj(A), rtol=1e-5)


def test_gen_A_reference_pickles():
    """Shape/value sanity on the checked-in object/place adjacency pickles."""
    import os

    ref = "/root/reference/data/adj"
    if not os.path.exists(ref):
        pytest.skip("reference data unavailable")
    A, nums = gen_A(80, t=0.4, adj_data=os.path.join(ref, "tumblr_objects_adj.pkl"))
    assert A.shape == (80, 80) and nums.shape == (80, 1)
    assert np.isfinite(A).all()
    np.testing.assert_allclose(np.diag(A), 0.8 * np.ones(80), atol=1e-6)
    A2, nums2 = gen_A(365, t=0.3, adj_data=os.path.join(ref, "tumblr_resnet50_places_adj.pkl"))
    assert A2.shape == (365, 365)
    norm = np.asarray(gen_adj(A2))
    assert np.isfinite(norm).all()

"""Native host-preprocessing library vs the numpy reference paths."""

import numpy as np
import pytest

from mgnns_tpu import native
from mgnns_tpu.graphs import build_vocab, cal_pmi
from mgnns_tpu.graphs.pmi import doc_window_edge_ids, pad_and_filter, _corpus_to_ids
from mgnns_tpu.graphs.vocab import make_word_to_id

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log the dog",
    "a cat and a dog met a cat",
    "dogs and cats and logs and dogs",
]


def test_native_builds_and_loads():
    assert native.available(), "native library failed to build/load"


def test_pair_count_matches_numpy(monkeypatch):
    vocab = build_vocab(CORPUS, 1)
    w2i = make_word_to_id(vocab)
    docs = pad_and_filter(CORPUS, max_len=12)
    ids = _corpus_to_ids(docs, w2i)
    # force the native path despite the small corpus (path choice is size-aware)
    monkeypatch.setattr(native, "_NATIVE_PAIR_THRESHOLD", 0)
    k_n, c_n, wc_n = native.pmi_pair_count(ids, len(vocab), 3)

    # numpy fallback forced
    native_lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        k_f, c_f, wc_f = native.pmi_pair_count(ids, len(vocab), 3)
    finally:
        native._lib, native._tried = native_lib, tried

    np.testing.assert_array_equal(k_n, k_f)
    np.testing.assert_array_equal(c_n, c_f)
    np.testing.assert_array_equal(wc_n, wc_f)


def test_window_edge_ids_matches_python():
    vocab = build_vocab(CORPUS, 1)
    graph = cal_pmi(CORPUS, vocab, 3, 1, max_len=12)
    w2i = make_word_to_id(vocab)
    from mgnns_tpu.graphs.vocab import words_to_ids

    L, ngram = 12, 2
    ids = np.zeros((len(CORPUS), L), np.int32)
    lens = np.zeros((len(CORPUS),), np.int32)
    for n, t in enumerate(CORPUS):
        toks = words_to_ids(t.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    ref = doc_window_edge_ids(ids, lens, ngram, graph)
    out = native.window_edge_ids(ids, lens, ngram, graph.keys, graph.vocab_size)
    np.testing.assert_array_equal(out, ref)


def test_pair_count_empty_and_oov():
    ids = np.full((2, 5), -1, np.int32)  # all OOV
    k, c, wc = native.pmi_pair_count(ids, 10, 3)
    assert len(k) == 0 and wc.sum() == 0
    ids = np.zeros((2, 5), np.int32)  # all PAD
    k, c, wc = native.pmi_pair_count(ids, 10, 3)
    assert len(k) == 0 and wc.sum() == 0

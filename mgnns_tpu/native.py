"""ctypes bindings for the native host-preprocessing library.

Loads ``native/libhost_preproc.so`` (built by ``make -C native``), exposing:

- :func:`pmi_pair_count` — sparse windowed co-occurrence counting
  (C++ open-addressing hash; replaces the numpy concat+unique pass in
  :func:`mgnns_tpu.graphs.pmi.cal_pmi` for very large corpora);
- :func:`window_edge_ids` — per-doc window edge-id lookup by binary search
  (the native path of
  :func:`mgnns_tpu.graphs.pmi.doc_window_edge_ids`).

``pmi_pair_count`` falls back to numpy when the library is missing;
``window_edge_ids``'s numpy fallback lives at its sole caller
(``graphs.pmi.doc_window_edge_ids``).  ``available()`` reports the state.
The library is built on demand the first time it's requested if a compiler
is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhost_preproc.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pmi_pair_count.restype = ctypes.c_int64
    lib.pmi_pair_count.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.window_edge_ids.restype = None
    lib.window_edge_ids.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# Below this many candidate pairs the vectorized numpy concat+unique pass is
# faster than the C++ hash (measured: 0.21s vs 0.64s on 10k TumEmo docs);
# above it, numpy's O(pairs) temporary arrays become the memory bottleneck
# and the bounded-memory native counter wins.
_NATIVE_PAIR_THRESHOLD = 50_000_000


def pmi_pair_count(ids: np.ndarray, vocab_size: int, window: int):
    """(sorted_keys, counts, word_counts) from [N, L] padded id matrix
    (-1 = OOV, 0 = PAD).  Path choice is size-aware: numpy for small
    corpora, the native counter for the large-corpus regime."""
    ids = np.ascontiguousarray(ids, np.int32)
    N, L = ids.shape
    candidate_pairs = N * L * 2 * window
    lib = _load() if candidate_pairs > _NATIVE_PAIR_THRESHOLD else None
    if lib is not None:
        # Size the table to an estimate of DISTINCT pairs (natural-language
        # co-occurrence is heavy-tailed), growing on overflow — sizing to the
        # worst case would allocate tens of GB exactly in the large-corpus
        # regime this path exists for.
        cap = int(max(1 << 20, min(candidate_pairs // 8, 1 << 23)))
        while True:
            out_keys = np.empty(cap, np.int64)
            out_counts = np.empty(cap, np.int64)
            wc = np.zeros(vocab_size, np.int64)
            n = lib.pmi_pair_count(
                _ptr(ids, ctypes.c_int32), N, L, vocab_size, window,
                _ptr(out_keys, ctypes.c_int64), _ptr(out_counts, ctypes.c_int64),
                cap, _ptr(wc, ctypes.c_int64),
            )
            if n >= 0:
                order = np.argsort(out_keys[:n], kind="stable")
                return out_keys[:n][order], out_counts[:n][order], wc
            if cap >= candidate_pairs:  # cannot overflow beyond the true bound
                break
            cap = min(cap * 4, candidate_pairs)
    # numpy fallback (same algorithm as graphs.pmi.cal_pmi)
    src_valid = ids > 0
    wc = np.bincount(ids[src_valid].ravel(), minlength=vocab_size).astype(np.int64)
    chunks = []
    for o in range(-window, window):
        if o == 0:
            continue
        if o > 0:
            s, t = ids[:, : L - o], ids[:, o:]
        else:
            s, t = ids[:, -o:], ids[:, : L + o]
        m = (s > 0) & (t >= 0)
        chunks.append(s[m].astype(np.int64) * vocab_size + t[m].astype(np.int64))
    allk = np.concatenate(chunks) if chunks else np.zeros((0,), np.int64)
    keys, counts = np.unique(allk, return_counts=True)
    return keys, counts.astype(np.int64), wc


def window_edge_ids(ids: np.ndarray, lens: np.ndarray, ngram: int,
                    sorted_keys: np.ndarray, vocab_size: int) -> np.ndarray:
    """[N, L, 2*ngram+1] edge-id tensor via the native binary search.

    The numpy fallback lives in ONE place —
    :func:`mgnns_tpu.graphs.pmi.doc_window_edge_ids`, which is also the only
    caller and dispatches here exclusively when :func:`available` — so this
    raises rather than carrying a drift-prone duplicate of that loop."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native library unavailable; use graphs.pmi.doc_window_edge_ids")
    ids = np.ascontiguousarray(ids, np.int32)
    lens = np.ascontiguousarray(lens, np.int32)
    sorted_keys = np.ascontiguousarray(sorted_keys, np.int64)
    N, L = ids.shape
    W = 2 * ngram + 1
    out = np.empty((N, L, W), np.int32)
    lib.window_edge_ids(
        _ptr(ids, ctypes.c_int32), _ptr(lens, ctypes.c_int32),
        N, L, ngram,
        _ptr(sorted_keys, ctypes.c_int64), len(sorted_keys),
        vocab_size, _ptr(out, ctypes.c_int32),
    )
    return out

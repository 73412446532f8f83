"""Naive loop-level oracles for graph construction, written directly from the
reference algorithm descriptions (see SURVEY.md section 2, components 8/9/13).

These deliberately mirror the *semantics* of the reference's Python loops
(including quirks like the asymmetric window and PAD handling) so the
vectorized implementations in ``mgnns_tpu.graphs`` can be checked cell by
cell on small corpora.
"""

from __future__ import annotations

import numpy as np


def naive_pmi(docs, vocab, window_size, min_cooccurrence):
    """Dense O(V^2) PMI with edge enumeration; ``docs`` are padded token lists.

    Returns (edges_weights [E+1], edges_mappings [V, V], count).
    """
    d = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    pair = np.zeros((V, V), dtype=np.int64)
    wc = np.zeros(V, dtype=np.int64)
    for sentence in docs:
        for i, word in enumerate(sentence):
            if word == "PAD":
                continue
            if word not in d:
                continue
            wc[d[word]] += 1
            start = max(0, i - window_size)
            end = min(len(sentence), i + window_size)
            for j in range(start, end):
                if i == j:
                    continue
                tw = sentence[j]
                if tw not in d:
                    continue
                pair[d[word], d[tw]] += 1
    pair[pair < min_cooccurrence] = 0
    total = wc.sum()
    p_w = wc / total
    p_pair = pair / total
    pmi = np.zeros((V, V))
    for i in range(V):
        for j in range(V):
            if p_w[i] * p_w[j] == 0 or p_pair[i, j] == 0:
                pmi[i, j] = 0
            else:
                pmi[i, j] = np.log(p_pair[i, j] / (p_w[i] * p_w[j]))
    pmi = np.nan_to_num(pmi)
    pmi = np.maximum(pmi, 0.0)
    weights = [0.0]
    count = 1
    mapping = np.zeros((V, V), dtype=np.int64)
    for i in range(V):
        for j in range(V):
            if pmi[i, j] != 0:
                weights.append(pmi[i, j])
                mapping[i, j] = count
                count += 1
    return np.array(weights), mapping, count


def naive_gen_adj(A):
    """((A @ D)^T) @ D with D = diag(rowsum(A)^-0.5)."""
    D = np.power(A.sum(1), -0.5)
    D = np.diag(D)
    return (A @ D).T @ D


def naive_doc_graph_forward(doc_ids, length, ngram, node_emb, edge_w, mapping):
    """Per-document text-level GCN forward (pre-readout), loop version.

    Builds the subgraph exactly as reference ``models/Text_GCN.py:142-211``:
    de-pad, nodes = unique words, window edges of radius ngram + self loops,
    message = src_emb * edge_weight, reduce = max, zero for message-less
    nodes, readout = sum over unique-word nodes.
    """
    ids = [int(t) for t in doc_ids[:length] if int(t) != 0]
    uniq = sorted(set(ids))
    incoming = {u: [] for u in uniq}
    for idx, src in enumerate(ids):
        lo, hi = max(0, idx - ngram), min(idx + ngram + 1, len(ids))
        for k in range(lo, hi):
            dst = ids[k]
            incoming[dst].append(src)
        incoming[src].append(src)  # explicit self loop
    D = node_emb.shape[1]
    out = np.zeros(D)
    for u in uniq:
        if not incoming[u]:
            continue
        msgs = [node_emb[s] * edge_w[mapping[s, u], 0] for s in incoming[u]]
        out += np.max(np.stack(msgs), axis=0)
    return out

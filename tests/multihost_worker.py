"""Worker process for the REAL multi-process SPMD test.

Launched (2x) by tests/test_multihost_2proc.py with
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars set, so
:func:`mgnns_tpu.parallel.multihost.initialize`'s env path is what brings up
the distributed runtime.  Each process owns 2 virtual CPU devices; the mesh
is the global ('data'=2, 'model'=2) grid spanning both processes, so the
sharded text-model train step exercises cross-process collectives over both
axes.  Results (per-step losses, confusion total, replicated param
checksums) are written to JSON for the parent to compare.
"""

import json
import os
import sys


def main():
    out_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mgnns_tpu.parallel.multihost import (
        epoch_num_batches,
        host_local_to_global,
        initialize,
        process_batch_slice,
    )

    initialize()  # env-var path: JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import numpy as np

    from mgnns_tpu.engine import metrics as M
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.graphs import build_vocab, cal_pmi
    from mgnns_tpu.graphs.pmi import doc_window_edge_ids
    from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
    from mgnns_tpu.models import text_model_apply, text_model_init
    from mgnns_tpu.parallel.mesh import _BATCH_FIELDS, create_mesh
    from mgnns_tpu.parallel.sharding import text_model_param_rules

    # --- identical corpus/model on every host (same seed) -----------------
    texts = [f"w{i} w{(i + 1) % 12} w{(i + 2) % 12} w{(i + 3) % 12}"
             for i in range(16)]
    vocab = build_vocab(texts, 1)
    graph = cal_pmi(texts, vocab, 3, 1, max_len=8)
    w2i = make_word_to_id(vocab)

    N, GLOBAL_BATCH, L = 9, 4, 8  # N odd: hosts get 5 vs 4 samples
    ids = np.zeros((N, L), np.int32)
    lens = np.zeros((N,), np.int32)
    for n in range(N):
        toks = words_to_ids(texts[n].split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    eids = doc_window_edge_ids(ids, lens, 2, graph)
    labels = (np.arange(N) % 7).astype(np.int32)

    # --- this host's slice + forced epoch length --------------------------
    start, stop, per_host = process_batch_slice(N, GLOBAL_BATCH)
    num_batches = epoch_num_batches(N, GLOBAL_BATCH)
    assert num_batches == 3  # max host has 5 samples, per-host batch 2

    def host_batches():
        """Per-host static-shape batches incl. weight-0 tail padding —
        the same contract DeviceLoader(num_batches=...) provides."""
        idx = np.arange(start, stop)
        for k in range(num_batches):
            chunk = idx[k * per_host : (k + 1) * per_host]
            n_valid = len(chunk)
            if n_valid == 0:
                chunk = idx[-1:]
            pad = per_host - len(chunk)
            full = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
            yield {
                "ids": ids[full], "lens": lens[full], "eids": eids[full],
                "label": labels[full],
                "weight": (np.arange(per_host) < n_valid).astype(np.float32),
            }

    # --- sharded engine over the GLOBAL mesh ------------------------------
    mesh = create_mesh(data=2, model=2)
    params = text_model_init(jax.random.key(0), len(vocab), 7, graph.num_edges)

    def apply_fn(p, bs, batch, *, train, rng):
        return text_model_apply(p, batch, ngram=2, train=train, rng=rng), bs

    eng = Engine(apply_fn, params, {}, num_classes=7, lr=1e-2,
                 steps_per_epoch=num_batches, mesh=mesh,
                 param_sharding_rules=text_model_param_rules())

    from jax.sharding import NamedSharding, PartitionSpec as P

    cm = jax.device_put(M.confusion_init(7), NamedSharding(mesh, P()))
    losses = []
    for local in host_batches():
        batch = host_local_to_global(local, mesh, _BATCH_FIELDS)
        eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
        losses.append(float(jax.device_get(loss)))
    jax.block_until_ready(eng.state.params)

    # replicated leaves are directly comparable across hosts; model-sharded
    # leaves are compared via their locally addressable shards' checksum
    head_w = np.asarray(jax.device_get(eng.state.params["head"]["w"]))
    emb = eng.state.params["text_gcn"]["node_embedding"]
    local_shards = sorted(
        (s.index[0].start or 0, float(np.asarray(s.data).sum()))
        for s in emb.addressable_shards)
    out = {
        "process": jax.process_index(),
        "losses": losses,
        "cm_total": float(np.asarray(jax.device_get(cm)).sum()),
        "head_w_sum": float(head_w.sum()),
        "head_w_first": head_w.reshape(-1)[:5].tolist(),
        "emb_local_shards": local_shards,
        "num_batches": num_batches,
        "slice": [int(start), int(stop)],
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[worker {jax.process_index()}] ok", flush=True)


if __name__ == "__main__":
    main()

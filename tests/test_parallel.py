"""Sharded execution on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from mgnns_tpu.parallel.mesh import create_mesh, batch_device_put
from mgnns_tpu.parallel.sharding import (
    mgnns_param_rules, text_model_param_rules, shard_pytree, resolve_spec,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_create_mesh_shapes():
    mesh = create_mesh(data=4, model=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(data=16, model=1)


def test_resolve_spec_rules():
    rules = mgnns_param_rules()
    assert resolve_spec("text_gcn/node_embedding", rules) == P("model", None)
    assert resolve_spec("img_object_text_mha/0/slf_attn/w_qs/w", rules) == P(None, "model")
    assert resolve_spec("img_object_text_mha/0/slf_attn/fc/w", rules) == P("model", None)
    assert resolve_spec("object_trunk/conv1/w", rules) == P()  # replicated


def test_shard_pytree_placement():
    mesh = create_mesh(data=2, model=4)
    tree = {
        "text_gcn": {"node_embedding": jnp.zeros((16, 8)), "edge_weight": jnp.zeros((12, 1))},
        "head": {"w": jnp.zeros((8, 3))},
    }
    sharded = shard_pytree(tree, mesh, text_model_param_rules())
    emb_shard = sharded["text_gcn"]["node_embedding"].sharding
    assert emb_shard.spec == P("model", None)
    assert sharded["head"]["w"].sharding.spec == P()


def test_shard_pytree_uneven_falls_back():
    mesh = create_mesh(data=2, model=4)
    tree = {"text_gcn": {"node_embedding": jnp.zeros((10, 8))}}  # 10 % 4 != 0
    sharded = shard_pytree(tree, mesh, text_model_param_rules())
    assert sharded["text_gcn"]["node_embedding"].sharding.spec == P()


def test_sharded_text_model_train_step():
    """Full jitted train step with params sharded over 'model' and the batch
    over 'data' — data+model parallel on 8 virtual devices."""
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.graphs import build_vocab, cal_pmi
    from mgnns_tpu.graphs.pmi import doc_window_edge_ids
    from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
    from mgnns_tpu.models import text_model_init, text_model_apply

    texts = [f"w{i} w{(i+1)%16} w{(i+2)%16} w{(i+3)%16}" for i in range(16)]
    vocab = build_vocab(texts, 1)
    # pad vocab to a multiple of 4 for even sharding
    while len(vocab) % 4:
        vocab.append(f"pad{len(vocab)}")
    graph = cal_pmi(texts, vocab, 3, 1, max_len=8)
    w2i = make_word_to_id(vocab)
    B, L = 8, 8
    ids = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int32)
    for n in range(B):
        toks = words_to_ids(texts[n].split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    eids = doc_window_edge_ids(ids, lens, 2, graph)

    mesh = create_mesh(data=2, model=4)
    params = text_model_init(jax.random.key(0), len(vocab), 7, graph.num_edges)

    def apply_fn(p, bs, batch, *, train, rng):
        return text_model_apply(p, batch, ngram=2, train=train, rng=rng), bs

    eng = Engine(apply_fn, params, {}, num_classes=7, lr=1e-2, steps_per_epoch=1,
                 mesh=mesh, param_sharding_rules=text_model_param_rules())
    # param actually sharded over model axis
    assert eng.state.params["text_gcn"]["node_embedding"].sharding.spec == P("model", None)

    batch = batch_device_put({
        "ids": ids, "lens": lens, "eids": eids,
        "label": np.arange(B, dtype=np.int32) % 7,
        "weight": np.ones((B,), np.float32),
    }, mesh)
    assert batch["ids"].sharding.spec == P("data", None)

    from mgnns_tpu.engine import metrics as M

    cm = M.confusion_init(7)
    state0 = jax.tree_util.tree_map(np.asarray, eng.state.params)
    eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
    assert np.isfinite(float(loss))
    # params changed and remain sharded
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state0),
                        jax.tree_util.tree_leaves(eng.state.params))
    )
    assert changed
    out_spec = tuple(eng.state.params["text_gcn"]["node_embedding"].sharding.spec)
    assert out_spec and out_spec[0] == "model"  # still model-sharded (trailing None may be normalized away)
    assert int(np.asarray(cm).sum()) == B


def test_dp_matches_single_device():
    """Pure data parallelism must be numerically identical to one device."""
    from mgnns_tpu.models import text_model_init, text_model_apply

    texts_ids = np.random.default_rng(0).integers(1, 20, (8, 6)).astype(np.int32)
    lens = np.full((8,), 6, np.int32)
    eids = np.zeros((8, 6, 5), np.int32)
    params = text_model_init(jax.random.key(0), 24, 7, 10)
    batch = {"ids": texts_ids, "lens": lens, "eids": eids}

    single = np.asarray(text_model_apply(params, {k: jnp.asarray(v) for k, v in batch.items()}, ngram=2))

    mesh = create_mesh(data=8, model=1)
    sbatch = batch_device_put(batch, mesh)
    sparams = shard_pytree(params, mesh, [])
    sharded = np.asarray(jax.jit(
        lambda p, b: text_model_apply(p, b, ngram=2)
    )(sparams, sbatch))
    np.testing.assert_allclose(single, sharded, atol=1e-6)

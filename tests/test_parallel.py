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


def test_shard_pytree_pads_gather_tables():
    """Odd-sized gather tables are zero-padded to a mesh multiple and REALLY
    shard over 'model' (the flagship vocab is 20,153 — odd)."""
    mesh = create_mesh(data=2, model=4)
    emb = jnp.arange(10 * 8, dtype=jnp.float32).reshape(10, 8)
    tree = {"text_gcn": {"node_embedding": emb, "edge_weight": jnp.ones((13, 1))}}
    sharded = shard_pytree(tree, mesh, text_model_param_rules())
    out = sharded["text_gcn"]["node_embedding"]
    assert tuple(out.sharding.spec)[:1] == ("model",)
    assert out.shape == (12, 8)  # padded 10 -> 12
    np.testing.assert_array_equal(np.asarray(out)[:10], np.asarray(emb))
    np.testing.assert_array_equal(np.asarray(out)[10:], 0.0)
    ew = sharded["text_gcn"]["edge_weight"]
    assert ew.shape == (16, 1) and tuple(ew.sharding.spec)[:1] == ("model",)


def test_shard_pytree_uneven_nonpaddable_falls_back():
    """Matmul operands can't be padded without corrupting the contraction —
    an uneven non-table leaf must replicate."""
    mesh = create_mesh(data=2, model=4)
    tree = {"gc1": {"w": jnp.zeros((300, 1022))}}  # 1022 % 4 != 0, rule P(None,'model')
    sharded = shard_pytree(tree, mesh, mgnns_param_rules())
    assert sharded["gc1"]["w"].sharding.spec == P()
    assert sharded["gc1"]["w"].shape == (300, 1022)  # untouched


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
    # the framework pads tables to mesh multiples itself — no hand-padding
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


@pytest.mark.parametrize("model_axis", [2, 4])
def test_flagship_sizes_model_parallel(model_axis):
    """The REAL sizes: V=20,153 (odd) / E=166,756 must carry P('model', ...)
    sharding — the scaling rationale in parallel/sharding.py:5-16 — through
    the same Engine + mgnns_param_rules path the CLI uses, and a train step
    must run and keep the sharding."""
    from mgnns_tpu.engine import metrics as M
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.models import text_model_init, text_model_apply

    V, E = 20153, 166756
    mesh = create_mesh(data=8 // model_axis, model=model_axis)
    params = text_model_init(jax.random.key(0), V, 7, E)

    def apply_fn(p, bs, batch, *, train, rng):
        return text_model_apply(p, batch, ngram=2, train=train, rng=rng), bs

    eng = Engine(apply_fn, params, {}, num_classes=7, steps_per_epoch=1,
                 mesh=mesh, param_sharding_rules=mgnns_param_rules())
    padded_V = -(-V // model_axis) * model_axis
    padded_E = -(-E // model_axis) * model_axis
    emb = eng.state.params["text_gcn"]["node_embedding"]
    ew = eng.state.params["text_gcn"]["edge_weight"]
    assert tuple(emb.sharding.spec)[:1] == ("model",)
    assert emb.shape == (padded_V, 300)
    assert tuple(ew.sharding.spec)[:1] == ("model",)
    assert ew.shape == (padded_E, 1)
    # each device holds 1/model_axis of the table, not a full replica
    shard_rows = {s.data.shape[0] for s in emb.addressable_shards}
    assert shard_rows == {padded_V // model_axis}

    B, L, W = 8, 12, 5
    r = np.random.default_rng(0)
    batch = batch_device_put({
        "ids": r.integers(1, V, (B, L)).astype(np.int32),
        "lens": np.full((B,), L, np.int32),
        "eids": r.integers(0, E, (B, L, W)).astype(np.int32),
        "label": (np.arange(B) % 7).astype(np.int32),
        "weight": np.ones((B,), np.float32),
    }, mesh)
    cm = M.confusion_init(7)
    eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
    assert np.isfinite(float(loss))
    assert tuple(eng.state.params["text_gcn"]["node_embedding"].sharding.spec)[:1] == ("model",)


def test_large_vocab_scaling_demo():
    """SURVEY §5 large-graph scaling: a 100k+-vocab text graph trains with
    per-device table shards that are 8x smaller than the full table — the
    configuration that lets vocabularies larger than one chip's HBM budget
    train sharded."""
    from mgnns_tpu.engine import metrics as M
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.models import text_model_init, text_model_apply

    V, E = 100_003, 1_000_001  # both odd on purpose
    mesh = create_mesh(data=1, model=8)
    params = text_model_init(jax.random.key(0), V, 7, E)

    def apply_fn(p, bs, batch, *, train, rng):
        return text_model_apply(p, batch, ngram=2, train=train, rng=rng), bs

    eng = Engine(apply_fn, params, {}, num_classes=7, steps_per_epoch=1,
                 mesh=mesh, param_sharding_rules=mgnns_param_rules())
    emb = eng.state.params["text_gcn"]["node_embedding"]
    full_bytes = emb.dtype.itemsize * emb.shape[0] * emb.shape[1]
    shard_bytes = max(s.data.nbytes for s in emb.addressable_shards)
    assert shard_bytes * 8 <= full_bytes + 8 * 300 * emb.dtype.itemsize  # 1/8 + pad slack
    assert shard_bytes < full_bytes / 7  # decisively smaller than a replica

    B, L, W = 8, 12, 5
    r = np.random.default_rng(1)
    batch = batch_device_put({
        "ids": r.integers(1, V, (B, L)).astype(np.int32),
        "lens": np.full((B,), L, np.int32),
        "eids": r.integers(0, E, (B, L, W)).astype(np.int32),
        "label": (np.arange(B) % 7).astype(np.int32),
        "weight": np.ones((B,), np.float32),
    }, mesh)
    cm = M.confusion_init(7)
    eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_fusion_model_sharded_train_step():
    """The FULL fusion model's sharded train step on the 8-device mesh —
    exactly the driver's multichip dryrun (same config, shared compile
    cache), so this test guards the external artifact."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_fusion_dp_matches_single_device():
    """Fusion-model eval forward: 8-way data parallelism must match a single
    device numerically (per-sample compute has no cross-batch reductions in
    eval mode)."""
    import __graft_entry__
    from mgnns_tpu.config import ModelConfig
    from mgnns_tpu.models import mgnns_apply

    cfg = ModelConfig(vocab_size=257, edges_num=515, image_size=64,
                      compute_dtype="float32")
    params, bstats, consts = __graft_entry__._build(cfg, cfg.edges_num, jax.random.key(0))
    batch = __graft_entry__._tiny_inputs(
        cfg, cfg.edges_num, B=8, L=16, W=9, image_size=cfg.image_size,
        rng=np.random.default_rng(3))

    def fwd(p, bs, b):
        logits, _, _ = mgnns_apply(p, bs, consts, b, cfg=cfg, train=False)
        return logits

    single = np.asarray(jax.jit(fwd)(params, bstats, batch))

    mesh = create_mesh(data=8, model=1)
    sbatch = batch_device_put(batch, mesh)
    sparams = shard_pytree(params, mesh, [])
    sbstats = shard_pytree(bstats, mesh, [])
    sharded = np.asarray(jax.jit(fwd)(sparams, sbstats, sbatch))
    np.testing.assert_allclose(single, sharded, atol=2e-4, rtol=1e-4)


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

"""Roundtrip test of the reference-checkpoint interop: our params ->
reference-named state_dict -> our params, and forward equality."""

import numpy as np
import jax
import pytest

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs import gen_A
from mgnns_tpu.models import mgnns_init, mgnns_apply
from mgnns_tpu.models.import_reference import (
    export_reference_state_dict,
    import_reference_state_dict,
)


@pytest.fixture(scope="module")
def built():
    r = np.random.default_rng(0)
    cfg = ModelConfig(vocab_size=60, edges_num=40, image_size=64,
                      object_num_classes=5, place_num_classes=6)
    oA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    pA, _ = gen_A(6, 0.4, {"nums": np.ones(6), "adj": np.ones((6, 6))})
    params, stats, consts = mgnns_init(
        jax.random.key(0), cfg, num_edges=40,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA)
    return cfg, params, stats, consts


def test_roundtrip_params_equal(built):
    cfg, params, stats, consts = built
    sd = export_reference_state_dict(params, stats)
    # spot-check reference naming conventions
    assert "embedding.weight" in sd
    assert "lstm.weight_ih_l1_reverse" in sd
    assert "object_features.0.weight" in sd           # Sequential conv1
    assert "object_features.6.10.conv2.weight" in sd  # layer3 block 10
    assert "img_object_text_multi_head_att.1.pos_ffn.w_1.weight" in sd
    assert sd["img_object_text_multi_head_att.0.slf_attn.w_qs.weight"].shape == (512, 300)
    assert sd["multi_linear_2.weight"].shape == (7, 300)
    assert sd["object_features.0.weight"].shape == (64, 3, 7, 7)  # OIHW

    p2, s2 = import_reference_state_dict(sd)
    flat1 = jax.tree_util.tree_leaves_with_path(
        {k: v for k, v in params.items()})
    p2_full = dict(p2)
    for (path, a) in flat1:
        node = p2_full
        ok = True
        for key in path:
            kk = key.key if hasattr(key, "key") else key.idx
            try:
                node = node[kk]
            except (KeyError, TypeError, IndexError):
                ok = False
                break
        assert ok, f"missing in roundtrip: {jax.tree_util.keystr(path)}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(node), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_roundtrip_forward_equal(built):
    cfg, params, stats, consts = built
    sd = export_reference_state_dict(params, stats)
    p2, s2 = import_reference_state_dict(sd)
    import jax.numpy as jnp

    r = np.random.default_rng(1)
    B, L = 2, 8
    batch = {
        "ids": jnp.asarray(r.integers(1, 60, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 40, (B, L, 9)).astype(np.int32)),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((6, 300)).astype(np.float32)),
    }
    a, _, _ = mgnns_apply(params, stats, consts, batch, cfg=cfg, train=False)
    b, _, _ = mgnns_apply(p2, s2, consts, batch, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_import_tolerates_dead_reference_modules(built):
    """Dead-module keys in a checkpoint never crash the import: COMPLETE
    dead modules round-trip (tests/test_dead_modules.py covers the full
    surface); a PARTIAL subtree (pruned / strict=False-truncated checkpoint)
    is treated as absent."""
    cfg, params, stats, consts = built
    sd = export_reference_state_dict(params, stats)
    # partial GRU: only one of the 8 expected rnn.* keys -> skipped
    sd["rnn.weight_ih_l0"] = np.zeros((450, 300), np.float32)
    # complete (bias-less) dead linears -> imported, and ignored by forward
    sd["object_gate.weight"] = np.zeros((300, 600), np.float32)
    sd["object_linear_1.weight"] = np.zeros((1024, 2048), np.float32)
    sd["text_features.Linear.weight"] = np.zeros((7, 300), np.float32)
    p2, s2 = import_reference_state_dict(sd)
    assert "rnn" not in p2
    assert "object_gate" in p2 and "text_head" in p2
    # the imported dead params do not perturb the forward
    import jax.numpy as jnp
    r = np.random.default_rng(3)
    B, L = 2, 8
    batch = {
        "ids": jnp.asarray(r.integers(1, 60, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 40, (B, L, 9)).astype(np.int32)),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((6, 300)).astype(np.float32)),
    }
    a, _, _ = mgnns_apply(params, stats, consts, batch, cfg=cfg, train=False)
    b, _, _ = mgnns_apply(p2, s2, consts, batch, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

"""Mixed-precision (bf16) regression tests: forward AND backward of the full
fusion model must be finite — guards the conv-VJP dtype bug found on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs import gen_A
from mgnns_tpu.models import mgnns_init, mgnns_apply


def test_bf16_train_step_backward_finite():
    r = np.random.default_rng(0)
    cfg = ModelConfig(vocab_size=50, edges_num=30, image_size=64,
                      object_num_classes=4, place_num_classes=5,
                      compute_dtype="bfloat16")
    oA, _ = gen_A(4, 0.4, {"nums": np.ones(4), "adj": np.ones((4, 4))})
    pA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    params, state, consts = mgnns_init(
        jax.random.key(0), cfg, num_edges=30,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA)
    B, L = 2, 6
    batch = {
        "ids": jnp.asarray(r.integers(1, 50, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 30, (B, L, 9)).astype(np.int32)),
        # uint8 pixels: exercises the on-device normalization path too
        "image": jnp.asarray(r.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8)),
        "object_inp": jnp.asarray(r.standard_normal((4, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
    }
    labels = jnp.asarray([0, 1])

    def loss_fn(p):
        logits, new_bs, _ = mgnns_apply(p, state, consts, batch, cfg=cfg,
                                        train=True, rng=jax.random.key(1))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -logp[jnp.arange(B), labels].mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # master params stay f32 even under bf16 compute
    assert params["gc1"]["w"].dtype == jnp.float32
    # trunk grads exist (bf16 conv backward works)
    g_trunk = sum(np.abs(np.asarray(x)).sum()
                  for x in jax.tree_util.tree_leaves(grads["object_trunk"]))
    assert g_trunk > 0


def test_uint8_normalization_matches_host():
    from mgnns_tpu.models.mgnns import normalize_image_batch
    from mgnns_tpu.data.images import normalize

    r = np.random.default_rng(1)
    raw = r.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    dev = np.asarray(normalize_image_batch(jnp.asarray(raw), jnp.float32))
    host = normalize(raw.astype(np.float32) / 255.0)
    np.testing.assert_allclose(dev, host, atol=1e-5)

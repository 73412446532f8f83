"""Trunk rematerialization: gradients must match the non-remat path exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import dataclasses

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.graphs import gen_A
from mgnns_tpu.models import mgnns_init, mgnns_apply


def test_remat_grads_identical():
    r = np.random.default_rng(0)
    base = ModelConfig(vocab_size=40, edges_num=20, image_size=64,
                       object_num_classes=4, place_num_classes=5)
    remat = dataclasses.replace(base, remat_trunks=True)
    oA, _ = gen_A(4, 0.4, {"nums": np.ones(4), "adj": np.ones((4, 4))})
    pA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    params, state, consts = mgnns_init(
        jax.random.key(0), base, num_edges=20,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA)
    B, L = 2, 5
    batch = {
        "ids": jnp.asarray(r.integers(1, 40, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 20, (B, L, 9)).astype(np.int32)),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((4, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
    }
    labels = jnp.asarray([0, 1])

    def make_loss(cfg):
        def loss(p):
            logits, _, _ = mgnns_apply(p, state, consts, batch, cfg=cfg, train=False)
            return -jax.nn.log_softmax(logits)[jnp.arange(B), labels].mean()
        return loss

    g_base = jax.grad(make_loss(base))(params)
    g_remat = jax.grad(make_loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_base), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # per-block remat (remat_policy='block'): same gradients, and the policy
    # must compose with both the scan and unrolled block layouts
    for unroll in (False, True):
        block = dataclasses.replace(base, remat_policy="block", unroll_trunks=unroll)
        g_block = jax.grad(make_loss(block))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_base),
                        jax.tree_util.tree_leaves(g_block)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_trunks_plus_block_policy_single_wrap():
    """--remat_trunks --remat_policy block must behave as 'block' alone
    (regression: the flags silently composed into double rematerialization
    — per-block checkpoints re-run inside a whole-trunk recompute)."""
    r = np.random.default_rng(1)
    base = ModelConfig(vocab_size=40, edges_num=20, image_size=64,
                       object_num_classes=4, place_num_classes=5)
    both = dataclasses.replace(base, remat_trunks=True, remat_policy="block")
    oA, _ = gen_A(4, 0.4, {"nums": np.ones(4), "adj": np.ones((4, 4))})
    pA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    params, state, consts = mgnns_init(
        jax.random.key(1), base, num_edges=20,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA)
    B, L = 2, 5
    batch = {
        "ids": jnp.asarray(r.integers(1, 40, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 20, (B, L, 9)).astype(np.int32)),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((4, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
    }
    labels = jnp.asarray([0, 1])

    def make_loss(cfg):
        def loss(p):
            logits, _, _ = mgnns_apply(p, state, consts, batch, cfg=cfg, train=False)
            return -jax.nn.log_softmax(logits)[jnp.arange(B), labels].mean()
        return loss

    # gradient parity with plain 'block'
    g_block = jax.grad(make_loss(dataclasses.replace(base, remat_policy="block")))(params)
    g_both = jax.grad(make_loss(both))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_block),
                    jax.tree_util.tree_leaves(g_both)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the combined config must not add a whole-trunk checkpoint around
    # the block remats: same number of remat primitives as 'block' alone
    block_jaxpr = str(jax.make_jaxpr(make_loss(
        dataclasses.replace(base, remat_policy="block")))(params))
    both_jaxpr = str(jax.make_jaxpr(make_loss(both))(params))
    assert both_jaxpr.count("remat") == block_jaxpr.count("remat")

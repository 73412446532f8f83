"""Numerical parity of core primitives against torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from mgnns_tpu.nn import core


def test_linear_matches_torch(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    p = core.linear_init(jax.random.key(0), 7, 5)
    lin = torch.nn.Linear(7, 5)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    ours = np.asarray(core.linear_apply(p, jnp.asarray(x)))
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_linear_init_distribution():
    p = core.linear_init(jax.random.key(1), 100, 50)
    bound = 1 / np.sqrt(100)
    w = np.asarray(p["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < 0.01


def test_layer_norm_matches_reference_formula(rng):
    """The reference LayerNorm (submodules.py:142-156) divides by the
    *unbiased* std plus eps — different from standard LN."""
    x = rng.standard_normal((3, 4, 8)).astype(np.float32)
    p = core.layer_norm_init(8)
    p = {"gamma": p["gamma"] * 1.5 + 0.1, "beta": p["beta"] + 0.3}
    ours = np.asarray(core.layer_norm_apply(p, jnp.asarray(x)))
    t = torch.from_numpy(x)
    mean = t.mean(-1, keepdim=True)
    std = t.std(-1, keepdim=True)  # unbiased by default, like the reference
    theirs = (1.5 * torch.ones(8) + 0.1) * (t - mean) / (std + 1e-6) + 0.3
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_dropout_semantics():
    x = jnp.ones((1000,))
    out = core.dropout(x, 0.5, jax.random.key(0), train=True)
    kept = np.asarray(out != 0)
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0)
    np.testing.assert_array_equal(np.asarray(core.dropout(x, 0.5, jax.random.key(0), train=False)), 1.0)
    np.testing.assert_array_equal(np.asarray(core.dropout(x, 0.5, None, train=True)), 1.0)


def test_embedding_padding_row_zero():
    w = np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32)
    p = core.embedding_init(jax.random.key(0), 10, 4, padding_idx=0, weights=w)
    table = np.asarray(p["table"])
    np.testing.assert_array_equal(table[0], 0.0)
    np.testing.assert_allclose(table[1:], w[1:])
    out = core.embedding_apply(p, jnp.asarray([[1, 0, 3]]))
    assert out.shape == (1, 3, 4)


def test_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((17,)).astype(np.float32)
    ours = np.asarray(core.leaky_relu(jnp.asarray(x), 0.2))
    theirs = torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_take_rows_matmul_backward_matches_scatter(rng):
    """take_rows' MXU-matmul VJP must equal the plain gather's scatter-add
    VJP exactly (same f32 sums, different op)."""
    import jax
    import jax.numpy as jnp
    from mgnns_tpu.nn.core import take_rows

    table = jnp.asarray(rng.standard_normal((37, 5)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 37, (4, 6)).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((4, 6, 5)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(take_rows(table, ids)), np.asarray(table[ids]))

    g_new = jax.grad(lambda t: (take_rows(t, ids) * cot).sum())(table)
    g_ref = jax.grad(lambda t: (t[ids] * cot).sum())(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
    # repeated ids accumulate
    ids2 = jnp.zeros((3,), jnp.int32)
    g2 = jax.grad(lambda t: take_rows(t, ids2).sum())(table)
    assert np.allclose(np.asarray(g2)[0], 3.0)

"""The ``mgnns_tpu.ops`` namespace is a public API surface, not decoration.

Op-level users (custom models composing this framework's primitives) import
from ``mgnns_tpu.ops``; these tests pin the contract: every exported name
resolves, is the SAME object as its home-module implementation (no drifting
copies), the init/apply pairs are complete, and a model built purely from
``ops`` symbols runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mgnns_tpu.ops as ops


def test_all_exports_resolve_and_are_canonical():
    assert len(ops.__all__) >= 30
    import mgnns_tpu.kernels.edge_max as edge_max
    import mgnns_tpu.nn.attention as attention
    import mgnns_tpu.nn.core as core
    import mgnns_tpu.nn.text_gcn as text_gcn

    homes = [attention, core, text_gcn, edge_max]
    for name in ops.__all__:
        obj = getattr(ops, name)
        assert obj is not None, name
        for home in homes:
            if hasattr(home, name):
                # identity, not equality: re-exports must be the same object
                assert getattr(home, name) is obj, name


def test_init_apply_pairs_complete():
    names = set(ops.__all__)
    for name in names:
        if name.endswith("_init"):
            assert name[:-5] + "_apply" in names, name
        if name.endswith("_apply") and name != "stem_s2d_apply":
            assert name[:-6] + "_init" in names, name


def test_compose_a_model_from_ops_only():
    """Linear -> LayerNorm -> GCN layer -> linear head, built and run
    entirely through the ops namespace under jit."""
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lin = ops.linear_init(k1, 16, 32)
    ln = ops.layer_norm_init(32)
    gc = ops.graph_conv_init(k2, 32, 8)
    head = ops.linear_init(k3, 8, 3)
    x = jax.random.normal(k4, (5, 16))
    adj = jnp.eye(5) + 0.1

    @jax.jit
    def forward(lin, ln, gc, head, x):
        h = ops.leaky_relu(ops.linear_apply(lin, x))
        h = ops.layer_norm_apply(ln, h)
        h = ops.graph_conv_apply(gc, h, adj)
        return ops.linear_apply(head, h)

    out = forward(lin, ln, gc, head, x)
    assert out.shape == (5, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_masked_helpers_behave():
    # [B=1, L=3, D=1] features, [B=1, L=3] mask — position 2 padded out
    x = jnp.array([[1.0, 2.0, 3.0]])[..., None]
    mask = jnp.array([[1.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ops.masked_mean(x, mask)), [[1.5]])
    np.testing.assert_allclose(np.asarray(ops.masked_max(x, mask)), [[2.0]])
    sm = np.asarray(ops.masked_softmax(x[..., 0], mask))
    assert sm[0, 2] == pytest.approx(0.0, abs=1e-6)
    assert sm.sum() == pytest.approx(1.0, rel=1e-5)

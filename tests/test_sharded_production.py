"""Sharded-vs-single FULL fusion forward at PRODUCTION shapes.

Round-5 review item 3b: the 4x2-mesh parity previously existed only at toy
shapes (``test_sharded_input.py``) while the unsharded production-shape
parity lived in ``test_full_parity.py`` — a dtype- or shape-dependent
sharding bug (a pad value crossing a shard boundary at V=real sizes, a
row-parallel matmul split landing mid-head at d_kv=128) would have passed
everything.  This runs the flagship forward at the reference run config
(image 448 -> 14x14 trunk grids, 80 object / 365 place classes, L=100,
``run.sh:1``) under a ('data','model') mesh and demands the same logits as
one device.  Eval mode (no BN batch stats -> no reduction-order chaos), so
tolerances stay tight.
"""

import jax
import numpy as np
import pytest

from mgnns_tpu.models import mgnns_apply
from mgnns_tpu.parallel.mesh import batch_device_put, create_mesh
from mgnns_tpu.parallel.sharding import mgnns_param_rules, shard_pytree

from tests.test_full_parity import _setup


@pytest.mark.slow
def test_sharded_forward_parity_production_shapes():
    r = np.random.default_rng(7)
    words = [f"w{i}" for i in range(300)]
    corpus = [" ".join(r.choice(words, size=r.integers(30, 90)))
              for _ in range(8)]
    cfg, params, state, consts, batch_np, graph, _ = _setup(
        corpus, image_size=448, obj_c=80, plc_c=365, L=100, ngram=4,
        batch_docs=4)
    assert int(batch_np["lens"].max()) > 20  # real production-ish docs

    def fwd(p, bs, b):
        logits, _, _ = mgnns_apply(p, bs, consts, b, cfg=cfg, train=False)
        return logits

    single = np.asarray(jax.jit(fwd)(params, state, batch_np), np.float32)

    mesh = create_mesh(data=4, model=2)
    p_sh = shard_pytree(params, mesh, mgnns_param_rules())
    bs_sh = shard_pytree(state, mesh, [])
    # the real-size gather tables must actually shard (zero-padded to the
    # model-axis multiple), not silently replicate
    emb = p_sh["text_gcn"]["node_embedding"]
    assert tuple(emb.sharding.spec)[:1] == ("model",), emb.sharding
    sharded = np.asarray(jax.jit(fwd)(p_sh, bs_sh,
                                      batch_device_put(batch_np, mesh)),
                         np.float32)

    assert sharded.shape == single.shape == (4, 7)
    # f32 + eval mode: the only legitimate difference is reduction order
    # inside the model-parallel psums — a few f32 ulps on O(1) logits
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)

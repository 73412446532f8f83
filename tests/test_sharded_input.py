"""SPMD input path: mesh-sharded device tables + fused epochs.

Round-3 verdict item 1: the device-resident-table fused-epoch pipeline must
exist under a ('data', 'model') mesh, with sharded-vs-single-device numerical
parity — not just finiteness (item 2).
"""

import numpy as np
import jax
import pytest

from mgnns_tpu.data.loader import DeviceLoader
from mgnns_tpu.engine.train import Engine
from mgnns_tpu.models import text_model_apply, text_model_init
from mgnns_tpu.parallel.mesh import batch_device_put, create_mesh
from mgnns_tpu.parallel.sharding import mgnns_param_rules

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

V, E, C, L, W, N = 41, 57, 3, 8, 5, 10


class _FakeTextDS:
    def __init__(self, n=N, seed=0):
        from types import SimpleNamespace

        r = np.random.default_rng(seed)
        lens = r.integers(2, L + 1, (n,)).astype(np.int32)
        ids = (r.integers(1, V, (n, L)) *
               (np.arange(L)[None] < lens[:, None])).astype(np.int32)
        mask = (np.arange(L)[None] < lens[:, None]).astype(np.float32)
        eids = r.integers(0, E, (n, L, W)).astype(np.int32)
        self.text = SimpleNamespace(ids=ids, lens=lens, mask=mask, eids=eids)
        self.labels = r.integers(0, C, (n,)).astype(np.int32)

    def __len__(self):
        return len(self.labels)

    def cacheable_images(self):
        return True


def _apply_fn(p, bs, batch, *, train, rng):
    return text_model_apply(p, batch, ngram=2, train=train, rng=rng,
                            dropout_rate=0.0), bs


def _engine(mesh=None, ds=None, B=4):
    params = text_model_init(jax.random.key(0), V, C, E)
    rules = mgnns_param_rules() if mesh is not None else None
    return Engine(_apply_fn, params, {}, num_classes=C, lr=5e-2,
                  steps_per_epoch=max(1, (len(ds) + B - 1) // B),
                  epoch_step=(1000,), mesh=mesh, param_sharding_rules=rules)


def _loader(ds, mesh, B=4, shuffle=False):
    kw = {}
    if mesh is not None:
        kw = dict(mesh=mesh, device_put=lambda b: batch_device_put(b, mesh))
    return DeviceLoader(ds, B, with_images=False, shuffle=shuffle,
                        device_text=True, **kw)


@pytest.mark.parametrize("shape,B", [((4, 2), 4), ((8, 1), 8), ((2, 4), 4)])
def test_sharded_fused_eval_matches_single_device(shape, B):
    """Fused eval epoch on a mesh: confusion matrix, loss, and per-sample
    predictions must equal the single-device fused epoch (epoch metrics are
    batch-composition-invariant; per-sample logits are deterministic)."""
    ds = _FakeTextDS()
    single = _engine(ds=ds, B=B).eval_epoch(_loader(ds, None, B=B),
                                            collect_preds=True)
    assert single.get("fused") is True

    mesh = create_mesh(*shape)
    sharded_eng = _engine(mesh=mesh, ds=ds, B=B)
    sharded = sharded_eng.eval_epoch(_loader(ds, mesh, B=B), collect_preds=True)
    assert sharded.get("fused") is True

    np.testing.assert_array_equal(single["confusion"], sharded["confusion"])
    assert sharded["loss"] == pytest.approx(single["loss"], rel=1e-5)
    assert sharded["accuracy"] == single["accuracy"]
    # per-sample predictions: same samples, same predictions (order differs)
    a = dict(zip(single["sample_index"].tolist(), single["preds"].tolist()))
    b = dict(zip(sharded["sample_index"].tolist(), sharded["preds"].tolist()))
    assert a == b and len(a) == N


def test_model_parallel_fused_train_matches_single_device():
    """data=1/model=8 mesh: batch composition is IDENTICAL to single-device,
    so the whole fused training trajectory (losses, metrics, updated params)
    must match — this is the model-axis numerics parity check (padded gather
    tables, column/row-parallel rules) the round-3 verdict called for."""
    ds = _FakeTextDS()
    mesh = create_mesh(data=1, model=8)
    ref_eng, sh_eng = _engine(ds=ds), _engine(mesh=mesh, ds=ds)
    ref_ld, sh_ld = _loader(ds, None, shuffle=True), _loader(ds, mesh, shuffle=True)
    for _ in range(2):
        tr_ref = ref_eng.train_epoch(ref_ld)
        tr_sh = sh_eng.train_epoch(sh_ld)
        assert tr_sh.get("fused") is True
        assert tr_sh["accuracy"] == tr_ref["accuracy"]
        assert tr_sh["loss"] == pytest.approx(tr_ref["loss"], rel=1e-5)
    ref_p = ref_eng.state.params
    sh_p = sh_eng.state.params
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_p)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(sh_p)[0]:
        want = np.asarray(flat_ref[path])
        got = np.asarray(leaf)[tuple(slice(0, s) for s in want.shape)]  # unpad
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6,
                                   err_msg=str(path))


def test_sharded_fused_train_runs_on_data_parallel_mesh():
    """data=4/model=2: shuffled fused training under the mesh — deterministic
    across identical runs, every sample counted once, params move."""
    ds = _FakeTextDS(n=13)  # odd on purpose: padded tail positions
    mesh = create_mesh(data=4, model=2)

    def run():
        eng = _engine(mesh=mesh, ds=ds)
        ld = _loader(ds, mesh, shuffle=True)
        outs = [eng.train_epoch(ld) for _ in range(2)]
        return outs, jax.tree_util.tree_map(np.asarray, eng.state.params)

    (outs1, p1), (outs2, p2) = run(), run()
    for o1, o2 in zip(outs1, outs2):
        assert o1.get("fused") is True
        assert o1["loss"] == o2["loss"] and o1["accuracy"] == o2["accuracy"]
        assert np.isfinite(o1["loss"]) and o1["skipped_steps"] == 0
    assert outs1[0]["loss"] != outs1[1]["loss"]  # training actually moved
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    # every real sample (and only them) entered the epoch metrics
    ev = _engine(mesh=mesh, ds=ds).eval_epoch(_loader(ds, mesh))
    assert int(np.asarray(ev["confusion"]).sum()) == 13


def test_presliced_dataset_reports_real_sample_count():
    """A single-process loader over a PRE-SLICED dataset (global_len larger
    than the local slice) must account only the samples it processes —
    n_samples/samples_per_sec come from the plan's position_valid, not the
    global split size (regression: 2x-inflated throughput)."""
    ds = _FakeTextDS(n=6)
    ds.global_len = 12  # pretend this is half of a larger split
    mesh = create_mesh(data=2, model=1)
    plan = _loader(ds, mesh, B=2).epoch_plan()
    assert plan["n_samples"] == 6
    ev = _engine(mesh=mesh, ds=ds, B=2).eval_epoch(_loader(ds, mesh, B=2))
    assert int(np.asarray(ev["confusion"]).sum()) == 6


def test_mesh_engine_rejects_default_device_plan():
    """A default-device epoch plan must NOT feed a mesh engine's fused path —
    the engine falls back to streaming and rewinds the consumed epoch."""
    ds = _FakeTextDS()
    mesh = create_mesh(data=4, model=2)
    eng = _engine(mesh=mesh, ds=ds)
    ld = _loader(ds, None)  # tables on the default device, no mesh
    assert eng._epoch_plan(ld) is None
    assert ld.epoch == 0  # the consumed epoch was given back

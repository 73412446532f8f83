"""Engine tests: metrics vs sklearn, optimizer groups, end-to-end overfit,
checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgnns_tpu.engine import metrics as M
from mgnns_tpu.engine.optim import make_optimizer, label_params
from mgnns_tpu.engine.train import Engine, cross_entropy
from mgnns_tpu.graphs import build_vocab, cal_pmi
from mgnns_tpu.graphs.pmi import doc_window_edge_ids
from mgnns_tpu.graphs.vocab import make_word_to_id, words_to_ids
from mgnns_tpu.models import text_model_init, text_model_apply


def test_metrics_match_sklearn(rng):
    from sklearn.metrics import accuracy_score, f1_score

    y_true = rng.integers(0, 5, 200)
    y_pred = rng.integers(0, 5, 200)
    cm = M.confusion_init(5)
    cm = M.confusion_update(cm, jnp.asarray(y_pred), jnp.asarray(y_true))
    out = M.metrics_from_confusion(cm)
    assert out["accuracy"] == pytest.approx(accuracy_score(y_true, y_pred))
    assert out["micro_f1"] == pytest.approx(f1_score(y_true, y_pred, average="micro"))
    assert out["macro_f1"] == pytest.approx(f1_score(y_true, y_pred, average="macro"))
    assert out["weighted_f1"] == pytest.approx(f1_score(y_true, y_pred, average="weighted"))


def test_metrics_weights_mask_padding(rng):
    y_true = jnp.asarray([0, 1, 2, 0])
    y_pred = jnp.asarray([0, 1, 0, 2])
    w = jnp.asarray([1, 1, 1, 0])
    cm = M.confusion_update(M.confusion_init(3), y_pred, y_true, w)
    assert int(np.asarray(cm).sum()) == 3
    assert M.metrics_from_confusion(cm)["accuracy"] == pytest.approx(2 / 3)


def test_classification_report_runs(rng):
    cm = np.array([[5, 1], [2, 7]])
    rep = M.classification_report(cm, ["neg", "pos"])
    assert "precision" in rep and "neg" in rep and "weighted avg" in rep


def _toy_params():
    return {
        "text_gcn": {"node_embedding": jnp.ones((4, 3)), "edge_weight": jnp.ones((5, 1))},
        "lstm": {"w": jnp.ones((2, 2))},
        "object_trunk": {"w": jnp.ones((2,))},
        "place_trunk": {"w": jnp.ones((2,))},
        "gc1": {"w": jnp.ones((2,))},
        "multi_linear_1": {"w": jnp.ones((2,))},
        "object_A": jnp.ones((2, 2)),
    }


def test_label_params_groups():
    p = _toy_params()
    lbl = label_params(p, faithful=False)
    assert lbl["text_gcn"]["node_embedding"] == "text"
    assert lbl["lstm"]["w"] == "lstm"
    assert lbl["object_trunk"]["w"] == "trunk"
    assert lbl["gc1"]["w"] == "base"
    assert lbl["multi_linear_1"]["w"] == "base"
    assert lbl["object_A"] == "frozen"
    lbl_f = label_params(p, faithful=True)
    assert lbl_f["multi_linear_1"]["w"] == "frozen"  # unlisted in get_config_optim


def test_optimizer_group_multipliers():
    p = _toy_params()
    tx = make_optimizer(p, lr=1e-2, lrp=0.1, weight_decay=0.0, grad_clip=1e9,
                        steps_per_epoch=10, epoch_step=(100,), faithful=False)
    opt_state = tx.init(p)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = tx.update(g, opt_state, p)
    # after one Adam step with unit grads, |update| = lr * multiplier (approx)
    base = float(np.abs(np.asarray(updates["gc1"]["w"])).mean())
    text = float(np.abs(np.asarray(updates["text_gcn"]["node_embedding"])).mean())
    trunk = float(np.abs(np.asarray(updates["object_trunk"]["w"])).mean())
    frozen = float(np.abs(np.asarray(updates["object_A"])).mean())
    assert text == pytest.approx(10 * base, rel=1e-4)
    assert trunk == pytest.approx(0.1 * base, rel=1e-4)
    assert frozen == 0.0


def test_lr_schedule_decay():
    p = _toy_params()
    tx = make_optimizer(p, lr=1e-2, weight_decay=0.0, grad_clip=1e9,
                        steps_per_epoch=2, epoch_step=(1,), lr_decay=0.2)
    s = tx.init(p)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    u0, s = tx.update(g, s, p)   # step 0, epoch 0
    u1, s = tx.update(g, s, p)   # step 1, epoch 0
    u2, s = tx.update(g, s, p)   # step 2, epoch 1 -> decayed
    a0 = float(np.abs(np.asarray(u0["gc1"]["w"])).mean())
    a2 = float(np.abs(np.asarray(u2["gc1"]["w"])).mean())
    assert a2 == pytest.approx(0.2 * a0, rel=1e-3)


CORPUS = [
    ("happy joy smile great day", 0),
    ("sad cry tears bad day", 1),
    ("joy smile happy fun", 0),
    ("cry bad sad terrible", 1),
    ("great fun smile joy", 0),
    ("terrible tears bad cry", 1),
]


def _text_batches(batch_size=3, L=8, ngram=2):
    texts = [t for t, _ in CORPUS]
    labels = np.array([l for _, l in CORPUS], np.int32)
    vocab = build_vocab(texts, 1)
    graph = cal_pmi(texts, vocab, 3, 1, max_len=L)
    w2i = make_word_to_id(vocab)
    ids = np.zeros((len(texts), L), np.int32)
    lens = np.zeros((len(texts),), np.int32)
    for n, t in enumerate(texts):
        toks = words_to_ids(t.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    eids = doc_window_edge_ids(ids, lens, ngram, graph)

    def loader():
        for i in range(0, len(texts), batch_size):
            sl = slice(i, i + batch_size)
            yield {
                "ids": jnp.asarray(ids[sl]),
                "lens": jnp.asarray(lens[sl]),
                "eids": jnp.asarray(eids[sl]),
                "label": jnp.asarray(labels[sl]),
                "weight": jnp.ones((min(batch_size, len(texts) - i),), jnp.float32),
                "sample_index": jnp.arange(i, min(i + batch_size, len(texts))),
            }

    return vocab, graph, loader


def _make_engine(tmp_path=None, **kw):
    vocab, graph, loader = _text_batches()
    params = text_model_init(jax.random.key(0), len(vocab), 2, graph.num_edges)

    def apply_fn(p, bs, batch, *, train, rng):
        logits = text_model_apply(p, batch, ngram=2, train=train, rng=rng,
                                  dropout_rate=0.0)
        return logits, bs

    eng = Engine(
        apply_fn, params, {}, num_classes=2, lr=5e-2, steps_per_epoch=2,
        epoch_step=(1000,),
        checkpoint_dir=str(tmp_path) if tmp_path is not None else None, **kw
    )
    return eng, loader


class _FakeTextDS:
    """Minimal TumblrDataset stand-in for DeviceLoader (text-only)."""

    def __init__(self, ids, lens, mask, eids, labels):
        from types import SimpleNamespace

        self.text = SimpleNamespace(ids=ids, lens=lens, mask=mask, eids=eids)
        self.labels = labels

    def __len__(self):
        return len(self.labels)

    def cacheable_images(self):
        return True


def _fused_fixture(L=8, ngram=2):
    from mgnns_tpu.data.loader import DeviceLoader

    texts = [t for t, _ in CORPUS]
    labels = np.array([l for _, l in CORPUS], np.int32)
    vocab = build_vocab(texts, 1)
    graph = cal_pmi(texts, vocab, 3, 1, max_len=L)
    w2i = make_word_to_id(vocab)
    ids = np.zeros((len(texts), L), np.int32)
    lens = np.zeros((len(texts),), np.int32)
    for n, t in enumerate(texts):
        toks = words_to_ids(t.split(" "), w2i)
        ids[n, : len(toks)] = toks
        lens[n] = len(toks)
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    eids = doc_window_edge_ids(ids, lens, ngram, graph)
    ds = _FakeTextDS(ids, lens, mask, eids, labels)

    def engine():
        params = text_model_init(jax.random.key(0), len(vocab), 2, graph.num_edges)

        def apply_fn(p, bs, batch, *, train, rng):
            logits = text_model_apply(p, batch, ngram=2, train=train, rng=rng,
                                      dropout_rate=0.0)
            return logits, bs

        return Engine(apply_fn, params, {}, num_classes=2, lr=5e-2,
                      steps_per_epoch=2, epoch_step=(1000,))

    def loader(**kw):
        return DeviceLoader(ds, 3, with_images=False, **kw)

    return engine, loader


def test_fused_epoch_matches_loop():
    """A device_text loader hands the engine an epoch plan; the fused
    lax.scan epoch must produce the same training trajectory, metrics, and
    collected predictions as per-batch iteration."""
    engine, loader = _fused_fixture()
    loop_eng, fused_eng = engine(), engine()
    loop_ld = loader()
    fused_ld = loader(device_text=True)
    assert fused_ld.epoch_plan() is not None  # precondition; advances epoch
    for _ in range(3):
        tr_loop = loop_eng.train_epoch(loop_ld)
        tr_fused = fused_eng.train_epoch(fused_ld)
        assert tr_fused.get("fused") is True and "fused" not in tr_loop
        assert tr_fused["accuracy"] == tr_loop["accuracy"]
        assert tr_fused["loss"] == pytest.approx(tr_loop["loss"], rel=1e-5)
        assert tr_fused["skipped_steps"] == tr_loop["skipped_steps"] == 0
    for a, b in zip(jax.tree_util.tree_leaves(loop_eng.state.params),
                    jax.tree_util.tree_leaves(fused_eng.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    ev_loop = loop_eng.eval_epoch(loop_ld, collect_preds=True)
    ev_fused = fused_eng.eval_epoch(fused_ld, collect_preds=True)
    assert ev_fused.get("fused") is True
    assert ev_fused["accuracy"] == ev_loop["accuracy"]
    assert ev_fused["loss"] == pytest.approx(ev_loop["loss"], rel=1e-5)
    np.testing.assert_array_equal(ev_fused["preds"], ev_loop["preds"])
    np.testing.assert_array_equal(ev_fused["targets"], ev_loop["targets"])
    np.testing.assert_array_equal(ev_fused["sample_index"],
                                  ev_loop["sample_index"])
    np.testing.assert_array_equal(ev_fused["confusion"], ev_loop["confusion"])


def test_fused_epoch_shuffled_and_forced_length():
    """Fused epochs respect shuffling (different index plan per epoch) and
    forced epoch lengths (all-padding batches carry zero weight)."""
    engine, loader = _fused_fixture()
    ld = loader(device_text=True, shuffle=True, num_batches=4)
    p1, p2 = ld.epoch_plan(), ld.epoch_plan()
    assert p1["idx"].shape == (4, 3) and p1["weight"].shape == (4, 3)
    assert p1["weight"].sum() == p2["weight"].sum() == 6
    assert (p1["weight"][-1] == 0).all()
    assert not np.array_equal(p1["idx"][:2], p2["idx"][:2])  # reshuffled
    eng = engine()
    out = eng.train_epoch(ld)
    assert out.get("fused") is True and out["skipped_steps"] == 0
    # streaming loaders (no tables) never produce a plan
    assert loader().epoch_plan() is None


def test_fused_epoch_with_flat_image_table_matches_loop():
    """device_images stores pixels FLATTENED as [N, H*W*3] (avoiding XLA's
    whole-table layout copy — see data/loader._take_rows); the fused-epoch
    gather must restore the logical [B, H, W, 3] rows via the plan's
    row_shapes and match the per-batch loop path exactly."""
    engine, loader = _fused_fixture()

    H = W = 4

    class _ImgDS(_FakeTextDS):
        def load_image(self, i, rng=None):
            base = np.full((H, W, 3), i % 7, np.uint8)
            base[0, 0, 0] = i  # row identity: gather order is checkable
            return base

    def imgloader(**kw):
        from mgnns_tpu.data.loader import DeviceLoader

        base = loader()  # reuse the text fixture's dataset
        ds = _ImgDS(base.ds.text.ids, base.ds.text.lens, base.ds.text.mask,
                    base.ds.text.eids, base.ds.labels)
        return DeviceLoader(ds, 3, with_images=True, **kw)

    def imgengine():
        base = engine()  # only for its init params / config

        def apply_fn(p, bs, batch, *, train, rng):
            img = batch["image"]
            assert img.shape[1:] == (H, W, 3)  # logical shape restored
            logits, bs = base.apply_fn(p, bs, batch, train=train, rng=rng)
            # fold a per-sample image statistic in so pixels affect loss,
            # preds, and gradients — gather bugs can't hide
            bump = jnp.mean(img.astype(jnp.float32), axis=(1, 2, 3)) / 255.0
            return logits + bump[:, None], bs

        return Engine(apply_fn, base.state.params, {}, num_classes=2,
                      lr=5e-2, steps_per_epoch=2, epoch_step=(1000,))

    fused_ld = imgloader(device_text=True, device_images=True)
    loop_ld = imgloader()
    plan = fused_ld.epoch_plan()
    assert plan is not None and "image" in plan["row_shapes"]
    assert plan["tables"]["image"].ndim == 2  # stored flat
    assert tuple(plan["row_shapes"]["image"]) == (H, W, 3)

    fused_eng, loop_eng = imgengine(), imgengine()
    tr_fused = fused_eng.train_epoch(fused_ld)
    tr_loop = loop_eng.train_epoch(loop_ld)
    assert tr_fused.get("fused") is True and "fused" not in tr_loop
    assert tr_fused["loss"] == pytest.approx(tr_loop["loss"], rel=1e-5)
    assert tr_fused["accuracy"] == tr_loop["accuracy"]
    for a, b in zip(jax.tree_util.tree_leaves(fused_eng.state.params),
                    jax.tree_util.tree_leaves(loop_eng.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    ev_fused = fused_eng.eval_epoch(fused_ld, collect_preds=True)
    ev_loop = loop_eng.eval_epoch(loop_ld, collect_preds=True)
    assert ev_fused.get("fused") is True
    np.testing.assert_array_equal(ev_fused["preds"], ev_loop["preds"])
    np.testing.assert_array_equal(ev_fused["confusion"], ev_loop["confusion"])


def test_fused_compile_failure_falls_back_to_loop(monkeypatch):
    """If the fused whole-epoch program fails to compile (e.g. tables +
    step workspace exceed HBM), the engine must fall back to per-batch
    execution — once, permanently, without corrupting state."""
    engine, loader = _fused_fixture()
    eng = engine()

    class _BoomLowered:
        def compile(self):
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    class _BoomJit:
        def lower(self, *a, **k):
            return _BoomLowered()

    monkeypatch.setattr(eng, "_get_fused",
                        lambda plan: ((), (_BoomJit(), _BoomJit())))
    ld = loader(device_text=True)
    out = eng.train_epoch(ld)
    assert out.get("fused") is None and out["skipped_steps"] == 0
    assert eng._fused_disabled
    ev = eng.eval_epoch(ld, collect_preds=True)
    assert ev.get("fused") is None and len(ev["preds"]) == 6
    # reference trajectory: a clean loop-path engine sees the same numbers
    ref = engine()
    ld2 = loader()
    r1 = ref.train_epoch(ld2)
    assert r1["loss"] == pytest.approx(out["loss"], rel=1e-5)


def test_fused_segmented_epoch_matches_loop():
    """K-segment fused epochs (an epoch as K scan programs instead of one —
    the HBM-tight fallback rung before per-batch dispatch) must reproduce
    the loop path exactly: same losses, metrics, params, and collected
    predictions, including forced-length all-padding tail batches."""
    engine, loader = _fused_fixture()
    loop_eng, seg_eng = engine(), engine()
    seg_eng._fused_segments = 2
    loop_ld = loader(num_batches=4)
    seg_ld = loader(device_text=True, num_batches=4)
    for _ in range(2):
        tr_loop = loop_eng.train_epoch(loop_ld)
        tr_seg = seg_eng.train_epoch(seg_ld)
        assert tr_seg.get("fused") is True
        assert tr_seg["accuracy"] == tr_loop["accuracy"]
        assert tr_seg["loss"] == pytest.approx(tr_loop["loss"], rel=1e-5)
    assert seg_eng._fused_segments == 2 and not seg_eng._fused_disabled
    for a, b in zip(jax.tree_util.tree_leaves(loop_eng.state.params),
                    jax.tree_util.tree_leaves(seg_eng.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    ev_loop = loop_eng.eval_epoch(loop_ld, collect_preds=True)
    ev_seg = seg_eng.eval_epoch(seg_ld, collect_preds=True)
    assert ev_seg.get("fused") is True
    assert ev_seg["loss"] == pytest.approx(ev_loop["loss"], rel=1e-5)
    np.testing.assert_array_equal(ev_seg["preds"], ev_loop["preds"])
    np.testing.assert_array_equal(ev_seg["targets"], ev_loop["targets"])
    np.testing.assert_array_equal(ev_seg["confusion"], ev_loop["confusion"])


def test_fused_compile_failure_escalates_to_segments(monkeypatch):
    """When the whole-epoch program fails to compile, the engine escalates
    to 4 fused segments (and only then to per-batch dispatch), with the
    segmented epoch's numbers identical to the loop path's."""
    engine, loader = _fused_fixture()
    eng, ref = engine(), engine()
    orig = eng._fused_exe

    def oom_at_full_length(name, jit_fn, args, out):
        if args[-1].shape[0] == 8:  # the whole-epoch program "OOMs"
            return None
        return orig(name, jit_fn, args, out)

    monkeypatch.setattr(eng, "_fused_exe", oom_at_full_length)
    ld = loader(device_text=True, num_batches=8)
    out = eng.train_epoch(ld)
    assert out.get("fused") is True and out["skipped_steps"] == 0
    assert eng._fused_segments == 4 and not eng._fused_disabled
    r = ref.train_epoch(loader(num_batches=8))
    assert out["loss"] == pytest.approx(r["loss"], rel=1e-5)
    assert out["accuracy"] == r["accuracy"]
    for a, b in zip(jax.tree_util.tree_leaves(eng.state.params),
                    jax.tree_util.tree_leaves(ref.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # eval inherits the escalated segment count and still collects preds
    ev = eng.eval_epoch(ld, collect_preds=True)
    ev_ref = ref.eval_epoch(loader(num_batches=8), collect_preds=True)
    assert ev.get("fused") is True
    np.testing.assert_array_equal(ev["preds"], ev_ref["preds"])
    np.testing.assert_array_equal(ev["confusion"], ev_ref["confusion"])


def test_fused_segments_cap_at_short_epochs():
    """A sticky escalated segment count (e.g. train escalated to 4 on an
    HBM-tight compile) must NOT disable fusion for a shorter epoch (a small
    val split): the count caps at the epoch's batch count and the fused
    path still runs (regression: returning None here disabled the fused
    path engine-wide before any compile was attempted)."""
    engine, loader = _fused_fixture()
    eng, ref = engine(), engine()
    eng._fused_segments = 4
    ld = loader(device_text=True)  # 6 samples / batch 3 -> nb=2 < K=4
    out = eng.eval_epoch(ld, collect_preds=True)
    assert out.get("fused") is True and not eng._fused_disabled
    assert out["epoch_seconds"] >= 0  # compile time must not be
    # double-subtracted (it is excluded from t0 AND reported separately)
    assert out["samples_per_sec"] > 0
    r = ref.eval_epoch(loader(), collect_preds=True)
    np.testing.assert_array_equal(out["preds"], r["preds"])
    np.testing.assert_array_equal(out["confusion"], r["confusion"])


def test_fused_memory_guard_escalates_then_runs(monkeypatch):
    """A compiled program whose ANALYZED memory exceeds the device budget
    must not run (compile success alone is not a safe gate — an over-budget
    run can hard-crash the TPU worker); 'retry' escalates the ladder and
    the segmented epoch still matches the loop path."""
    engine, loader = _fused_fixture()
    eng, ref = engine(), engine()
    verdicts = iter(["retry"])  # first fresh compile over budget, rest ok
    monkeypatch.setattr(eng, "_fused_fits",
                        lambda exe: next(verdicts, "ok"))
    ld = loader(device_text=True, num_batches=8)
    out = eng.train_epoch(ld)
    assert out.get("fused") is True
    assert eng._fused_segments == 4 and not eng._fused_disabled
    r = ref.train_epoch(loader(num_batches=8))
    assert out["loss"] == pytest.approx(r["loss"], rel=1e-5)


def test_fused_memory_guard_hopeless_streams(monkeypatch):
    """'hopeless' (argument/output buffers alone exceed the budget — no
    segment count can shrink tables or the train-state carry) must skip the
    ladder entirely and fall back to per-batch execution."""
    engine, loader = _fused_fixture()
    eng, ref = engine(), engine()
    monkeypatch.setattr(eng, "_fused_fits", lambda exe: "hopeless")
    ld = loader(device_text=True)
    out = eng.train_epoch(ld)
    assert out.get("fused") is None and eng._fused_disabled
    r = ref.train_epoch(loader())
    assert out["loss"] == pytest.approx(r["loss"], rel=1e-5)


def test_engine_overfits_toy_corpus():
    eng, loader = _make_engine()
    first = eng.train_epoch(loader())
    for _ in range(30):
        last = eng.train_epoch(loader())
    assert last["loss"] < first["loss"]
    assert last["accuracy"] == 1.0
    ev = eng.eval_epoch(loader(), collect_preds=True)
    assert ev["accuracy"] == 1.0
    assert len(ev["preds"]) == 6
    np.testing.assert_array_equal(ev["sample_index"], np.arange(6))
    # steady-state throughput (post-compile) is reported alongside the
    # epoch average whenever the epoch has >1 batch
    assert last["steady_samples_per_sec"] > 0
    assert ev["steady_samples_per_sec"] > 0


def test_engine_checkpoint_roundtrip(tmp_path):
    eng, loader = _make_engine(tmp_path / "ckpt")
    for _ in range(3):
        eng.train_epoch(loader())
    eng.epoch = 2
    eng.best_score = 0.75
    eng.save(metrics={"val_accuracy": 0.75})
    step_before = int(eng.state.step)
    params_before = jax.tree_util.tree_map(np.asarray, eng.state.params)

    eng2, _ = _make_engine(tmp_path / "ckpt")
    eng2.restore()
    assert int(eng2.state.step) == step_before
    assert eng2.epoch == 3  # resumes at next epoch
    assert eng2.best_score == pytest.approx(0.75)
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(eng2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_learning_loop_and_result_files(tmp_path):
    eng, loader = _make_engine(tmp_path / "ckpt")
    res = eng.learning(
        loader, loader, loader,
        max_epochs=3,
        result_paths={
            "experiment": str(tmp_path / "exp" / "result.txt"),
            "pred": str(tmp_path / "pred" / "pred.txt"),
            "label_names": ["pos", "neg"],
        },
        run_config={"lr": 5e-2},
    )
    assert len(res["history"]) == 3
    assert "test" in res
    exp = (tmp_path / "exp" / "result.txt").read_text()
    assert "acc:" in exp and "weighted avg" in exp
    pred = (tmp_path / "pred" / "pred.txt").read_text().strip().split("\n")
    assert pred[0] == "ID\tTarget\tPred" and len(pred) == 7


def test_cross_entropy_weighted():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [10.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    w_all = jnp.asarray([1.0, 1.0, 1.0])
    w_mask = jnp.asarray([1.0, 1.0, 0.0])
    assert float(cross_entropy(logits, labels, w_mask)) < 1e-3
    assert float(cross_entropy(logits, labels, w_all)) > 1.0


def test_nan_guard_skips_bad_update():
    """A batch that produces a non-finite loss must not change params."""
    import jax.numpy as jnp
    from mgnns_tpu.engine import metrics as M

    params = {"gc1": {"w": jnp.ones((3,))}}

    def apply_fn(p, bs, batch, *, train, rng):
        # logits scale with params; 'poison' batches inject inf
        logits = jnp.stack([p["gc1"]["w"].sum() + batch["poison"], 0.0 * batch["poison"]], -1)
        return logits[None, :], bs

    eng = Engine(apply_fn, params, {}, num_classes=2, lr=1e-1, steps_per_epoch=1)
    good = {"poison": jnp.asarray(0.0), "label": jnp.asarray([0]),
            "weight": jnp.ones((1,), jnp.float32)}
    bad = {"poison": jnp.asarray(jnp.inf), "label": jnp.asarray([0]),
           "weight": jnp.ones((1,), jnp.float32)}
    cm = M.confusion_init(2)
    w0 = np.asarray(eng.state.params["gc1"]["w"]).copy()
    eng.state, loss, cm = eng._train_step(eng.state, bad, cm)
    assert not np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(eng.state.params["gc1"]["w"]), w0)
    # the skipped step must not have polluted the confusion matrix either
    assert int(np.asarray(cm).sum()) == 0
    # good batch still updates
    eng.state, loss, cm = eng._train_step(eng.state, good, cm)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(eng.state.params["gc1"]["w"]), w0)
    assert int(np.asarray(cm).sum()) == 1


def test_eval_loss_weighted_by_batch_size():
    """eval_epoch's epoch loss must weight batch means by valid-sample count
    (a short trailing batch must not be over-counted)."""
    import jax.numpy as jnp

    def apply_fn(p, bs, batch, *, train, rng):
        # per-sample loss == z via logits [z, 0] and label 1:
        # CE = log(1 + e^z) ~ z for large z; use exact construction instead:
        B = batch["label"].shape[0]
        logits = jnp.stack([batch["z"], jnp.zeros_like(batch["z"])], -1)
        return logits, bs

    params = {"w": jnp.ones((1,))}
    eng = Engine(apply_fn, params, {}, num_classes=2, steps_per_epoch=1)
    # batch 1: 4 valid samples, z=0 -> loss ln2; batch 2: 1 valid sample
    # (3 pad rows), z=0 -> loss ln2.  Weighted or not, mean = ln2; now make
    # batch 2 differ: z big -> CE(label=1) = ln(1+e^z) ≈ z.
    b1 = {"z": jnp.zeros((4,)), "label": jnp.ones((4,), jnp.int32),
          "weight": jnp.ones((4,), jnp.float32)}
    b2 = {"z": jnp.full((4,), 10.0), "label": jnp.ones((4,), jnp.int32),
          "weight": jnp.array([1, 0, 0, 0], jnp.float32)}
    out = eng.eval_epoch([b1, b2])
    ln2 = float(np.log(2.0))
    expected = (4 * ln2 + 1 * float(np.log1p(np.exp(10.0)))) / 5
    assert abs(out["loss"] - expected) < 1e-4


def test_faithful_groups_freeze_unlisted_end_to_end():
    """faithful_param_groups=True: the text-model head (unlisted in the
    reference's get_config_optim) must stay frozen while text_gcn trains."""
    eng, loader = _make_engine(faithful_param_groups=True)
    head0 = np.asarray(eng.state.params["head"]["w"]).copy()
    emb0 = np.asarray(eng.state.params["text_gcn"]["node_embedding"]).copy()
    for _ in range(3):
        eng.train_epoch(loader())
    np.testing.assert_array_equal(np.asarray(eng.state.params["head"]["w"]), head0)
    assert not np.allclose(np.asarray(eng.state.params["text_gcn"]["node_embedding"]), emb0)


def test_checkpoint_retention_keeps_best_and_latest(tmp_path):
    """The best-by-val-accuracy checkpoint must survive pruning, and
    latest_step() must track the newest save (resume must not roll back)."""
    from mgnns_tpu.engine.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "ck"), max_to_keep=2)
    state = {"w": jnp.ones((3,))}
    scores = {1: 0.2, 2: 0.9, 3: 0.5, 4: 0.4, 5: 0.3}  # best at step 2
    for step, s in scores.items():
        ck.save(step, state, metrics={"val_accuracy": s})
    assert ck.latest_step() == 5            # resume continues from the newest
    assert ck.best_step() == 2              # best survives...
    kept = sorted(ck._mgr.all_steps())
    assert 2 in kept and 5 in kept and 4 in kept
    assert len(kept) == 3                   # best + latest 2
    restored = ck.restore(2, {"w": jnp.zeros((3,))})
    np.testing.assert_array_equal(np.asarray(restored["w"]), 1.0)


def test_metrics_jsonl_logging(tmp_path):
    """learning(metrics_path=...) appends one parseable JSON line per epoch."""
    import json

    eng, loader = _make_engine()
    path = str(tmp_path / "m" / "metrics.jsonl")
    eng.learning(loader, loader, max_epochs=2, metrics_path=path)
    rows = [json.loads(l) for l in open(path)]
    assert [r["epoch"] for r in rows] == [0, 1]
    for r in rows:
        assert {"loss", "accuracy", "macro_f1"} <= set(r["train"])
        assert np.isfinite(r["val"]["accuracy"])


def test_epoch_plan_rewind_replays_same_order():
    """rewind_epoch un-consumes a discarded epoch_plan: the next plan (or
    streaming epoch) replays the same shuffle order."""
    _, loader = _fused_fixture()
    ld = loader(device_text=True, shuffle=True)
    p1 = ld.epoch_plan()
    ld.rewind_epoch()
    p2 = ld.epoch_plan()
    np.testing.assert_array_equal(p1["idx"], p2["idx"])
    p3 = ld.epoch_plan()  # un-rewound: a fresh epoch reshuffles
    assert not np.array_equal(p1["idx"], p3["idx"])


def test_fused_compile_failure_fallback_keeps_shuffle_order(monkeypatch):
    """When the fused epoch program fails to compile, the streaming fallback
    must replay the SAME shuffle order the discarded plan consumed
    (regression: the plan advanced the loader's epoch counter and the
    fallback advanced it again, offsetting every epoch's order by one vs a
    run that never attempted fusion — breaking seed determinism)."""
    engine, loader = _fused_fixture()
    ref_eng, fail_eng = engine(), engine()
    ref_ld = loader(shuffle=True, seed=7)
    fail_ld = loader(device_text=True, shuffle=True, seed=7)
    # every fused compile "fails"; the engine must fall back cleanly
    monkeypatch.setattr(Engine, "_fused_exe",
                        lambda self, sig, fn, args, pre: None)
    for _ in range(2):
        a = ref_eng.train_epoch(ref_ld)
        b = fail_eng.train_epoch(fail_ld)
        assert "fused" not in b  # fell back to the loop path
        assert b["accuracy"] == a["accuracy"]
        assert b["loss"] == pytest.approx(a["loss"], rel=1e-5)
    # shuffle order changes batch composition, so the sequential-update
    # trajectories only match if both runs saw the same order every epoch
    for x, y in zip(jax.tree_util.tree_leaves(ref_eng.state.params),
                    jax.tree_util.tree_leaves(fail_eng.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_engine_eval_only_skips_optimizer_state():
    """eval_only engines never allocate Adam moments (2 extra param copies
    in HBM that eval never reads) and refuse to train."""
    def apply_fn(p, bs, batch, *, train, rng):
        return batch["x"] @ p["w"], bs

    params = {"w": jnp.ones((3, 2), jnp.float32)}
    eng = Engine(apply_fn, params, {}, num_classes=2, eval_only=True)
    assert eng.state.opt_state is None
    batch = {"x": np.ones((4, 3), np.float32),
             "label": np.zeros((4,), np.int32),
             "weight": np.ones((4,), np.float32)}
    out = eng.eval_epoch([batch])
    assert np.isfinite(out["loss"])
    with pytest.raises(RuntimeError, match="eval_only"):
        eng.train_epoch([batch])

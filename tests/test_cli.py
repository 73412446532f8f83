"""CLI smoke tests (text-only path; CPU)."""

import json
import os

import numpy as np
import pytest

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference data unavailable")


def test_cli_text_only_end_to_end(tmp_path):
    from mgnns_tpu.cli.main import main

    res = main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
        "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "64",
        "--lr", "1e-3", "-e",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    assert len(res["history"]) == 1
    assert "test" in res
    tag = "text_min_count_5_ngram_4_window_6_bts_32.txt"
    assert (tmp_path / "exp" / "mgnns_tpu" / tag).exists()
    pred = (tmp_path / "pred" / "mgnns_tpu" / tag).read_text().strip().split("\n")
    assert pred[0] == "ID\tTarget\tPred" and len(pred) == 65


def test_prepare_adj_and_pmi(tmp_path):
    from mgnns_tpu.cli.prepare import main as prep

    out = tmp_path / "objects_adj.pkl"
    prep(["adj", "--data_root_path", REF, "--splits", "val",
          "--key", "objects", "--num_classes", "80", "--output", str(out)])
    import pickle

    with open(out, "rb") as f:
        result = pickle.load(f)
    assert result["adj"].shape == (80, 80)
    assert (result["nums"] >= 1).all()

    out2 = tmp_path / "pmi.npz"
    prep(["pmi", "--data_root_path", REF, "--phase", "val", "--output", str(out2)])
    from mgnns_tpu.cli.prepare import load_pmi_npz

    g = load_pmi_npz(str(out2))
    assert g.vocab_size == 20154 and g.num_edges > 1000


def test_prepare_pack_glove(tmp_path):
    from mgnns_tpu.cli.prepare import main as prep

    glove = tmp_path / "toy_glove.txt"
    words = ["the"] + [f"w{i}" for i in range(20)]
    rng = np.random.default_rng(0)
    with open(glove, "w") as f:
        for w in words:
            vec = " ".join(f"{v:.4f}" for v in rng.standard_normal(12))
            f.write(f"{w} {vec}\n")
    names = tmp_path / "classes.txt"
    names.write_text("w1\nw2\nunknownword\n")
    out = tmp_path / "classes.pkl"
    prep(["pack-glove", "--glove_txt", str(glove), "--kind", "classes",
          "--class_names", str(names), "--output", str(out)])
    import pickle

    with open(out, "rb") as f:
        mat = pickle.load(f)
    assert mat.shape == (3, 12)


def test_prepare_join_filter_upsample_stats(tmp_path, capsys):
    from mgnns_tpu.cli.prepare import main as prep
    import json as J

    base = tmp_path / "base.json"
    extra = tmp_path / "extra.json"
    with open(base, "w") as f:
        for i in range(6):
            f.write(J.dumps({"id": f"s{i}", "text": "a b c d e f"[: 2 * (i + 1) - 1],
                             "label": "happy" if i % 2 else "sad"}) + "\n")
    with open(extra, "w") as f:
        for i in range(6):
            f.write(J.dumps({"id": f"s{i}", "objects": [i]}) + "\n")

    joined = tmp_path / "joined.json"
    prep(["join", "--base", str(base), "--extra", str(extra), "--output", str(joined)])
    rows = [J.loads(l) for l in open(joined)]
    assert len(rows) == 6 and rows[0]["objects"] == [0]

    filtered = tmp_path / "filtered.json"
    prep(["filter-short", "--input", str(joined), "--output", str(filtered),
          "--min_words", "4"])
    rows_f = [J.loads(l) for l in open(filtered)]
    assert all(len(r["text"].split(" ")) >= 4 for r in rows_f)
    assert 0 < len(rows_f) < 6

    up = tmp_path / "up.json"
    prep(["upsample", "--input", str(joined), "--label", "sad", "--times", "2",
          "--output", str(up)])
    rows_u = [J.loads(l) for l in open(up)]
    assert sum(r["label"] == "sad" for r in rows_u) == 3 * 3  # 3 originals * (1+2)

    prep(["label-stats", "--input", str(joined)])
    out = capsys.readouterr().out
    assert "happy\t3" in out and "sad\t3" in out


def test_cli_glove_embedding_and_pmi_edges(tmp_path, capsys):
    """--emb_type glove loads the packed vocab embedding; --edges_init pmi
    initializes edge weights from PMI values."""
    import pickle
    import shutil

    from mgnns_tpu.cli.main import main

    # stage a writable copy of the data root with a packed embedding
    root = tmp_path / "data"
    (root / "all_anno_json").mkdir(parents=True)
    (root / "vocab").mkdir()
    (root / "glove_embedding").mkdir()
    for f in ("val_all_anno.json",):
        shutil.copy(f"{REF}/all_anno_json/{f}", root / "all_anno_json" / f)
    shutil.copy(f"{REF}/vocab/vocab-5.txt", root / "vocab" / "vocab-5.txt")
    shutil.copy(f"{REF}/label.json", root / "label.json")
    emb = np.random.default_rng(0).standard_normal((20154, 300)).astype(np.float32)
    with open(root / "glove_embedding" / "glove_embedding_5.pkl", "wb") as f:
        pickle.dump(emb, f)

    main([
        "--data_root_path", str(root), "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "val",
        "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "32",
        "--emb_type", "glove", "--edges_init", "pmi",
        "--save_model_path", str(tmp_path / "ckpt"),
    ])
    out = capsys.readouterr().out
    assert "loaded vocab embedding (20154, 300)" in out


@pytest.mark.slow
def test_cli_fusion_end_to_end(tmp_path):
    """The FULL fusion model through the real CLI path (tiny shapes, CPU):
    trunks + image GCNs + label attention + 4-way fusion + engine +
    checkpoints + result dumps, with the round-2 perf flags exercised."""
    from mgnns_tpu.cli.main import main

    res = main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
        "--epochs", "1", "-b", "4", "--limit_samples", "8",
        "--image-size", "64", "--bn_mode", "frozen", "--freeze_trunks",
        "--lr", "1e-3", "-e",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    assert len(res["history"]) == 1
    assert np.isfinite(res["history"][0]["train"]["loss"])
    assert "test" in res
    tag = "text_min_count_5_ngram_4_window_6_bts_4.txt"
    assert (tmp_path / "exp" / "mgnns_tpu" / tag).exists()


def test_cli_mesh_device_text_fused(tmp_path):
    """--device_text + a (4,2) mesh: the SPMD fused-epoch input path through
    the real CLI (round-3 verdict item 1 — no silent fallback to per-batch
    host uploads under a mesh)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mgnns_tpu.cli.main import main

    res = main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
        "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "64",
        "--lr", "1e-3", "-e", "--device_text",
        "--mesh_data", "4", "--mesh_model", "2",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    h = res["history"][0]
    # the fused SPMD epoch actually ran — train AND val
    assert h["train"].get("fused") is True
    assert h["val"].get("fused") is True
    assert np.isfinite(h["train"]["loss"])
    assert len(res["test"]["preds"]) == 64
    tag = "text_min_count_5_ngram_4_window_6_bts_32.txt"
    pred = (tmp_path / "pred" / "mgnns_tpu" / tag).read_text().strip().split("\n")
    assert len(pred) == 65


def test_cli_mesh_device_images_requires_device_text(tmp_path):
    """--device_images under a mesh without --device_text must refuse
    loudly: without text tables there is no fused SPMD plan, so the granted
    pixel tables would silently never be used (pixels would re-ship per
    batch — the exact path the tables exist to avoid)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mgnns_tpu.cli.main import main

    with pytest.raises(SystemExit, match="requires --device_text"):
        main([
            "--data_root_path", REF, "--pmi_phase", "val",
            "--train_phase", "val", "--val_phase", "val",
            "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "64",
            "--device_images", "--mesh_data", "4", "--mesh_model", "2",
            "--save_model_path", str(tmp_path / "ckpt"),
        ])


def test_cli_mesh_batch_divisibility(tmp_path):
    """Batch sizes that don't divide the 'data' axis must refuse with a
    clear message instead of a deep sharding traceback."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mgnns_tpu.cli.main import main

    with pytest.raises(SystemExit, match="must divide by --mesh_data"):
        main([
            "--data_root_path", REF, "--pmi_phase", "val",
            "--train_phase", "val", "--val_phase", "val",
            "--text_only", "--epochs", "1", "-b", "30",
            "--mesh_data", "4", "--mesh_model", "2",
            "--save_model_path", str(tmp_path / "ckpt"),
        ])


def test_cli_eval_batch_size(tmp_path):
    """--eval_batch_size decouples val/test batches from the train batch."""
    from mgnns_tpu.cli.main import main

    res = main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
        "--text_only", "--epochs", "1", "-b", "8", "--eval_batch_size", "64",
        "--limit_samples", "64", "--lr", "1e-3", "-e",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    assert len(res["history"]) == 1 and "test" in res
    assert len(res["test"]["preds"]) == 64


def test_tpu_compile_flags_plumbing(monkeypatch):
    """--perf_preset/--libtpu_init_args set LIBTPU_INIT_ARGS before backend
    init and return a cache salt (the JAX compilation cache key ignores
    libtpu flags, so flagged runs must not share the default cache)."""
    from mgnns_tpu.cli.main import _apply_tpu_compile_flags, build_parser

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    args = build_parser().parse_args(["--perf_preset"])
    salt = _apply_tpu_compile_flags(args)
    assert salt and len(salt) == 10
    assert ("--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
            in os.environ["LIBTPU_INIT_ARGS"])

    # extra flags append (ambient env preserved) and change the salt
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--ambient=1")
    args2 = build_parser().parse_args(
        ["--perf_preset", "--libtpu_init_args=--xla_tpu_foo=2"])
    salt2 = _apply_tpu_compile_flags(args2)
    env = os.environ["LIBTPU_INIT_ARGS"]
    assert env.startswith("--ambient=1") and "--xla_tpu_foo=2" in env
    assert salt2 != salt

    # default: no env write, no salt
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    assert _apply_tpu_compile_flags(build_parser().parse_args([])) is None
    assert "LIBTPU_INIT_ARGS" not in os.environ


def test_use_pallas_flag_tristate():
    """--use_pallas defaults to backend-conditional (None at parse time);
    both override directions parse (round-5: TPU default flipped on)."""
    from mgnns_tpu.cli.main import build_parser

    p = build_parser()
    assert p.parse_args([]).use_pallas is None
    assert p.parse_args(["--use_pallas"]).use_pallas is True
    assert p.parse_args(["--no_use_pallas"]).use_pallas is False

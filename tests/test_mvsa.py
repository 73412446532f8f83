"""MVSA (3-class sentiment) dataset-family support.

The reference supports MVSA-Single/MVSA-Multiple with num_labels=3
(``README.md:6``, ``models/Multi_GCN_Multihead_att.py:566``); the framework
is label-map-driven, so a 3-class dataset needs only its own ``label.json``
and annotations.  This test builds a synthetic MVSA-style tree and trains
the text slice end to end through the CLI.
"""

import json
import os

import numpy as np
import pytest


def _make_mvsa_tree(root):
    os.makedirs(root / "all_anno_json", exist_ok=True)
    os.makedirs(root / "vocab", exist_ok=True)
    (root / "label.json").write_text(json.dumps({"negative": 0, "neutral": 1, "positive": 2}))
    rng = np.random.default_rng(0)
    pos_words = ["good", "great", "happy", "love", "wonderful"]
    neg_words = ["bad", "sad", "awful", "hate", "terrible"]
    neu_words = ["table", "walk", "city", "day", "photo"]
    rows = []
    for i in range(90):
        label = ["negative", "neutral", "positive"][i % 3]
        pool = {"negative": neg_words, "neutral": neu_words, "positive": pos_words}[label]
        words = list(rng.choice(pool, 5)) + list(rng.choice(neu_words, 2))
        rows.append({
            "id": f"mvsa{i}", "text": " ".join(words),
            "image": f"img/{i}.jpg", "label": label,
            "objects": [int(x) for x in rng.integers(0, 8, 3)],
            "places": [int(x) for x in rng.integers(0, 9, 2)],
        })
    for phase in ("train", "val", "test"):
        with open(root / "all_anno_json" / f"{phase}_all_anno.json", "w") as f:
            for rec in rows:
                f.write(json.dumps(rec) + "\n")


def test_mvsa_text_cli_end_to_end(tmp_path):
    from mgnns_tpu.cli.main import main

    _make_mvsa_tree(tmp_path)
    res = main([
        "--data_root_path", str(tmp_path), "--dataset", "MVSA_simple",
        "--num_labels", "3", "--text_min_count", "1",
        "--text_only", "--epochs", "6", "-b", "30", "--lr", "5e-2", "-e",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    # separable synthetic vocabulary must be learned
    assert res["best_val_accuracy"] > 0.8
    assert res["test"]["accuracy"] > 0.8
    exp_dir = tmp_path / "exp" / "mgnns_tpu"
    report = next(exp_dir.iterdir()).read_text()
    assert "negative" in report and "positive" in report  # 3-class report

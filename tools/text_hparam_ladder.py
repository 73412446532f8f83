"""Text-channel hyperparameter ladder on real TumEmo data.

Fused whole-epoch execution (`--device_text`) makes a full 20-epoch
text-channel training run take ~2.5 minutes on one v5e chip, so
hyperparameter search becomes interactive — something the reference's
~2 h/run pipeline could never do.  This ladder trains the text-level GCN
over a grid of configs (train = val split, heldout = unseen test split,
same protocol as docs/RESULTS.md) and reports the best-epoch heldout
accuracy/macro-F1 per config.

One TPU process at a time (runs configs sequentially).
Writes results/r3/text_ladder.json.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = [
    sys.executable, "-u", "-m", "mgnns_tpu.cli.main",
    "--data_root_path", "/root/reference/data",
    "--pmi_phase", "val", "--train_phase", "val",
    "--val_phase", "test", "--test_phase", "test",
    "--text_only", "--device_text", "--use_pallas",
    "--epochs", "20", "--epoch_step", "30", "-b", "64",
]

CONFIGS = {
    # name: extra flags
    "pmi_lr1e-3": ["--edges_init", "pmi", "--lr", "1e-3"],
    "pmi_lr5e-4": ["--edges_init", "pmi", "--lr", "5e-4"],
    "pmi_lr2e-3": ["--edges_init", "pmi", "--lr", "2e-3"],
    "pmi_lr1e-3_drop0.7": ["--edges_init", "pmi", "--lr", "1e-3",
                           "--dropout", "0.7"],
    "pmi_lr1e-3_drop0.3": ["--edges_init", "pmi", "--lr", "1e-3",
                           "--dropout", "0.3"],
    "pmi_lr1e-3_win8": ["--edges_init", "pmi", "--lr", "1e-3",
                        "--window_size", "8"],
    "pmi_lr1e-3_ngram6": ["--edges_init", "pmi", "--lr", "1e-3",
                          "--ngram", "6"],
    "ones_lr1e-3": ["--edges_init", "ones", "--lr", "1e-3"],
    "pmi_lr1e-3_step10": ["--edges_init", "pmi", "--lr", "1e-3",
                          "--epoch_step", "10"],
    "pmi_lr1e-3_seed1": ["--edges_init", "pmi", "--lr", "1e-3",
                         "--seed", "1"],
    # lr 5e-4 was still climbing at epoch 19 in the first sweep — give it
    # room (argparse last-wins, so --epochs here overrides BASE's 20)
    "pmi_lr5e-4_e40": ["--edges_init", "pmi", "--lr", "5e-4",
                       "--epochs", "40"],
    "pmi_lr5e-4_drop0.7_e40": ["--edges_init", "pmi", "--lr", "5e-4",
                               "--dropout", "0.7", "--epochs", "40"],
}


def run_one(name, extra):
    metrics = f"/tmp/ladder_{name}.jsonl"
    if os.path.exists(metrics):
        os.remove(metrics)
    cmd = BASE + extra + [
        "--metrics_path", metrics,
        "--model_name", f"ladder_{name}",
        "--save_model_path", f"/tmp/ladder_ckpt_{name}",
    ]
    rec = {"config": name, "flags": " ".join(extra), "ok": False}
    try:
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                              timeout=2400)
    except subprocess.TimeoutExpired:
        rec["error"] = "timeout (2400s)"
        return rec
    try:
        rows = [json.loads(l) for l in open(metrics)]
        best = max(rows, key=lambda r: r["val"]["accuracy"])
        rec.update(ok=True, best_epoch=best["epoch"],
                   heldout_acc=round(best["val"]["accuracy"], 4),
                   heldout_macro_f1=round(best["val"]["macro_f1"], 4),
                   train_sps=round(rows[-1]["train"]["samples_per_sec"], 1))
    except (OSError, json.JSONDecodeError, ValueError) as e:
        rec["error"] = f"{e}; stderr tail: {(proc.stderr or '')[-300:]}"
    return rec


OUTP = os.path.join(ROOT, "results", "r3", "text_ladder.json")


def main():
    # Resumable like the fusion ladder: merge each config's record into the
    # output JSON as soon as it finishes (a killed run loses at most the
    # in-flight config); configs already recorded ok are skipped on restart.
    done = {}
    if os.path.exists(OUTP):
        with open(OUTP) as f:
            done = {r["config"]: r for r in json.load(f)}
    for name, extra in CONFIGS.items():
        if done.get(name, {}).get("ok"):
            print(f"[ladder] {name} (cached)", flush=True)
            continue
        print(f"[ladder] {name}", flush=True)
        rec = run_one(name, extra)
        print(f"[ladder]   -> {rec.get('heldout_acc', 'FAILED')} "
              f"(mf1 {rec.get('heldout_macro_f1', '-')}, e{rec.get('best_epoch', '-')})",
              flush=True)
        done[name] = rec
        with open(OUTP, "w") as f:
            json.dump([done[n] for n in CONFIGS if n in done], f, indent=2)
    print(json.dumps([done[n] for n in CONFIGS if n in done], indent=2))


if __name__ == "__main__":
    main()

"""Fusion-model hyperparameter ladder on real TumEmo data (TPU, 1 chip).

Same protocol as docs/RESULTS.md's fusion rows: train on the val split
(10,035 records — the upstream train blob is git-LFS-missing), select and
report on the unseen test split, synthetic pixels (no image dump ships),
random-init embeddings (no GloVe ships) — floors, not ceilings.

Per-epoch checkpoint selection uses a fixed 2,560-sample heldout subset
(`--val_limit`; a prefix of the test split, so selection stays train-free)
whose pixel table fits HBM next to the train table — per-epoch eval is then
seconds instead of the ~10 minutes a full 10k per-batch-upload eval costs on
this tunnel rig.  The reported numbers are the engine's FINAL full-test-split
eval of the best-val checkpoint (parsed from the run's stdout).  One TPU
process at a time (sequential).

Writes results/r3/fusion_ladder.json.
"""

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = [
    sys.executable, "-u", "-m", "mgnns_tpu.cli.main",
    "--data_root_path", "/root/reference/data",
    "--pmi_phase", "val", "--train_phase", "val",
    "--val_phase", "test", "--test_phase", "test",
    "--val_limit", "2560", "--device_images_budget_gb", "8.0", "-e",
    "--freeze_trunks", "--bn_mode", "frozen", "--fp16", "--use_pallas",
    "--device_images", "--device_text",
    "--epochs", "10", "--epoch_step", "30",
    "-b", "16", "--eval_batch_size", "128",
]

CONFIGS = {
    # name: extra flags (baseline = committed best: lr 1e-4, ones edges)
    "lr5e-5": ["--lr", "5e-5"],
    "lr1e-4_drop0.3": ["--lr", "1e-4", "--dropout", "0.3"],
    "lr1e-4_drop0.7": ["--lr", "1e-4", "--dropout", "0.7"],
    "lr1e-4_stack1": ["--lr", "1e-4", "--stack_num", "1"],
    "lr1e-4_b32": ["--lr", "1e-4", "-b", "32"],
    "lr1e-4_seed1": ["--lr", "1e-4", "--seed", "1"],
    # dropout 0.7 was the text-channel ladder's winner — try it on fusion
    # at both LRs (argparse last-wins on repeated flags)
    "lr5e-5_drop0.7": ["--lr", "5e-5", "--dropout", "0.7"],
    "lr1e-4_drop0.7_e20": ["--lr", "1e-4", "--dropout", "0.7",
                           "--epochs", "20"],
    # round-3 extension: cheap LR/seed probes around the plateau (every
    # config above lands ~0.555±0.003 — the image channels carry no signal
    # with synthetic pixels, so fusion tracks the text channel plus noise)
    "lr2e-4": ["--lr", "2e-4"],
    "lr1e-4_seed2": ["--lr", "1e-4", "--seed", "2"],
    "lr5e-5_seed1": ["--lr", "5e-5", "--seed", "1"],
}


def run_one(name, extra):
    metrics = f"/tmp/fladder_{name}.jsonl"
    if os.path.exists(metrics):
        os.remove(metrics)
    cmd = BASE + extra + [
        "--metrics_path", metrics,
        "--model_name", f"fladder_{name}",
        "--save_model_path", f"/tmp/fladder_ckpt_{name}",
    ]
    rec = {"config": name, "flags": " ".join(extra), "ok": False}
    try:
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                              timeout=5400)
    except subprocess.TimeoutExpired:
        rec["error"] = "timeout (5400s)"
        return rec
    try:
        rows = [json.loads(l) for l in open(metrics)]
        best = max(rows, key=lambda r: r["val"]["accuracy"])
        rec.update(best_epoch=best["epoch"],
                   select_acc=round(best["val"]["accuracy"], 4),
                   train_sps=round(rows[-1]["train"]["samples_per_sec"], 1),
                   train_fused=bool(rows[-1]["train"].get("fused")))
        # full-test-split metrics of the best-val checkpoint (engine's final
        # test pass, printed as "test: acc A micro I macro M weighted W")
        m = re.search(r"test: acc ([\d.]+) micro ([\d.]+) macro ([\d.]+) "
                      r"weighted ([\d.]+)", proc.stdout or "")
        if m:
            rec.update(ok=True, test_acc=float(m.group(1)),
                       test_micro_f1=float(m.group(2)),
                       test_macro_f1=float(m.group(3)),
                       test_weighted_f1=float(m.group(4)))
        else:
            rec["error"] = ("no final test line; stdout tail: "
                            + (proc.stdout or "")[-300:])
    except (OSError, json.JSONDecodeError, ValueError) as e:
        rec["error"] = f"{e}; stderr tail: {(proc.stderr or '')[-300:]}"
    return rec


OUTP = os.path.join(ROOT, "results", "r3", "fusion_ladder.json")


def main():
    # Resumable: each config's record is merged into the output JSON as soon
    # as it finishes (a killed run loses at most the in-flight config), and
    # configs already recorded with ok=true are skipped on restart.
    done = {}
    if os.path.exists(OUTP):
        with open(OUTP) as f:
            done = {r["config"]: r for r in json.load(f)}
    for name, extra in CONFIGS.items():
        if done.get(name, {}).get("ok"):
            print(f"[fladder] {name} (cached)", flush=True)
            continue
        print(f"[fladder] {name}", flush=True)
        rec = run_one(name, extra)
        print(f"[fladder]   -> test {rec.get('test_acc', 'FAILED')} "
              f"(mf1 {rec.get('test_macro_f1', '-')}, e{rec.get('best_epoch', '-')}, "
              f"fused={rec.get('train_fused', '-')})", flush=True)
        done[name] = rec
        with open(OUTP, "w") as f:
            json.dump([done[n] for n in CONFIGS if n in done], f, indent=2)
    print(json.dumps([done[n] for n in CONFIGS if n in done], indent=2))


if __name__ == "__main__":
    main()

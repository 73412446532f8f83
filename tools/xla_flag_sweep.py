"""TPU compiler-flag sweep over a bench mode (default: the fine-tune train step).

SWEEP_MODE / SWEEP_OUT / SWEEP_COMBOS env vars select the bench mode
(`train` | `full` | `text`), the output JSON path, and an optional
comma-separated subset of COMBOS (round 5: the r3 sweep only covered the
train step; the eval headline path gets its own sweep).

VERDICT r2 item 3 asked for a recorded XLA-flag sweep alongside the roofline
analysis.  Channel discovery (this rig, axon tunnel): TPU-specific
`--xla_tpu_*` flags in XLA_FLAGS crash the CLIENT's flag parser (the client
XLA build has only the CPU flag registry), but `LIBTPU_INIT_ARGS` is
forwarded by the axon host to the server-side TPU compile (verified: a
bogus flag fails the remote compile; a valid one runs).  Each combo runs
`bench.py` in MGNNS_BENCH_MODE=train (B=32, frozen BN, unrolled trunks —
the recommended fine-tune config) in a fresh subprocess, because the env
must be set before the first jax import and different flags miss the
compilation cache.  One TPU process at a time.

Writes results/r3/xla_flag_sweep.json and prints a summary table.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = {
    "default": "",
    "no_latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "no_multi_level_fusion": "--xla_tpu_enable_multi_level_nested_loop_fusion=false",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    "aggressive_fusion_layout": "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "licm_inflation_2x": "--xla_tpu_licm_size_inflation_ratio=2.0",
}


def run_combo(name: str, flags: str) -> dict:
    env = dict(os.environ)
    mode = os.environ.get("SWEEP_MODE", "train")
    env["MGNNS_BENCH_MODE"] = mode
    if mode == "train":
        env["MGNNS_BENCH_BATCH"] = os.environ.get("SWEEP_BATCH", "32")
    elif "SWEEP_BATCH" in os.environ:
        env["MGNNS_BENCH_BATCH"] = os.environ["SWEEP_BATCH"]
    # the persistent compilation cache key does NOT include libtpu flags —
    # a cache hit would silently measure the default-compiled program
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    if flags:
        env["LIBTPU_INIT_ARGS"] = (
            env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    out = (proc.stdout or "").strip().splitlines()
    rec = {"combo": name, "libtpu_init_args": flags, "ok": False}
    for line in reversed(out):
        try:
            j = json.loads(line)
            rec.update(ok=True, samples_per_sec=j["value"], config=j.get("config"))
            break
        except (json.JSONDecodeError, KeyError):
            continue
    if not rec["ok"]:
        rec["error"] = (proc.stderr or "")[-500:]
    return rec


def main():
    results = []
    subset = os.environ.get("SWEEP_COMBOS", "")
    combos = {k: COMBOS[k] for k in subset.split(",") if k} if subset else COMBOS
    for name, flags in combos.items():
        print(f"[sweep] {name}: {flags or '(baseline)'}", flush=True)
        rec = run_combo(name, flags)
        print(f"[sweep]   -> {rec.get('samples_per_sec', 'FAILED')}", flush=True)
        results.append(rec)
    outp = os.environ.get(
        "SWEEP_OUT", os.path.join(ROOT, "results", "r3", "xla_flag_sweep.json"))
    with open(outp, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

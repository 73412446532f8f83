"""Cold-start breakdown: where the fused-eval warmup time goes (round-5 #1).

Round 4 recorded a single opaque number — 610 s of warmup against a 10 s
epoch (results/r4/full_split_fused_eval.json).  This tool measures each
phase independently on the real chip:

  setup_seconds        vocab + PMI + dataset + jitted model init
  decode_seconds       host synthesis/decode of all N 448px frames (threaded,
                       same pool the loader uses)
  upload_seconds       device_put of the [N, H*W*3] uint8 pixel table
                       (+ the small text tables), with a readback barrier
  upload_mb / upload_mb_per_s   table size and effective H2D rate
  h2d_probe_mb_per_s   raw device_put bandwidth probe (256 MB), the rig's
                       H2D ceiling — if upload_mb_per_s ~= probe, the upload
                       term is the tunnel's irreducible floor
  first_epoch_seconds  fused eval epoch 1 with tables already resident
                       (compile + run; compile_seconds broken out by the
                       engine)
  epoch_seconds        steady fused epoch
  time_to_first_result first epoch end relative to process start — the
                       user-visible "time to first useful output"

Cache mode: MGNNS_COLD=1 points the persistent compilation cache at a fresh
temp dir (true cold compile); default reuses the shared cache (the day-two
warm start).  WB_PIPELINED=1 measures the loader's REAL (round-5) pipelined
chunked table build — decode overlapped with upload — as one
``table_build_seconds`` phase instead of the separate decode/upload
diagnosis.  Writes results/r5/warmup_breakdown_{cold|warm|pipelined}.json.
One TPU process at a time.
"""

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_T_PROCESS_START = time.time()

from tools._bench_util import flagship_data, flagship_model  # noqa: E402


def main():
    import jax
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    cold = os.environ.get("MGNNS_COLD") == "1"
    if cold:
        cache_dir = tempfile.mkdtemp(prefix="mgnns_cold_cache_")
        enable_compilation_cache(path=cache_dir)
    else:
        enable_compilation_cache()

    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.engine.train import Engine

    B = int(os.environ.get("WB_BATCH", "128"))
    n_records = int(os.environ.get("WB_SAMPLES", "0")) or None

    t0 = time.time()
    data = flagship_data(n_records=n_records)
    model = flagship_model(data, bn_mode="batch")
    setup_s = time.time() - t0
    ds = data.ds
    N = len(ds)

    def h2d_probe():
        # raw device_put bandwidth probe — the rig's H2D ceiling
        probe_mb = 256
        probe = np.random.default_rng(0).integers(
            0, 255, (probe_mb << 20,), np.uint8)
        rates = []
        for _ in range(3):
            t0 = time.time()
            dev = jax.device_put(probe)
            dev.block_until_ready()
            int(np.asarray(dev[:8]).sum())  # real D2H readback barrier
            rates.append(probe_mb / (time.time() - t0))
            del dev
        return max(rates)  # max: later reps avoid one-time staging setup

    pipelined = os.environ.get("WB_PIPELINED") == "1"
    decode_s = upload_s = build_s = None
    if pipelined:
        # ---- the loader's real path: decode/upload-overlapped build -------
        from mgnns_tpu.data.loader import _build_image_table_pipelined

        t0 = time.time()
        table, row_shape = _build_image_table_pipelined(ds, 8)
        int(np.asarray(table[N - 1, :8]).sum())  # barrier: writes complete
        build_s = time.time() - t0
        mb = table.nbytes / (1 << 20)
    else:
        # ---- decode: host pixel synthesis/decode, threaded like the loader
        t0 = time.time()
        pool = ThreadPoolExecutor(8)
        try:
            imgs = list(pool.map(ds.load_image, range(N)))
        finally:
            pool.shutdown(wait=False)
        arr = np.stack(imgs)
        del imgs
        decode_s = time.time() - t0

        # ---- upload: the pixel table H2D (the loader's exact layout) ------
        row_shape = arr.shape[1:]
        arr2d = arr.reshape(arr.shape[0], -1)
        mb = arr2d.nbytes / (1 << 20)
        t0 = time.time()
        table = jax.device_put(arr2d)
        table.block_until_ready()
        int(np.asarray(table[0, :8]).sum())
        upload_s = time.time() - t0
        del arr, arr2d
    ds._device_image_table = (table, row_shape)  # loader reuses this copy

    # ---- text tables (tiny, measured for completeness) --------------------
    loader = DeviceLoader(ds, B, shuffle=False, num_threads=8,
                          device_images=True, device_text=True)
    t0 = time.time()
    loader._ensure_text_tables()
    text_upload_s = time.time() - t0

    # ---- fused eval epochs (tables resident -> pure compile + run) --------
    eng = Engine(model.apply_fn, model.params, model.bstats, num_classes=7,
                 steps_per_epoch=1, eval_only=True)
    t0 = time.time()
    ev0 = eng.eval_epoch(loader)
    first_epoch_s = time.time() - t0
    t_first_result = time.time() - _T_PROCESS_START
    ev = eng.eval_epoch(loader)

    # probe LAST so its 768 MB of diagnostic traffic cannot inflate
    # time_to_first_result; it still snapshots this run's tunnel conditions
    # (the rig's H2D rate varies 8-32 MB/s run to run)
    probe_rate = h2d_probe()

    out = {
        "device": str(jax.devices()[0]),
        "cache_mode": "cold" if cold else "warm",
        "n_samples": N,
        "batch": B,
        "setup_seconds": round(setup_s, 1),
        "upload_mb": round(mb, 1),
        "text_table_upload_seconds": round(text_upload_s, 2),
        "h2d_probe_mb_per_s": round(probe_rate, 1),
        "first_epoch_seconds": round(first_epoch_s, 1),
        "compile_seconds": round(ev0.get("compile_seconds", 0.0), 1),
        "epoch_seconds": round(ev["epoch_seconds"], 3),
        "samples_per_sec": round(ev["samples_per_sec"], 1),
        "fused": bool(ev.get("fused")),
        "time_to_first_result_seconds": round(t_first_result, 1),
    }
    if pipelined:
        out["table_build_seconds"] = round(build_s, 1)
        out["table_build_mb_per_s"] = round(mb / build_s, 1)
    else:
        out["decode_seconds"] = round(decode_s, 1)
        out["upload_seconds"] = round(upload_s, 1)
        out["upload_mb_per_s"] = round(mb / upload_s, 1)
    tag = "pipelined" if pipelined else ("cold" if cold else "warm")
    outp = os.path.join(ROOT, "results", "r5", f"warmup_breakdown_{tag}.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

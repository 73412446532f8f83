"""End-to-end benchmark: full-MGNNS eval samples/sec/chip on TumEmo.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Modes (env MGNNS_BENCH_MODE), matching BASELINE.json's config ladder:
  full  (default) — full fusion model eval (text GCN + BiLSTM + both trunks
                    + image GCNs + label attention + 4-way cross fusion);
  text            — text-channel-only model (Text_GCN configs);
  train           — full-model training throughput: a full shuffled train
                    epoch through the production input path (engine epoch
                    clock; step microbench kept as a diagnostic).

What is measured (full mode): the jitted full fusion forward (text-GCN +
BiLSTM + ResNet-101 + Places-ResNet-50 + image GCNs + label attention +
4-way cross-modal fusion) on real TumEmo val text at the reference's
canonical image size 448, bf16 compute.  The HEADLINE ``value`` is the
honest end-to-end production path, not the device-cached ceiling:
  value                        live pipeline: device-resident pixel AND
                               text tables (--device_images /
                               --device_text) with the engine's fused
                               whole-epoch lax.scan (falls back to the
                               streaming loader if the fused program does
                               not fit HBM; live_pipeline_fused reports
                               which ran);
  value_device_cached          device-cached batches (chip-side ceiling,
                               diagnostic);
  value_live_streaming         same tables through the per-batch streaming
                               loader (one index H2D + eager gathers/step);
  value_live_per_batch_upload  worst case: full pixels re-shipped per batch
                               (double-buffered; network H2D on this rig).
Image bytes are synthetic (the reference checkout ships no image files) but
full-size, so decode/normalize costs are real where they apply.

Baseline: ``bench_baseline.json`` (reference-CPU torch forward of the two
ResNet trunks — see tools/calibrate_baseline.py; biased in the baseline's
favor).
"""

import json
import os
import sys
import time

_T_PROCESS_START = time.time()

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from tools._bench_util import flagship_data, flagship_model


def main():
    import jax
    import numpy as np

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.data.loader import DeviceLoader

    mode = os.environ.get("MGNNS_BENCH_MODE", "full")
    batch_size = int(os.environ.get(
        "MGNNS_BENCH_BATCH", {"full": "128", "text": "64", "train": "16"}.get(mode, "128")))
    n_samples = int(os.environ.get("MGNNS_BENCH_SAMPLES", "512"))

    data = flagship_data(n_records=n_samples)
    vocab, graph, ds = data.vocab, data.graph, data.ds

    if mode == "text":
        import jax.numpy as jnp
        from mgnns_tpu.models import text_model_apply, text_model_init

        tparams = text_model_init(jax.random.key(0), len(vocab), 7, graph.num_edges)

        @jax.jit
        def text_eval(p, batch):
            return jax.numpy.argmax(
                text_model_apply(p, batch, ngram=4, use_pallas=True), axis=-1)

        loader = DeviceLoader(ds, batch_size, shuffle=False, with_images=False,
                              cache_device_batches=True)

        def run_text():
            n, preds = 0, None
            for batch in loader:
                b = {k: batch[k] for k in ("ids", "lens", "eids")}
                preds = text_eval(tparams, b)
                n += int(np.asarray(batch["weight"]).sum())
            # real D2H readback: block_until_ready can return before remote
            # execution completes on a network-attached TPU
            int(np.asarray(preds).sum())
            return n

        run_text()
        t0 = time.time()
        n = run_text()
        sps = n / (time.time() - t0)
        print(json.dumps({"metric": "text_channel_eval_samples_per_sec_per_chip",
                          "value": round(sps, 2), "unit": "samples/s",
                          "vs_baseline": None}))
        return

    # train-mode knobs (recommended fine-tune config by default: frozen BN +
    # unrolled block scans; MGNNS_BENCH_FREEZE_TRUNKS=1 for the
    # feature-extraction mode)
    bn_mode = os.environ.get("MGNNS_BENCH_BN", "frozen" if mode == "train" else "batch")
    model = flagship_model(
        data, bn_mode=bn_mode,
        unroll_trunks=(mode == "train" and
                       os.environ.get("MGNNS_BENCH_UNROLL", "1") == "1"),
        remat_policy=os.environ.get("MGNNS_BENCH_REMAT", "none"),
        freeze_trunks=os.environ.get("MGNNS_BENCH_FREEZE_TRUNKS") == "1",
        stem_s2d=os.environ.get("MGNNS_BENCH_STEM_S2D", "0") == "1")
    cfg, params, bstats = model.cfg, model.params, model.bstats

    @jax.jit
    def eval_step(p, bs, batch):
        logits, _ = model.apply_fn(p, bs, batch, train=False, rng=None)
        return jax.numpy.argmax(logits, axis=-1)

    # The eval set is static: the loader keeps its device-resident batches
    # after the first pass (decode + H2D are one-time costs in a serving
    # deployment with a pinned eval set).
    loader = DeviceLoader(ds, batch_size, shuffle=False, num_threads=8,
                          cache_device_batches=True)

    def run_epoch():
        n = 0
        preds = None
        for batch in loader:
            b = {k: batch[k] for k in ("ids", "lens", "mask", "eids", "image")}
            preds = eval_step(params, bstats, b)
            n += int(np.asarray(batch["weight"]).sum())
        # real D2H readback (see text mode): a true end-of-epoch barrier
        int(np.asarray(preds).sum())
        return n

    if mode == "train":
        from mgnns_tpu.engine import metrics as M
        from mgnns_tpu.engine.train import Engine

        # HEADLINE: the CLI's epoch clock — a full shuffled train epoch
        # through the production input path (device-resident text/pixel
        # tables; the fused whole-epoch program when it fits HBM, the
        # K-segment ladder or streaming fallback otherwise), timed by the
        # engine's own honest barrier (stacked D2H loss readback).  The old
        # 5-repeats-of-one-cached-batch number remains as a diagnostic
        # (value_step_microbench): it bounds the step kernel but hides
        # input, shuffle, and dispatch costs.
        eng = Engine(model.apply_fn, params, bstats, num_classes=7,
                     steps_per_epoch=1, freeze_trunks=cfg.freeze_trunks)
        train_loader = DeviceLoader(ds, batch_size, shuffle=True,
                                    num_threads=8, device_images=True,
                                    device_text=True)
        eng.train_epoch(train_loader)  # warmup: tables + compile
        out = eng.train_epoch(train_loader)
        sps_epoch = out.get("steady_samples_per_sec", out["samples_per_sec"])

        batch = next(iter(DeviceLoader(ds, batch_size, shuffle=False,
                                       num_threads=8)))
        cm = M.confusion_init(7)
        eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
        # force real completion: read back a param (block_until_ready alone
        # can return early over the tunnel)
        float(jax.tree_util.tree_leaves(eng.state.params)[0].astype("float32").sum())
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            cm = M.confusion_init(7)
            eng.state, loss, cm = eng._train_step(eng.state, batch, cm)
        float(jax.tree_util.tree_leaves(eng.state.params)[0].astype("float32").sum())
        sps_step = batch_size * iters / (time.time() - t0)
        print(json.dumps({"metric": "mgnns_train_samples_per_sec_per_chip",
                          "value": round(sps_epoch, 2), "unit": "samples/s",
                          "vs_baseline": None,
                          "epoch_fused": bool(out.get("fused")),
                          "fused_segments": eng._fused_segments,
                          "value_step_microbench": round(sps_step, 2),
                          "config": {"bn_mode": cfg.bn_mode,
                                     "unroll_trunks": cfg.unroll_trunks,
                                     "freeze_trunks": cfg.freeze_trunks,
                                     "remat_policy": cfg.remat_policy,
                                     "batch_size": batch_size}}))
        return

    run_epoch()  # warmup: compile + decode + H2D staging
    t0 = time.time()
    n = run_epoch()
    dt = time.time() - t0
    sps = n / dt

    # live-pipeline number: the framework's BEST production input path —
    # the split's pixels AND text tensors live in HBM as tables
    # (--device_images / --device_text; uploaded once, in the warmup epoch)
    # and the engine runs the whole epoch as ONE fused lax.scan program,
    # gathering every batch on device from a fresh [num_batches, B] index
    # plan built inside the timed epoch.  Honest barrier: the engine stops
    # its clock on a stacked D2H loss readback.
    def epoch_with(loader):
        n = 0
        preds = None
        for batch in loader:
            b = {k: batch[k] for k in ("ids", "lens", "mask", "eids", "image")}
            preds = eval_step(params, bstats, b)
            n += int(np.asarray(batch["weight"]).sum())
        # real D2H readback (see text mode): a true end-of-epoch barrier
        int(np.asarray(preds).sum())
        return n

    from mgnns_tpu.engine.train import Engine

    live_eng = Engine(model.apply_fn, params, bstats, num_classes=7,
                      steps_per_epoch=1, eval_only=True)
    live_loader = DeviceLoader(ds, batch_size, shuffle=False, num_threads=8,
                               cache_device_batches=False, device_images=True,
                               device_text=True)
    t0 = time.time()
    live_eng.eval_epoch(live_loader)  # warmup: table upload + fused compile
    warm_start_s = time.time() - t0
    t_first_result = time.time() - _T_PROCESS_START
    live = live_eng.eval_epoch(live_loader)
    sps_live = live["samples_per_sec"]
    live_fused = bool(live.get("fused"))

    # diagnostic: the same tables through the streaming per-batch loader
    # (one index-vector H2D + eager gathers per step)
    stream_loader = DeviceLoader(ds, batch_size, shuffle=False, num_threads=8,
                                 cache_device_batches=False,
                                 device_images=True)
    epoch_with(stream_loader)  # warmup
    t0 = time.time()
    n_stream = epoch_with(stream_loader)
    sps_stream = n_stream / (time.time() - t0)

    # diagnostic: the worst-case path — full pixels re-uploaded per batch
    # (double-buffered H2D; on this rig that is a network copy through the
    # tunnel, on a TPU VM it is PCIe)
    upload_loader = DeviceLoader(ds, batch_size, shuffle=False, num_threads=8,
                                 cache_device_batches=False)
    t0 = time.time()
    n_up = epoch_with(upload_loader)
    sps_upload = n_up / (time.time() - t0)

    baseline_path = os.path.join(ROOT, "bench_baseline.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["reference_cpu_samples_per_sec"]
        vs = sps_live / base

    # regression gate vs the previous round's committed headline
    # (round-4 review: the headline drifted -3.6% over r2..r4 with nothing
    # watching; flag any drop past the tunnel's measured run-to-run noise)
    prev = _load_prev_round_value()

    # headline = the live production path (round-2 review: lead with the
    # honest end-to-end number, keep the cached ceiling as a diagnostic)
    out = {
        "metric": "mgnns_eval_samples_per_sec_per_chip",
        "value": round(sps_live, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "live_pipeline_fused": live_fused,
        "value_device_cached": round(sps, 2),
        "value_live_streaming": round(sps_stream, 2),
        "value_live_per_batch_upload": round(sps_upload, 2),
        # cold-start visibility (round-5 item 1): the live path's warmup
        # (pipelined table build + fused compile + first epoch) and the
        # wall time from process start to the first full epoch's results —
        # see results/r5/warmup_breakdown_*.json for the phase breakdown
        "warm_start_seconds": round(warm_start_s, 1),
        "time_to_first_result_seconds": round(t_first_result, 1),
    }
    if prev is not None:
        prev_round, prev_value = prev
        delta_pct = 100.0 * (sps_live - prev_value) / prev_value
        out["prev_round"] = prev_round
        out["prev_value"] = prev_value
        out["value_delta_vs_prev_pct"] = round(delta_pct, 2)
        # 7% tolerance: above the measured tunnel run-to-run noise
        # (docs/PERFORMANCE.md records ~±3-4% scatter on this rig)
        out["regression"] = bool(delta_pct < -7.0)
    print(json.dumps(out))


def _load_prev_round_value():
    """(round_n, headline_value) from the newest committed BENCH_r*.json
    whose metric matches the headline, or None."""
    import glob
    import re

    best = None
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        # tolerate any malformed prior-round file (non-dict top level,
        # missing/null value from a failed run): crashing HERE would lose
        # this run's measurements at the very last step
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            if parsed.get("metric") != "mgnns_eval_samples_per_sec_per_chip":
                continue
            value = float(parsed["value"])
        except (json.JSONDecodeError, OSError, AttributeError,
                KeyError, TypeError, ValueError):
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, value)
    return best


if __name__ == "__main__":
    main()

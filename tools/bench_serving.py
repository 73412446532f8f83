"""Serving latency/throughput benchmark on the real chip.

Measures the production inference path end to end — raw JSON records
through preprocessing, the fixed-batch jitted forward, and softmax back to
host — for both the text-only and fusion models, plus the HTTP micro-
batching frontend under concurrent clients.  The reference has no serving
path at all (prediction means running its evaluation engine over a dataset
on disk), so these numbers are TPU-native capability, not parity.

Protocol per model:
  * direct: warm the program, then time N sequential predict() calls at
    batch sizes 1 and max_batch -> p50/p99 latency (ms) + samples/s.
  * http: boot cli.serve's ThreadingHTTPServer in-process, fire C
    concurrent clients x R requests (1 record each) -> p50/p99 wall
    latency + aggregate requests/s (micro-batching coalesces them).

Round 5 adds: per-stage latency breakdown (encode text / decode images /
H2D placement / forward dispatch / readback) for the direct path, and a
``sustained`` leg driving the two-stage pipelined BatchingFrontend with
concurrent full-batch clients.

Writes results/r5/serving_bench.json.  One TPU process at a time.
"""

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF = "/root/reference/data"
TEXTS = [
    "what a wonderful happy day full of joy and love",
    "sad terrible awful news today",
    "calm quiet evening by the lake",
    "this makes me so angry honestly",
]


def _records(n, with_image):
    recs = [{"id": str(i), "text": TEXTS[i % len(TEXTS)]} for i in range(n)]
    if with_image:
        for r in recs:
            r["image"] = f"synthetic_{r['id']}.jpg"
    return recs


def bench_direct(pred, label, n_iters=50):
    out = {}
    for bs in (1, pred.max_batch):
        recs = _records(bs, not pred.text_only)
        pred.predict(recs)  # warm (compile + cache)
        lat, stages = [], []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            pred.predict(recs)
            lat.append(time.perf_counter() - t0)
            stages.append(dict(pred.last_timings))
        ms = np.array(lat) * 1e3
        out[f"b{bs}"] = {
            "p50_ms": round(float(np.percentile(ms, 50)), 2),
            "p99_ms": round(float(np.percentile(ms, 99)), 2),
            "samples_per_sec": round(bs / float(np.median(lat)), 1),
            # per-stage medians (round-5 item 2: the committed breakdown
            # that says WHERE a request's latency goes)
            "stage_p50_ms": {
                k: round(float(np.median([s[k] for s in stages if k in s])), 2)
                for k in sorted({k for s in stages for k in s})},
        }
    print(f"[serve-bench] {label} direct: {out}", flush=True)
    return out


def bench_sustained(pred, label, clients=3, reqs_per_client=10):
    """Sustained full-batch throughput through the two-stage pipelined
    frontend: ``clients`` threads keep >= 2 groups in flight, so host decode
    of group k+1 overlaps device execution of group k (the round-5 fix for
    the 17x serving-vs-epoch gap)."""
    from mgnns_tpu.serving import BatchingFrontend

    fe = BatchingFrontend(pred, max_queue=256)
    recs = _records(pred.max_batch, not pred.text_only)
    fe.submit(recs, timeout=300)  # warm

    def client():
        for _ in range(reqs_per_client):
            fe.submit(recs, timeout=300)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = clients * reqs_per_client * pred.max_batch
    out = {"clients": clients, "batch": pred.max_batch,
           "samples": n, "samples_per_sec": round(n / wall, 1)}
    print(f"[serve-bench] {label} sustained: {out}", flush=True)
    return out


def bench_http(pred, label, clients=8, reqs_per_client=25):
    from mgnns_tpu.cli.serve import make_handler
    from mgnns_tpu.serving import BatchingFrontend
    from http.server import ThreadingHTTPServer

    frontend = BatchingFrontend(pred, max_queue=256)
    handler = make_handler(frontend, label, pred.text_only, 60.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    server.daemon_threads = True
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    lat, errs = [], [0]
    lock = threading.Lock()

    def client(ci):
        rec = _records(1, not pred.text_only)[0]
        body = json.dumps({"records": [rec]}).encode()
        for _ in range(reqs_per_client):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    json.loads(r.read())
                with lock:
                    lat.append(time.perf_counter() - t0)
            except Exception:
                with lock:
                    errs[0] += 1

    # warm through HTTP once so the first timed request isn't a compile;
    # drop warmup latencies AND warmup errors (a compile-slow first request
    # timing out is a warmup artifact, not a steady-state serving error)
    client(-1)
    lat.clear()
    errs[0] = 0
    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    server.shutdown()
    ms = np.array(lat) * 1e3
    out = {
        "clients": clients, "requests": len(lat), "errors": errs[0],
        "p50_ms": round(float(np.percentile(ms, 50)), 2),
        "p99_ms": round(float(np.percentile(ms, 99)), 2),
        "requests_per_sec": round(len(lat) / wall, 1),
    }
    print(f"[serve-bench] {label} http: {out}", flush=True)
    return out


def floor_analysis(results, image_size=None):
    """Derive WHERE the fusion batched-serving ceiling is (round-5 item 2).

    The per-stage breakdown separates host decode (overlapped away by the
    pipelined frontend) from ``readback`` — which blocks on the H2D pixel
    transfer + device forward.  On this rig the chip is reached through a
    tunnel, so the wire, not the chip, sets the batched floor: this computes
    the effective H2D bandwidth the sustained leg achieved and what a target
    rate would require.
    """
    fusion = results.get("fusion")
    if not fusion:
        return None
    batch = fusion["sustained"]["batch"]
    # derive, don't hardcode: the direct bench keys its rows by batch size,
    # and the served model's resolution may not be the 448 default
    bs = fusion["direct"].get(f"b{batch}") or {}
    stage = bs.get("stage_p50_ms", {})
    if image_size is None:
        image_size = fusion.get("image_size", 448)
    mb = batch * image_size * image_size * 3 / 1e6  # uint8 pixels H2D
    sps = fusion["sustained"]["samples_per_sec"]
    eff_mb_s = sps / batch * mb
    # chip-side forward reference: the committed roofline, if present
    fwd_ms = None
    try:
        with open(os.path.join(ROOT, "results", "r5", "roofline.json")) as f:
            fwd_ms = round(json.load(f)["eval_forward"]["seconds"] * 1e3, 1)
    except (OSError, KeyError, ValueError):
        pass
    return {
        "pixel_mb_per_batch": round(mb, 2),
        "sustained_samples_per_sec": sps,
        "effective_h2d_mb_per_s": round(eff_mb_s, 1),
        "readback_p50_ms": stage.get("readback_ms"),
        "decode_p50_ms": stage.get("decode_images_ms"),
        "chip_forward_ms_b32_roofline": fwd_ms,
        "mb_per_s_needed_for_150sps": round(150 / batch * mb, 1),
        "note": ("sustained period ~= max(decode, H2D+forward); readback "
                 "(wire wait + forward) dominates -> the tunnel's "
                 "H2D bandwidth is the batched-serving floor on this rig, "
                 "not host decode or the chip"),
    }


def train_text_ckpt(tmp):
    """A quick text checkpoint (protocol of docs/RESULTS.md, 2 epochs)."""
    from mgnns_tpu.cli.main import main
    main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val",
        "--text_only", "--epochs", "2", "-b", "64", "--limit_samples", "512",
        "--save_model_path", os.path.join(tmp, "text_ckpt"),
    ])
    return os.path.join(tmp, "text_ckpt", "mgnns_tpu")


def train_fusion_ckpt(tmp):
    from mgnns_tpu.cli.main import main
    main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val",
        "--epochs", "1", "-b", "16", "--limit_samples", "64",
        "--freeze_trunks", "--bn_mode", "frozen", "--fp16",
        "--image_backend", "synthetic",
        "--save_model_path", os.path.join(tmp, "fusion_ckpt"),
    ])
    return os.path.join(tmp, "fusion_ckpt", "mgnns_tpu")


def main():
    from mgnns_tpu.serving import Predictor
    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tmp = "/tmp/serve_bench"
    os.makedirs(tmp, exist_ok=True)
    results = {"device": str(__import__("jax").devices()[0])}

    text_ckpt = train_text_ckpt(tmp)
    pred_t = Predictor.from_engine_artifacts(
        REF, text_ckpt, text_only=True, pmi_phase="val", max_batch=16)
    pred_t.warm()  # production path (cli/serve.py): all buckets precompiled
    results["text"] = {
        "direct": bench_direct(pred_t, "text"),
        "sustained": bench_sustained(pred_t, "text"),
        "http": bench_http(pred_t, "text"),
    }
    del pred_t

    if "--text-only" in sys.argv:  # CPU smoke mode
        print(json.dumps(results, indent=2))
        return

    fusion_ckpt = train_fusion_ckpt(tmp)
    pred_f = Predictor.from_engine_artifacts(
        REF, fusion_ckpt, pmi_phase="val", max_batch=16,
        image_backend="synthetic", strict_images=False)
    pred_f.warm()
    results["fusion"] = {
        "image_size": pred_f.image_size,
        "direct": bench_direct(pred_f, "fusion", n_iters=25),
        "sustained": bench_sustained(pred_f, "fusion"),
        "http": bench_http(pred_f, "fusion", clients=8, reqs_per_client=10),
    }

    results["fusion"]["floor_analysis"] = floor_analysis(results)

    outp = os.path.join(ROOT, "results", "r5", "serving_bench.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

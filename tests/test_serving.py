"""Serving/Predictor tests: checkpoint -> prediction on raw records."""

import json
import os

import numpy as np
import pytest

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference data unavailable")


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Train the text slice briefly and return its checkpoint dir."""
    from mgnns_tpu.cli.main import main

    root = tmp_path_factory.mktemp("serve")
    main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val",
        "--text_only", "--epochs", "2", "-b", "64", "--limit_samples", "256",
        "--lr", "2e-3",
        "--save_model_path", str(root / "ckpt"),
    ])
    return str(root / "ckpt" / "mgnns_tpu")


def test_predictor_end_to_end(trained_ckpt):
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=4)
    records = [
        {"id": "a", "text": "happy wonderful day full of joy and love"},
        {"id": "b", "text": "sad terrible day"},
        {"id": "c", "text": ""},  # empty text must not crash
    ]
    out = pred.predict(records)
    assert len(out) == 3
    for r in out:
        assert r["label"] in {"angry", "bored", "calm", "fear", "happy", "love", "sad"}
        assert abs(sum(r["probs"].values()) - 1.0) < 1e-4
        assert np.isfinite(list(r["probs"].values())).all()


def test_predictor_batch_padding(trained_ckpt):
    """Requests smaller or larger than max_batch must both work."""
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=4)
    records = [{"text": f"word{i} happy sad"} for i in range(7)]  # 2 chunks
    out = pred.predict(records)
    assert len(out) == 7
    single = pred.predict([records[0]])
    assert single[0]["label"] == out[0]["label"]


def test_resolve_batch_buckets_mesh_divisibility():
    """Default bucket ladders must give REAL small-request buckets for
    every mesh data-axis size (regression: filtering powers of 4 by
    divisibility degenerated to [max_batch] for dsize=8 or dsize=3)."""
    from mgnns_tpu.serving import resolve_batch_buckets

    assert resolve_batch_buckets(None, 16, 1) == [1, 4, 16]
    assert resolve_batch_buckets(None, 16, 8) == [8, 16]
    assert resolve_batch_buckets(None, 24, 3) == [3, 12, 24]
    assert resolve_batch_buckets(None, 64, 4) == [4, 16, 64]
    assert resolve_batch_buckets([2, 8], 16, 2) == [2, 8, 16]
    with pytest.raises(ValueError):
        resolve_batch_buckets([5], 16, 2)  # not mesh-divisible
    with pytest.raises(ValueError):
        resolve_batch_buckets([32], 16, 1)  # above max_batch


def test_predictor_batch_buckets(trained_ckpt):
    """Bucketed batch slots: a small request runs a small compiled batch,
    and every bucket size produces identical predictions (padding rows are
    inert in eval mode)."""
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=16)
    assert pred.batch_buckets == [1, 4, 16]
    assert pred._bucket(1) == 1 and pred._bucket(2) == 4
    assert pred._bucket(5) == 16 and pred._bucket(16) == 16
    pred.warm()
    records = [{"text": f"word{i} happy sad calm"} for i in range(16)]
    full = pred.predict(records)
    # n=3 -> bucket 4; n=1 -> bucket 1: same per-record results as the
    # full-batch run regardless of which compiled slot served them
    assert [r["label"] for r in pred.predict(records[:3])] == \
        [r["label"] for r in full[:3]]
    one = pred.predict(records[:1])[0]
    assert one["label"] == full[0]["label"]
    np.testing.assert_allclose(
        sorted(one["probs"].values()), sorted(full[0]["probs"].values()),
        rtol=1e-5)

    # explicit buckets are validated
    with pytest.raises(ValueError):
        Predictor.from_engine_artifacts(
            REF, trained_ckpt, text_only=True, pmi_phase="val",
            max_batch=4, batch_buckets=[8])


def test_predictor_pipelined_chunks_match(trained_ckpt):
    """A multi-chunk request (pipelined dispatch) returns exactly the
    per-record results of separate single-chunk requests, in order."""
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=4)
    records = [{"id": str(i), "text": f"day {'happy' if i % 2 else 'sad'} "
                                      f"word{i}"} for i in range(11)]
    piped = pred.predict(records)  # 3 chunks in flight
    assert len(piped) == 11
    for i, r in enumerate(records):
        solo = pred.predict([r])[0]
        assert solo["label"] == piped[i]["label"], f"record {i}"


def test_predict_cli(trained_ckpt, tmp_path):
    from mgnns_tpu.cli.predict import main as predict_main

    inp = tmp_path / "in.jsonl"
    inp.write_text('{"id": "x", "text": "happy joy"}\n')
    outp = tmp_path / "out.jsonl"
    predict_main([
        "--data_root_path", REF, "--checkpoint", trained_ckpt, "--text_only",
        "--pmi_phase", "val", "--input", str(inp), "--output", str(outp),
    ])
    row = json.loads(outp.read_text().strip())
    assert row["id"] == "x" and "label" in row and "probs" in row


def test_predictor_missing_checkpoint():
    from mgnns_tpu.serving import Predictor

    with pytest.raises(FileNotFoundError):
        Predictor.from_engine_artifacts(REF, "/tmp/definitely_missing_ckpt",
                                        text_only=True, pmi_phase="val")


def test_predictor_from_model_parallel_checkpoint(tmp_path):
    """A checkpoint trained with model-parallel (padded) tables must serve
    single-device: the padded rows are inert and pass through _conform."""
    from mgnns_tpu.cli.main import main
    from mgnns_tpu.serving import Predictor

    root = tmp_path / "ckpt"
    main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val",
        "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "64",
        "--lr", "2e-3", "--mesh_data", "2", "--mesh_model", "4",
        "--save_model_path", str(root),
    ])
    pred = Predictor.from_engine_artifacts(
        REF, str(root / "mgnns_tpu"), text_only=True, pmi_phase="val", max_batch=4)
    # padded: vocab 20,154 -> 20,156 rows on a model axis of 4
    V = pred.params["text_gcn"]["node_embedding"].shape[0]
    assert V % 4 == 0 and V >= 20154
    out = pred.predict([{"text": "happy wonderful day"}, {"text": "sad day"}])
    assert len(out) == 2 and all(np.isfinite(list(r["probs"].values())).all() for r in out)


def test_http_serve_endpoint(trained_ckpt):
    """cli.serve: /healthz + /predict over a real HTTP round trip."""
    import threading
    import urllib.request

    from mgnns_tpu.cli.serve import build_parser, make_server

    args = build_parser().parse_args([
        "--data_root_path", REF, "--checkpoint", trained_ckpt,
        "--text_only", "--pmi_phase", "val", "--max_batch", "4", "--port", "0",
    ])
    server = make_server(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["text_only"] is True

        body = json.dumps({"records": [
            {"id": "a", "text": "happy wonderful day"},
            {"id": "b", "text": "sad terrible day"},
        ]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        preds = out["predictions"]
        assert len(preds) == 2
        assert all(p["label"] in {"angry", "bored", "calm", "fear", "happy",
                                  "love", "sad"} for p in preds)

        # malformed body -> 400, server stays alive
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=b"{not json", method="POST")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()


def test_http_concurrent_clients_batching(trained_ckpt):
    """Threaded clients against the batching frontend: all requests answered
    in order, /healthz reports latency percentiles and request counts."""
    import threading
    import urllib.request

    from mgnns_tpu.cli.serve import build_parser, make_server

    args = build_parser().parse_args([
        "--data_root_path", REF, "--checkpoint", trained_ckpt,
        "--text_only", "--pmi_phase", "val", "--max_batch", "8", "--port", "0",
    ])
    server = make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    results: dict = {}

    def client(i):
        body = json.dumps({"records": [
            {"id": f"c{i}-0", "text": f"wonderful day number {i}"},
            {"id": f"c{i}-1", "text": f"terrible day number {i}"},
        ]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            results[i] = json.loads(r.read())["predictions"]

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 8
        labels = {"angry", "bored", "calm", "fear", "happy", "love", "sad"}
        for i, preds in results.items():
            assert len(preds) == 2
            assert all(p["label"] in labels for p in preds)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["requests"] >= 8
        assert "latency_ms" in health
        assert health["latency_ms"]["p99"] >= health["latency_ms"]["p50"] > 0
    finally:
        server.shutdown()


# ------------------------------------------------------------- AOT export


def test_export_tree_roundtrip():
    """Pure pytree packaging: nested dict/list mixes survive the
    path-flattened npz format exactly."""
    from mgnns_tpu.export import _flatten_with_paths, _unflatten_from_paths

    tree = {
        "a": {"w": np.arange(6.0).reshape(2, 3), "b": np.zeros(3)},
        "layers": [
            {"k": np.ones(2)},
            {"k": np.full(2, 7.0), "extra": [np.array(1.0), np.array(2.0)]},
        ],
        "scalar": np.array(5, np.int32),
    }
    paths, leaves = _flatten_with_paths(tree)
    # JSON round-trip like the artifact does
    paths = json.loads(json.dumps(paths))
    rebuilt = _unflatten_from_paths(paths, leaves)
    flat0, def0 = __import__("jax").tree_util.tree_flatten(tree)
    flat1, def1 = __import__("jax").tree_util.tree_flatten(rebuilt)
    assert def0 == def1
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(a, b)


def test_export_and_load_exported_match(trained_ckpt, tmp_path):
    """jax.export artifact: identical predictions with no re-trace of the
    model code, and the artifact is multi-platform (cpu+tpu)."""
    from mgnns_tpu.export import export_predictor, load_exported
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=4)
    art = tmp_path / "artifact"
    export_predictor(pred, str(art))
    assert (art / "model.jaxexport").exists()
    meta = json.loads((art / "meta.json").read_text())
    assert meta["platforms"] == ["cpu", "tpu"]

    loaded = load_exported(str(art))
    records = [{"text": "happy wonderful day full of joy"},
               {"text": "sad terrible day"},
               {"text": ""}]
    out0 = pred.predict(records)
    out1 = loaded.predict(records)
    for a, b in zip(out0, out1):
        assert a["label"] == b["label"]
        for k in a["probs"]:
            assert a["probs"][k] == pytest.approx(b["probs"][k], abs=1e-5)


def test_exported_artifact_serves_in_fresh_process(trained_ckpt, tmp_path):
    """The deployment claim, executed: a fresh process loads the artifact
    and predicts without building the model (no init, no re-trace)."""
    import subprocess
    import sys

    from mgnns_tpu.export import export_predictor
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=2)
    art = tmp_path / "artifact"
    export_predictor(pred, str(art))
    expected = pred.predict([{"text": "happy wonderful day"}])[0]["label"]

    inp = tmp_path / "in.jsonl"
    inp.write_text('{"id": "x", "text": "happy wonderful day"}\n')
    outp = tmp_path / "out.jsonl"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "mgnns_tpu.cli.predict",
         "--from_exported", str(art), "--platform", "cpu",
         "--input", str(inp), "--output", str(outp)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(outp.read_text().strip())
    assert row["label"] == expected and row["id"] == "x"


def test_http_serve_from_exported(trained_ckpt, tmp_path):
    """cli.serve --from_exported: the HTTP loop runs off the AOT artifact."""
    import threading
    import urllib.request

    from mgnns_tpu.cli.serve import build_parser, make_server
    from mgnns_tpu.export import export_predictor
    from mgnns_tpu.serving import Predictor

    pred = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=4)
    art = tmp_path / "artifact"
    export_predictor(pred, str(art))

    args = build_parser().parse_args(["--from_exported", str(art), "--port", "0"])
    server = make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps({"records": [{"id": "a", "text": "happy day"}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            preds = json.loads(r.read())["predictions"]
        assert len(preds) == 1 and "label" in preds[0]
    finally:
        server.shutdown()


# ------------------------------------------------------- sharded serving


def test_predictor_mesh_sharded_matches_single_device(trained_ckpt):
    """Mesh-sharded inference (data=4 x model=2 on the virtual 8-CPU mesh):
    identical predictions to the single-device path, with the vocab table
    provably sharded over the model axis."""
    from mgnns_tpu.parallel.mesh import create_mesh
    from mgnns_tpu.serving import Predictor

    base = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=8)
    mesh = create_mesh(data=4, model=2)
    sharded = Predictor.from_engine_artifacts(
        REF, trained_ckpt, text_only=True, pmi_phase="val", max_batch=8,
        mesh=mesh)

    table = sharded.params["text_gcn"]["node_embedding"]
    shards = {s.device for s in table.addressable_shards}
    assert len(shards) == 8  # P('model', None) on a (4,2) mesh -> all devices
    assert table.sharding.is_fully_replicated is False

    records = [{"text": f"happy sad day number {i}"} for i in range(11)]
    out0 = base.predict(records)
    out1 = sharded.predict(records)
    for a, b in zip(out0, out1):
        assert a["label"] == b["label"]
        for k in a["probs"]:
            assert a["probs"][k] == pytest.approx(b["probs"][k], abs=1e-5)


def test_predictor_mesh_batch_divisibility_enforced(trained_ckpt):
    from mgnns_tpu.parallel.mesh import create_mesh
    from mgnns_tpu.serving import Predictor

    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        Predictor.from_engine_artifacts(
            REF, trained_ckpt, text_only=True, pmi_phase="val",
            max_batch=6, mesh=create_mesh(data=4, model=1))


@pytest.mark.slow
def test_export_fusion_model_roundtrip(tmp_path):
    """AOT export of the FULL fusion model (tiny 64px images, CPU): the
    graph constants (GloVe inputs, adjacencies, label embeddings) bake into
    the StableHLO; predictions match the live model exactly."""
    from mgnns_tpu.cli.main import main
    from mgnns_tpu.export import export_predictor, load_exported
    from mgnns_tpu.serving import Predictor

    main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val",
        "--epochs", "1", "-b", "4", "--limit_samples", "8",
        "--image-size", "64", "--bn_mode", "frozen", "--freeze_trunks",
        "--image_backend", "synthetic",
        "--save_model_path", str(tmp_path / "ckpt"),
    ])
    pred = Predictor.from_engine_artifacts(
        REF, str(tmp_path / "ckpt" / "mgnns_tpu"),
        model_overrides={"image_size": 64}, pmi_phase="val", max_batch=2,
        image_backend="synthetic", strict_images=False)
    art = tmp_path / "artifact"
    export_predictor(pred, str(art))

    loaded = load_exported(str(art), image_backend="synthetic",
                           strict_images=False)
    records = [{"id": "a", "text": "happy wonderful day"},
               {"id": "b", "text": "sad terrible day"}]
    out0 = pred.predict(records)
    out1 = loaded.predict(records)
    for a, b in zip(out0, out1):
        assert a["label"] == b["label"]
        for k in a["probs"]:
            assert a["probs"][k] == pytest.approx(b["probs"][k], abs=1e-5)


class _FakePipelinePredictor:
    """Minimal stand-in exposing the BatchingFrontend pipeline surface
    (round-5 two-stage frontend: _encode_host on the encode thread,
    _place/_fwd/_format on the device thread).  The 'batch' is just the
    object array of record ids."""

    text_only = True
    params = None
    batch_stats = None

    def _encode_host(self, records):
        ids = np.array([r["id"] for r in records], dtype=object)
        return ids, len(records)

    def _place(self, batch):
        return batch

    def _format(self, probs):
        return [{"id": i} for i in probs]


def test_batching_frontend_drops_abandoned_requests():
    """Requests whose client already timed out must NOT be predicted: under
    sustained overload the worker would otherwise burn the device computing
    answers nobody reads, keeping the queue saturated (regression: submit()
    set the 'abandoned' flag but the worker never checked it)."""
    import threading
    import time

    from mgnns_tpu.serving import BatchingFrontend

    release = threading.Event()
    calls = []

    class SlowPredictor(_FakePipelinePredictor):
        max_batch = 8

        def _fwd(self, p, bs, batch):
            calls.append(list(batch))
            if batch[0] == "A":
                release.wait(10)
            return batch

    fe = BatchingFrontend(SlowPredictor(), max_queue=4)
    # A occupies the worker; B times out while queued; C runs after
    result_a = {}
    ta = threading.Thread(
        target=lambda: result_a.update(out=fe.submit([{"id": "A"}], timeout=15)))
    ta.start()
    for _ in range(500):  # until the worker picked A up
        if calls:
            break
        time.sleep(0.01)
    assert calls and calls[0] == ["A"]
    with pytest.raises(TimeoutError):
        fe.submit([{"id": "B"}], timeout=0.05)
    release.set()
    ta.join(15)
    assert result_a["out"] == [{"id": "A"}]
    out = fe.submit([{"id": "C"}], timeout=15)
    assert out == [{"id": "C"}]
    # B was abandoned before the worker reached it: never predicted
    assert all("B" not in c for c in calls)


def test_batching_frontend_never_overflows_max_batch():
    """Coalescing must stop BEFORE a group exceeds predictor.max_batch: an
    overflowing group chains extra fixed-shape forwards that every coalesced
    client (including ones that fit the first pass) waits for (regression:
    the worker appended a queued request whenever the running total was
    still below max_batch, so totals like 3+2 > 4 ran as one group)."""
    import threading

    from mgnns_tpu.serving import BatchingFrontend

    release = threading.Event()
    calls = []

    class Pred(_FakePipelinePredictor):
        max_batch = 4

        def _fwd(self, p, bs, batch):
            calls.append(len(batch))
            if batch[0] == "hold0":  # the actual record id, not the prefix
                release.wait(10)
            return batch

    fe = BatchingFrontend(Pred(), max_queue=8)
    results = {}

    def client(name, n):
        results[name] = fe.submit([{"id": f"{name}{i}"} for i in range(n)],
                                  timeout=15)

    th = threading.Thread(target=client, args=("hold", 1))
    th.start()
    for _ in range(500):  # until the worker holds the device
        if calls:
            break
        threading.Event().wait(0.01)
    assert calls == [1]
    # queued while the worker is busy: 3 + 2 > max_batch=4 — must NOT coalesce
    t3 = threading.Thread(target=client, args=("a", 3))
    t3.start()
    for _ in range(500):  # until a's group is encoded and in flight
        with fe._lock:
            if fe._inflight >= 2:
                break
        threading.Event().wait(0.01)
    t2 = threading.Thread(target=client, args=("b", 2))
    t2.start()
    for _ in range(500):  # absorbed off the request queue by the encoder
        if fe._q.qsize() == 0:
            break
        threading.Event().wait(0.01)
    threading.Event().wait(0.05)
    release.set()
    th.join(15); t3.join(15); t2.join(15)
    assert calls == [1, 3, 2]  # two groups, neither exceeding max_batch
    assert [r["id"] for r in results["a"]] == ["a0", "a1", "a2"]
    assert [r["id"] for r in results["b"]] == ["b0", "b1"]


def test_batching_frontend_coalesces_while_pipe_full():
    """With >= 2 chunks already in flight (device busy + one decoded ahead)
    the encode thread must keep absorbing arrivals into ONE group instead of
    slicing concurrent small requests into per-record forwards (regression:
    the round-5 eager encoder shipped each 1-record request as its own
    device chunk, each paying the tunnel's ~25 ms round trip)."""
    import threading
    import time

    from mgnns_tpu.serving import BatchingFrontend

    release = threading.Event()
    calls = []

    class Pred(_FakePipelinePredictor):
        max_batch = 8

        def _fwd(self, p, bs, batch):
            calls.append(len(batch))
            if batch[0] == "hold0":
                release.wait(10)
            return batch

    fe = BatchingFrontend(Pred(), max_queue=32)
    results = {}

    def client(name, n):
        results[name] = fe.submit([{"id": f"{name}{i}"} for i in range(n)],
                                  timeout=15)

    # "hold" occupies the device; "a" decodes ahead -> 2 chunks in flight
    th = threading.Thread(target=client, args=("hold", 1))
    th.start()
    for _ in range(500):
        if calls:
            break
        time.sleep(0.01)
    assert calls == [1]
    ta = threading.Thread(target=client, args=("a", 1))
    ta.start()
    for _ in range(500):
        with fe._lock:
            if fe._inflight >= 2:
                break
        time.sleep(0.01)
    # four concurrent 1-record requests arrive while the pipe is full:
    # the encoder must coalesce them, not ship four 1-record chunks
    tc = [threading.Thread(target=client, args=(f"c{i}", 1)) for i in range(4)]
    for t in tc:
        t.start()
    for _ in range(500):  # absorbed off the request queue by the encoder
        if fe._q.qsize() == 0:
            break
        time.sleep(0.01)
    time.sleep(0.05)  # let the encoder's absorb loop drain the last arrival
    release.set()
    th.join(15); ta.join(15)
    for t in tc:
        t.join(15)
    assert calls[:2] == [1, 1]  # hold, then the decoded-ahead "a"
    assert calls[2:] == [4], calls  # the four arrivals ran as ONE forward
    for i in range(4):
        assert [r["id"] for r in results[f"c{i}"]] == [f"c{i}0"]


def test_batching_frontend_empty_submit_returns_immediately():
    """submit([]) produces zero device chunks, so nothing would ever set the
    completion event — it must short-circuit to [] (regression: the round-5
    chunked accumulator hung an empty direct-library submit for its full
    timeout)."""
    import time

    from mgnns_tpu.serving import BatchingFrontend

    class Pred(_FakePipelinePredictor):
        max_batch = 4

        def _fwd(self, p, bs, batch):
            return batch

    fe = BatchingFrontend(Pred(), max_queue=4)
    t0 = time.perf_counter()
    assert fe.submit([], timeout=5) == []
    assert time.perf_counter() - t0 < 1.0
    # and the frontend still works for real traffic afterwards
    assert [r["id"] for r in fe.submit([{"id": "x"}], timeout=10)] == ["x"]


def test_batching_frontend_inflight_counter_never_negative():
    """The in-flight chunk counter is incremented BEFORE the encoded chunk is
    handed to the device thread (regression: a late increment let the device
    finish the chunk first, driving the counter transiently negative and
    breaking the busy<2 coalescing signal)."""
    import threading

    from mgnns_tpu.serving import BatchingFrontend

    class Pred(_FakePipelinePredictor):
        max_batch = 2

        def _fwd(self, p, bs, batch):
            return batch

    fe = BatchingFrontend(Pred(), max_queue=64)
    seen = []
    orig = fe._item_done

    def counting_item_done():
        with fe._lock:
            seen.append(fe._inflight)
            fe._inflight -= 1
            fe._wake.notify_all()

    fe._item_done = counting_item_done
    threads = [threading.Thread(
        target=lambda i=i: fe.submit([{"id": f"r{i}"}], timeout=15))
        for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(20)
    assert seen and min(seen) >= 1, seen  # pre-decrement value, never < 1
    with fe._lock:
        assert fe._inflight == 0

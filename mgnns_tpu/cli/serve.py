"""HTTP serving endpoint: a stdlib server around :class:`serving.Predictor`.

The reference has no serving story at all; this closes the deployment loop:
train with ``cli.main`` -> serve the checkpoint over HTTP.  Endpoints:

- ``GET  /healthz``  -> ``{"status": "ok", "model": ..., "text_only": ...,
  "requests": N, "queue_depth": N, "latency_ms": {"p50", "p99", "max"}}``
- ``POST /predict``  -> body ``{"records": [{"id": ..., "text": ...,
  "image": ...}, ...]}`` (or a bare list); returns ``{"predictions": [...]}``
  in input order, each with ``label`` and per-class ``probs``.

Concurrency model: a threaded HTTP front accepts requests concurrently; ONE
worker thread owns the TPU program and coalesces queued requests into
fixed-shape device batches (:class:`serving.BatchingFrontend`).  The bounded
request queue gives backpressure — a full queue answers 503 immediately
rather than letting latency grow unboundedly.

Usage:
    python -m mgnns_tpu.cli.serve --data_root_path data \
        --checkpoint checkpoint/mgnns_tpu --text_only --port 8080
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MGNNS-TPU HTTP serving")
    p.add_argument("--data_root_path", type=str, default="data")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="engine checkpoint dir (with preproc artifacts)")
    p.add_argument("--from_exported", type=str, default=None,
                   help="serve a jax.export AOT artifact directory "
                        "(cli.predict --export_model) instead of an engine "
                        "checkpoint: no model code or re-trace at startup")
    p.add_argument("--text_only", action="store_true")
    p.add_argument("--pmi_phase", type=str, default="train")
    p.add_argument("--image_backend", type=str, default="pil",
                   choices=["pil", "synthetic"])
    p.add_argument("--image_root", type=str, default=".")
    p.add_argument("--init_from_reference", type=str, default=None,
                   help="serve weights imported from a reference torch "
                        "checkpoint (.pth[.tar]) instead of the Orbax state "
                        "in --checkpoint (fusion model only)")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_queue", type=int, default=256,
                   help="request-queue bound; a full queue answers 503 "
                        "(backpressure) instead of growing latency")
    p.add_argument("--request_timeout", type=float, default=60.0,
                   help="seconds a request may wait for its batch slot")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard serving batches over this many devices")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="shard gather tables / wide projections over this "
                        "many devices (training's model-parallel rules)")
    return p


def make_handler(frontend, model_name: str, text_only: bool,
                 request_timeout: float):
    from mgnns_tpu.serving import BatchingFrontend

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": model_name,
                                 "text_only": text_only, **frontend.stats()})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                records = payload if isinstance(payload, list) else payload.get("records", [])
                if not isinstance(records, list) or not records:
                    self._send(400, {"error": "body must be {'records': [...]} or a list"})
                    return
                out = frontend.submit(records, timeout=request_timeout)
                self._send(200, {"predictions": out})
            except json.JSONDecodeError as e:
                self._send(400, {"error": f"bad json: {e}"})
            except BatchingFrontend.Busy as e:
                self._send(503, {"error": str(e)})
            except TimeoutError as e:
                self._send(504, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):  # quiet request logging
            pass

    return Handler


def make_server(args) -> ThreadingHTTPServer:
    """Build the HTTP server (separated from main() so tests can drive it)."""
    from mgnns_tpu.serving import BatchingFrontend, Predictor

    if args.from_exported:
        from mgnns_tpu.export import load_exported

        predictor = load_exported(
            args.from_exported, image_root=args.image_root,
            image_backend=args.image_backend, strict_images=False)
        model_name = args.from_exported
    else:
        if not args.checkpoint:
            raise SystemExit(
                "--checkpoint is required (or pass --from_exported)")
        from mgnns_tpu.cli.predict import make_mesh

        predictor = Predictor.from_engine_artifacts(
            args.data_root_path, args.checkpoint, text_only=args.text_only,
            pmi_phase=args.pmi_phase, image_backend=args.image_backend,
            image_root=args.image_root, max_batch=args.max_batch,
            strict_images=False, reference_ckpt=args.init_from_reference,
            mesh=make_mesh(args),
        )
        model_name = args.checkpoint
    # precompile every batch bucket so no live request pays a jit compile
    predictor.warm()
    frontend = BatchingFrontend(predictor, max_queue=args.max_queue)
    handler = make_handler(frontend, model_name, predictor.text_only,
                           args.request_timeout)
    server = ThreadingHTTPServer((args.host, args.port), handler)
    server.daemon_threads = True
    return server


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    server = make_server(args)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  (POST /predict, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()

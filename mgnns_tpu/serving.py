"""Serving: load a trained model once, predict on raw (text, image) posts.

The reference has no inference API at all — prediction requires running the
full evaluation engine over a dataset on disk.  This module provides the
deployment path: a :class:`Predictor` that owns the preprocessing state
(vocab, PMI graph, transforms, constants) and a jitted batched forward, with
a fixed-size batch slot so every request shape hits the same compiled
program.

Usage::

    pred = Predictor.from_engine_artifacts(
        data_root, checkpoint_dir, text_only=False)
    out = pred.predict([{"text": "what a wonderful day", "image": "a.jpg"}])
    out[0] -> {"label": "happy", "probs": {...}}
"""

from __future__ import annotations

import json
import os
import random
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.config import DataConfig, ModelConfig, TextGraphConfig
from mgnns_tpu.data import images as I
from mgnns_tpu.data.text import build_text_side, encode_texts
from mgnns_tpu.graphs.pmi import PmiGraph
from mgnns_tpu.graphs.vocab import make_word_to_id


def resolve_batch_buckets(requested: list[int] | None, max_batch: int,
                          dsize: int = 1) -> list[int]:
    """Batch-size bucket ladder: a request for n records runs the smallest
    compiled batch >= n instead of always paying the full ``max_batch``
    forward (a 1-record fusion request was 16x the needed compute).  Each
    bucket is one jit specialization; ``Predictor.warm()`` precompiles them.

    Defaults to powers of 4 of the smallest mesh-divisible size, so every
    'data' axis gets real small-request buckets (starting at 1 and
    FILTERING by divisibility would degenerate to [max_batch] for e.g.
    dsize=8 or any non-power-of-4 axis)."""
    if requested is None:
        requested = []
        b = max(1, dsize)
        while b < max_batch:
            requested.append(b)
            b *= 4
    buckets = sorted({int(b) for b in requested} | {max_batch})
    for b in buckets:
        if b > max_batch or b % max(1, dsize) != 0:
            raise ValueError(
                f"batch bucket {b} invalid (max_batch {max_batch}, "
                f"mesh data axis {dsize})")
    return buckets


class Predictor:
    def __init__(
        self,
        *,
        vocab: list[str],
        graph,
        graph_cfg: TextGraphConfig,
        label_map: dict[str, int],
        apply_fn,
        params,
        batch_stats,
        image_size: int = 448,
        image_backend: str = "pil",
        image_root: str = ".",
        max_batch: int = 16,
        text_only: bool = False,
        strict_images: bool = True,
        mesh=None,
        batch_buckets: list[int] | None = None,
        decode_threads: int | None = None,
    ):
        self.vocab = vocab
        self.graph = graph
        self.graph_cfg = graph_cfg
        self.w2i = make_word_to_id(vocab)
        self.idx2label = {v: k for k, v in label_map.items()}
        self.params = params
        self.batch_stats = batch_stats
        self.image_size = image_size
        self.image_backend = image_backend
        self.image_root = image_root
        self.max_batch = max_batch
        self.text_only = text_only
        # strict: a missing/corrupt image raises instead of silently
        # substituting the deterministic synthetic fallback pixels
        self.strict_images = strict_images
        # image decode/resize runs on a thread pool (PIL releases the GIL
        # for decode + resample); serial decode was the dominant cost of a
        # fusion request (~35 ms/image at 448px)
        if decode_threads is None:
            decode_threads = min(8, os.cpu_count() or 4)
        self._decode_pool = (
            ThreadPoolExecutor(decode_threads) if decode_threads > 1 else None)
        # Multi-device inference: batches shard over the mesh's 'data' axis,
        # the big gather tables / wide projections shard over 'model' (the
        # same rules the training engine uses), small params replicate.  XLA
        # inserts the collectives.  The reference serves nothing at all, let
        # alone sharded (its DataParallel is commented out, engine/...:365).
        self.mesh = mesh
        if mesh is not None:
            from mgnns_tpu.parallel.sharding import (
                mgnns_param_rules, shard_pytree, text_model_param_rules)

            dsize = int(mesh.shape.get("data", 1))
            if max_batch % dsize != 0:
                raise ValueError(
                    f"max_batch {max_batch} must be a multiple of the "
                    f"mesh data axis ({dsize})")
            rules = (text_model_param_rules() if text_only
                     else mgnns_param_rules())
            self.params = shard_pytree(params, mesh, rules)
            self.batch_stats = shard_pytree(batch_stats, mesh, [])

        def fwd(p, bs, batch):
            logits = apply_fn(p, bs, batch)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._fwd = jax.jit(fwd)
        # Batch-size buckets: a request for n records runs the smallest
        # compiled batch >= n instead of always paying the full max_batch
        # forward (a 1-record fusion request was 16x the needed compute).
        # Each bucket is one jit specialization; ``warm()`` precompiles them.
        dsize = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        self.batch_buckets = resolve_batch_buckets(batch_buckets, max_batch, dsize)
        # per-stage latency of the most recent chunk (ms), for the serving
        # benchmark's committed breakdown (round-5 review item 2)
        self.last_timings: dict = {}

    # ------------------------------------------------------------- preproc

    def _encode_text(self, texts: list[str]):
        # shared with training (data/text.py) so preprocessing cannot diverge
        return encode_texts(texts, self.w2i, self.graph, self.graph_cfg)

    def _decode_one_image(self, i: int, rec: dict) -> np.ndarray:
        path = os.path.join(self.image_root, rec.get("image", ""))
        if self.strict_images and self.image_backend == "pil":
            try:
                from PIL import Image

                with Image.open(path) as im:
                    im.verify()
            except (FileNotFoundError, OSError) as e:
                raise ValueError(
                    f"record {i} (id={rec.get('id')!r}): image "
                    f"{path!r} is missing or unreadable ({e}); pass "
                    f"strict_images=False to substitute synthetic pixels"
                ) from e
        return I.load_image_uint8(
            path, size=self.image_size, train=False, rng=random.Random(0),
            backend=self.image_backend,
            sample_key=str(rec.get("id", rec.get("text", ""))),
        )

    def _encode_images(self, records: list[dict]):
        if self._decode_pool is not None and len(records) > 1:
            imgs = list(self._decode_pool.map(
                self._decode_one_image, range(len(records)), records))
        else:
            imgs = [self._decode_one_image(i, r) for i, r in enumerate(records)]
        return np.stack(imgs)

    # ------------------------------------------------------------- predict

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.max_batch

    def _encode_host(self, records: list[dict]):
        """HOST-side preprocessing of one chunk into a numpy batch of the
        smallest bucket size >= len(records): tokenize, decode images, pad.
        Only the real records are encoded; the pad slots repeat the last
        encoded ROW (cheap memcpy — the old path re-ran tokenization and
        image decode on duplicated records, so a 1-record fusion request
        paid 16 image decodes).  Pure numpy — safe to run on a pipeline
        thread (no JAX dispatch)."""
        for i, rec in enumerate(records):
            if "text" not in rec:
                raise ValueError(
                    f"record {i} (id={rec.get('id')!r}) has no 'text' field")
        n = len(records)
        B = self._bucket(n)
        pad = B - n

        def padrow(a: np.ndarray) -> np.ndarray:
            if pad == 0:
                return a
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

        t0 = time.perf_counter()
        ids, lens, mask, eids = self._encode_text([r["text"] for r in records])
        t1 = time.perf_counter()
        batch = {
            "ids": padrow(ids), "lens": padrow(lens),
            "mask": padrow(mask), "eids": padrow(eids),
        }
        t2 = t1
        if not self.text_only:
            imgs = self._encode_images(records)
            t2 = time.perf_counter()
            batch["image"] = padrow(imgs)
        self.last_timings["encode_text_ms"] = (t1 - t0) * 1e3
        self.last_timings["decode_images_ms"] = (t2 - t1) * 1e3
        return batch, n

    def _place(self, batch: dict) -> dict:
        """Device placement of a host batch (JAX dispatch — must run on the
        thread that owns the forward program)."""
        t0 = time.perf_counter()
        if self.mesh is not None:
            from mgnns_tpu.parallel.mesh import batch_device_put

            batch = batch_device_put(batch, self.mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.last_timings["place_dispatch_ms"] = (time.perf_counter() - t0) * 1e3
        return batch

    def _encode_batch(self, records: list[dict]):
        batch, n = self._encode_host(records)
        return self._place(batch), n

    def _format(self, probs: np.ndarray) -> list[dict]:
        results = []
        for row in probs:
            label_id = int(row.argmax())
            results.append({
                "label": self.idx2label[label_id],
                "label_id": label_id,
                "probs": {self.idx2label[j]: float(p) for j, p in enumerate(row)},
            })
        return results

    def predict(self, records: list[dict]) -> list[dict]:
        """records: list of {"text": str, "image": optional path, "id": optional}.
        Returns per record: {"label", "label_id", "probs": {name: p}}.

        Multi-chunk requests are PIPELINED: the device executes chunk i
        while the host preprocesses chunk i+1 (dispatch is async; the result
        readback is deferred one chunk), so host decode and TPU compute
        overlap instead of strictly alternating."""
        for i, rec in enumerate(records):
            if "text" not in rec:
                raise ValueError(
                    f"record {i} (id={rec.get('id')!r}) has no 'text' field")
        out: list[dict] = []
        pending = None  # (device probs, n) of the chunk in flight
        for i in range(0, len(records), self.max_batch):
            batch, n = self._encode_batch(records[i : i + self.max_batch])
            t0 = time.perf_counter()
            probs_dev = self._fwd(self.params, self.batch_stats, batch)
            self.last_timings["forward_dispatch_ms"] = (
                time.perf_counter() - t0) * 1e3
            if pending is not None:
                out.extend(self._format(np.asarray(pending[0])[: pending[1]]))
            pending = (probs_dev, n)
        if pending is not None:
            t0 = time.perf_counter()
            probs = np.asarray(pending[0])
            self.last_timings["readback_ms"] = (time.perf_counter() - t0) * 1e3
            out.extend(self._format(probs[: pending[1]]))
        return out

    def warm(self) -> None:
        """Precompile every batch bucket (and prime the host caches) so no
        live request pays a jit compile."""
        rec = {"text": "warmup"}
        if not self.text_only:
            rec["image"] = "__warmup__.jpg"
        strict, self.strict_images = self.strict_images, False
        try:
            for b in self.batch_buckets:
                self.predict([dict(rec) for _ in range(b)])
        finally:
            self.strict_images = strict

    # ---------------------------------------------------------- constructors

    @classmethod
    def from_engine_artifacts(
        cls,
        data_root: str,
        checkpoint_dir: str,
        *,
        text_only: bool = False,
        pmi_phase: str = "train",
        graph_cfg: TextGraphConfig | None = None,
        model_overrides: dict | None = None,
        image_backend: str = "pil",
        image_root: str = ".",
        max_batch: int = 16,
        step: int | None = None,
        strict_images: bool = True,
        reference_ckpt: str | None = None,
        mesh=None,
        batch_buckets: list[int] | None = None,
        decode_threads: int | None = None,
    ) -> "Predictor":
        """Restore a Predictor from an engine checkpoint.

        ``reference_ckpt``: serve weights imported from a reference torch
        checkpoint (``.pth[.tar]``, reference ``engine/...:624-643`` format)
        instead of an Orbax restore — ``checkpoint_dir`` then only supplies
        the preproc artifacts (or pass the data_root fallback).  Fusion
        model only.

        Preprocessing state (vocab, PMI graph, label map, graph config) is
        loaded from the ``preproc`` artifacts the training CLI persists next
        to the checkpoints — so deployment does not need (or re-scan) the
        training corpus and cannot silently drift from the ids training saw.
        Falls back to rebuilding from ``data_root`` for old checkpoints.
        """
        pre = load_preproc(checkpoint_dir)
        if pre is not None:
            vocab, graph, label_map, graph_cfg = pre
        else:
            graph_cfg = graph_cfg or TextGraphConfig()
            vocab, graph, _ = build_text_side(data_root, graph_cfg, [], pmi_phase=pmi_phase)
            with open(os.path.join(data_root, "label.json")) as f:
                label_map = json.load(f)

        from mgnns_tpu.engine.checkpoint import Checkpointer

        if text_only and reference_ckpt:
            raise ValueError("reference_ckpt holds the fusion model; "
                             "text_only cannot serve it")
        ckpt = None if reference_ckpt else Checkpointer(checkpoint_dir)
        if text_only:
            from mgnns_tpu.models import text_model_apply, text_model_init

            template_params = text_model_init(
                jax.random.key(0), len(vocab), len(label_map), graph.num_edges)
            raw = ckpt.restore(step)
            params = _conform(template_params, raw["params"])
            bstats = {}

            def apply_fn(p, bs, batch):
                return text_model_apply(p, batch, ngram=graph_cfg.ngram)

            image_size = 448
        else:
            from mgnns_tpu.data.dataset import load_constants
            from mgnns_tpu.models import mgnns_apply
            from mgnns_tpu.models.mgnns import mgnns_init_jitted

            overrides = dict(model_overrides or {})
            cfg = ModelConfig(
                num_labels=len(label_map), vocab_size=len(vocab),
                edges_num=graph.num_edges, **overrides)
            data_cfg = DataConfig(
                data_root_path=data_root,
                object_inp_name=os.path.join(data_root, "glove/object_glove_word2vec.pkl"),
                place_inp_name=os.path.join(data_root, "glove/place_glove_word2vec.pkl"),
                label_glove_name=os.path.join(data_root, "tumblr_label_glove.pkl"),
                object_adj_file=os.path.join(data_root, "adj/tumblr_objects_adj.pkl"),
                place_adj_file=os.path.join(data_root, "adj/tumblr_resnet50_places_adj.pkl"),
            )
            consts_np = load_constants(data_cfg, object_t=cfg.object_t, place_t=cfg.place_t)
            tparams, tbstats, consts = mgnns_init_jitted(
                jax.random.key(0), cfg, num_edges=graph.num_edges,
                label_embedding=consts_np["label_embedding"],
                object_A=consts_np["object_A"], place_A=consts_np["place_A"])
            if reference_ckpt:
                from mgnns_tpu.cli.main import load_torch_state_dict
                from mgnns_tpu.models.import_reference import import_reference_state_dict

                sd, _ = load_torch_state_dict(reference_ckpt)
                params, bstats = import_reference_state_dict(
                    sd, num_layers=cfg.num_layers,
                    bidirectional=cfg.bidirectional, stack_num=cfg.stack_num)
                if params["embedding"]["table"].shape[0] != len(vocab):
                    raise ValueError(
                        f"reference_ckpt vocab size "
                        f"{params['embedding']['table'].shape[0]} != serving "
                        f"vocab {len(vocab)}")
            else:
                raw = ckpt.restore(step)
                params = _conform(tparams, raw["params"])
                bstats = _conform(tbstats, raw["batch_stats"])
            if mesh is not None:
                # committed-to-one-device constants inside a mesh-sharded
                # program would pin the computation there — replicate instead
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(mesh, PartitionSpec())
                object_inp = jax.device_put(consts_np["object_inp"], rep)
                place_inp = jax.device_put(consts_np["place_inp"], rep)
                consts = jax.device_put(consts, rep)
            else:
                object_inp = jax.device_put(consts_np["object_inp"])
                place_inp = jax.device_put(consts_np["place_inp"])

            def apply_fn(p, bs, batch):
                full = dict(batch)
                full["object_inp"] = object_inp
                full["place_inp"] = place_inp
                logits, _, _ = mgnns_apply(p, bs, consts, full, cfg=cfg, train=False)
                return logits

            image_size = cfg.image_size

        return cls(
            vocab=vocab, graph=graph, graph_cfg=graph_cfg, label_map=label_map,
            apply_fn=apply_fn, params=params, batch_stats=bstats,
            image_size=image_size, image_backend=image_backend,
            image_root=image_root, max_batch=max_batch, text_only=text_only,
            strict_images=strict_images, mesh=mesh,
            batch_buckets=batch_buckets, decode_threads=decode_threads,
        )


class BatchingFrontend:
    """Bounded-queue micro-batching around a :class:`Predictor`.

    TWO pipeline stages (round-5: decode-ahead across request groups):

    - the ENCODE thread coalesces queued requests into groups (up to the
      Predictor's ``max_batch`` records) and runs the HOST preprocessing
      (tokenize + image decode — pure numpy, no JAX dispatch) one group
      AHEAD of the device;
    - the DEVICE thread owns every JAX call (placement, forward, readback —
      dispatch is not thread-safe against execution over the axon tunnel).
      It defers each group's blocking readback until the NEXT group's
      forward is dispatched, so H2D + TPU compute of group k+1 overlap the
      readback/format/delivery of group k; when the pipe is empty it
      finalizes immediately (no idle-traffic latency penalty).

    Under sustained load the group period approaches
    max(host decode, H2D, device forward) instead of their SUM.  The queue
    bound provides backpressure — a full queue rejects immediately (HTTP
    503 upstream) instead of letting latency grow without limit.  Request
    latencies are kept in a ring buffer for p50/p99 reporting (``stats``).
    """

    def __init__(self, predictor: Predictor, max_queue: int = 256):
        import collections
        import queue
        import threading

        self.predictor = predictor
        self.max_queue = max_queue
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        # encoded groups awaiting the device; depth 2 = one group decoding
        # ahead while one waits — deeper only adds latency under overload
        self._encoded_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._latencies = collections.deque(maxlen=1024)
        self._count = 0
        self._lock = threading.Lock()
        # encoded chunks handed to the device and not yet finished — the
        # encoder's coalescing signal (see _encode_loop)
        self._inflight = 0
        # wakes the coalescing encoder when either a new request arrives or
        # an in-flight chunk finishes (instead of 1 kHz queue polling)
        self._wake = threading.Condition(self._lock)
        self._encoder = threading.Thread(target=self._encode_loop, daemon=True)
        self._worker = threading.Thread(target=self._device_loop, daemon=True)
        self._encoder.start()
        self._worker.start()

    def _item_done(self) -> None:
        with self._lock:
            self._inflight -= 1
            self._wake.notify_all()

    class Busy(RuntimeError):
        pass

    def submit(self, records: list[dict], timeout: float = 60.0) -> list[dict]:
        import queue
        import threading
        import time

        if not records:
            return []  # zero chunks would otherwise never set ``done``
        done = threading.Event()
        slot: dict = {}
        t0 = time.perf_counter()
        try:
            self._q.put((records, slot, done), block=False)
        except queue.Full:
            raise self.Busy(f"request queue full ({self.max_queue})")
        with self._lock:
            self._wake.notify_all()  # a coalescing encoder absorbs it now
        if not done.wait(timeout):
            slot["abandoned"] = True  # worker will drop the result
            raise TimeoutError(f"prediction not ready within {timeout}s")
        with self._lock:
            self._latencies.append(time.perf_counter() - t0)
            self._count += 1
        if "error" in slot:
            raise slot["error"]
        return slot["out"]

    def _encode_loop(self) -> None:
        """Stage 1: coalesce requests into groups and host-encode them one
        group ahead of the device (numpy only — no JAX dispatch here)."""
        import queue

        carry = None  # request that didn't fit the previous group
        while True:
            first = carry if carry is not None else self._q.get()
            carry = None
            # drop requests whose client already timed out (``abandoned``):
            # computing answers nobody reads under overload is the
            # positive-feedback loop that keeps the queue saturated
            if first[1].get("abandoned"):
                continue
            group = [first]
            n = len(first[0])
            # coalesce whatever is already waiting, up to one device batch —
            # never past it: overflowing the group would chain extra
            # fixed-shape forwards that every coalesced client (including
            # ones that fit the first pass) must wait for.  While >= 2
            # groups are already in flight (device busy + one decoding
            # ahead) there is nothing to gain from shipping another tiny
            # group, so keep absorbing arrivals — the eager round-5 encode
            # thread otherwise sliced concurrent 1-record requests into
            # per-record forwards, each paying the tunnel's ~25 ms RTT;
            # with the pipe hungry, ship immediately (no idle-latency tax).
            while n < self.predictor.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    with self._lock:
                        if self._inflight < 2:
                            break  # the device needs feeding: ship now
                        # block until a request arrives or a chunk finishes
                        # (submit/_item_done notify); timeout is a safety net
                        self._wake.wait(timeout=0.05)
                    continue
                if nxt[1].get("abandoned"):
                    continue
                if n + len(nxt[0]) > self.predictor.max_batch:
                    carry = nxt  # leads the next group instead
                    break
                group.append(nxt)
                n += len(nxt[0])
            all_records = [r for recs, _, _ in group for r in recs]
            # a single client request may exceed max_batch: encode it as
            # several device chunks sharing one accumulator — the device
            # thread delivers when the last chunk's probs arrive
            acc = {"probs": [], "need": 0, "failed": False}
            try:
                mb = self.predictor.max_batch
                chunks = [all_records[i : i + mb]
                          for i in range(0, len(all_records), mb)]
                acc["need"] = len(chunks)
                for chunk in chunks:
                    np_batch, n_real = self.predictor._encode_host(chunk)
                    # count BEFORE handing over: the device thread can
                    # consume and _item_done the chunk between put and a
                    # late increment, driving the counter transiently
                    # negative and breaking the busy<2 coalescing signal
                    with self._lock:
                        self._inflight += 1
                    try:
                        self._encoded_q.put((group, np_batch, n_real, acc))
                    except BaseException:
                        self._item_done()
                        raise
            except Exception as e:  # deliver the failure to every waiter
                acc["failed"] = True  # chunks already enqueued are dropped
                self._deliver_error(group, e)

    @staticmethod
    def _deliver_error(group, e: Exception) -> None:
        for _, slot, done in group:
            slot["error"] = e
            done.set()

    def _deliver(self, group, probs: np.ndarray) -> None:
        outs = self.predictor._format(probs)
        i = 0
        for recs, slot, done in group:
            slot["out"] = outs[i : i + len(recs)]
            i += len(recs)
            done.set()

    def _finalize(self, pending) -> None:
        """Block on one in-flight chunk's readback; deliver its group once
        the accumulator holds every chunk."""
        group, probs_dev, n_real, acc = pending
        try:
            if acc["failed"]:
                return
            try:
                acc["probs"].append(np.asarray(probs_dev)[:n_real])
                if len(acc["probs"]) == acc["need"]:
                    self._deliver(group, np.concatenate(acc["probs"]))
            except Exception as e:
                acc["failed"] = True
                self._deliver_error(group, e)
        finally:
            self._item_done()

    def _device_loop(self) -> None:
        """Stage 2: the ONLY thread that touches JAX.  Dispatch chunk k+1's
        placement+forward before blocking on chunk k's readback; finalize
        immediately when nothing else is queued."""
        import queue

        pred = self.predictor
        pending = None  # (group, device probs, n_real, acc) in flight
        while True:
            if pending is not None:
                try:
                    item = self._encoded_q.get_nowait()
                except queue.Empty:
                    # pipe empty: finish the in-flight chunk now rather than
                    # holding its clients hostage to future traffic
                    self._finalize(pending)
                    pending = None
                    continue
            else:
                item = self._encoded_q.get()
            group, np_batch, n_real, acc = item
            if acc["failed"]:
                self._item_done()
                continue
            # encode ran ahead of the device — re-check for clients that
            # timed out while their encoded chunk sat in the pipe (computing
            # answers nobody reads is the overload feedback loop)
            if all(slot.get("abandoned") for _, slot, _ in group):
                self._item_done()
                continue
            try:
                batch = pred._place(np_batch)
                probs_dev = pred._fwd(pred.params, pred.batch_stats, batch)
            except Exception as e:
                acc["failed"] = True
                self._deliver_error(group, e)
                self._item_done()
                continue
            if pending is not None:
                self._finalize(pending)
            pending = (group, probs_dev, n_real, acc)

    def stats(self) -> dict:
        import numpy as _np

        with self._lock:
            lat = list(self._latencies)
            count = self._count
            inflight = self._inflight
        # backlog = raw requests + encoded chunks awaiting/on the device;
        # counting only _q hid up to ~3 device batches of real work
        out = {"requests": count, "queue_depth": self._q.qsize(),
               "inflight_chunks": inflight}
        if lat:
            ms = _np.array(lat) * 1e3
            out["latency_ms"] = {
                "p50": round(float(_np.percentile(ms, 50)), 2),
                "p99": round(float(_np.percentile(ms, 99)), 2),
                "max": round(float(ms.max()), 2),
            }
        return out


PREPROC_NPZ = "preproc.npz"
PREPROC_JSON = "preproc.json"


def save_preproc(checkpoint_dir: str, vocab, graph, label_map, graph_cfg) -> None:
    """Persist the preprocessing state alongside engine checkpoints (called
    by the training CLI) so serving is self-contained."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    np.savez_compressed(os.path.join(checkpoint_dir, PREPROC_NPZ),
                        keys=graph.keys, pmi=graph.pmi,
                        vocab_size=graph.vocab_size)
    with open(os.path.join(checkpoint_dir, PREPROC_JSON), "w") as f:
        json.dump({
            "vocab": vocab, "label_map": label_map,
            "graph_cfg": {
                "text_min_count": graph_cfg.text_min_count,
                "window_size": graph_cfg.window_size,
                "ngram": graph_cfg.ngram,
                "min_cooccurrence": graph_cfg.min_cooccurrence,
                "max_len": graph_cfg.max_len,
            },
        }, f)


def load_preproc(checkpoint_dir: str):
    """(vocab, graph, label_map, graph_cfg) or None when absent."""
    npz_path = os.path.join(checkpoint_dir, PREPROC_NPZ)
    json_path = os.path.join(checkpoint_dir, PREPROC_JSON)
    if not (os.path.exists(npz_path) and os.path.exists(json_path)):
        return None
    z = np.load(npz_path)
    graph = PmiGraph(int(z["vocab_size"]), z["keys"], z["pmi"])
    with open(json_path) as f:
        meta = json.load(f)
    return (meta["vocab"], graph, meta["label_map"],
            TextGraphConfig(**meta["graph_cfg"]))


def _conform(template, raw):
    """Shape a template-free Orbax restore onto the model's pytree structure.

    Engine checkpoints also contain opt_state, which serving ignores; and a
    template-free restore may represent list nodes as {'0': ..., '1': ...}
    dicts.  Walk the template and pick the matching leaf from ``raw``.
    """
    def pick(node, key):
        if isinstance(node, dict):
            return node[key] if key in node else node[str(key)]
        return node[int(key)]

    def walk(tmpl, node):
        if isinstance(tmpl, dict):
            return {k: walk(v, pick(node, k)) for k, v in tmpl.items()}
        if isinstance(tmpl, (list, tuple)):
            seq = [walk(v, pick(node, i)) for i, v in enumerate(tmpl)]
            return type(tmpl)(seq) if isinstance(tmpl, tuple) else seq
        return jnp.asarray(node)

    return walk(template, raw)

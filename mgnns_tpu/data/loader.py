"""Device loader: threaded image decode + static-shape batches + prefetch.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
workers (``engine/...:329-342``).  Design:

- text tensors are sliced from the split's prebuilt arrays (zero per-item
  Python);
- image decode runs in a thread pool overlapping device execution;
- every batch has the same static shape: the final ragged batch is padded
  and masked via ``weight`` (so jit compiles exactly one program);
- batches are placed on device asynchronously (``jax.device_put``) one step
  ahead of consumption (double buffering);
- optionally the whole split lives in HBM: ``device_images`` /
  ``device_text`` upload the pixel / text arrays once as [N, ...] tables
  and gather each batch on device by sample index, so per-step H2D shrinks
  to a [B] index vector;
- with default placement, per-batch [B] vectors (weight/label/sample_index)
  stay host numpy so epoch accounting never blocks on a device readback.
"""

from __future__ import annotations

import functools
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.data.dataset import TumblrDataset


@jax.jit
def _take_rows(table, idx):
    """Row gather via a 2D-reshaped take.  XLA:TPU lowers the native
    N-d row gather poorly for large rows (measured 27.3 ms for 128 rows of
    448px uint8 pixels); the same gather on a [N, row_bytes] view runs in
    7.1 ms.

    ONLY for small-row tables: when rows are large the in-program
    ``table.reshape`` is NOT free — XLA materializes a layout copy of the
    whole table plus the reshaped view as HLO temps (measured 7.56 G +
    5.67 G extra for a 5.67 G pixel table — a 3.3x blowup that OOMs the
    chip).  Big tables must be STORED 2D and gathered with
    ``_take_rows_flat`` instead."""
    flat = table.reshape(table.shape[0], -1)
    out = jnp.take(flat, idx, axis=0)
    return out.reshape((idx.shape[0],) + table.shape[1:])


@functools.partial(jax.jit, static_argnums=(2,))
def _take_rows_flat(table2d, idx, row_shape: tuple):
    """Row gather from a table STORED as [N, row_elems]: no in-program
    full-table reshape/copy — only the gathered [B, row] batch is reshaped
    back to its logical [B, *row_shape]."""
    out = jnp.take(table2d, idx, axis=0)
    return out.reshape((idx.shape[0],) + row_shape)


def _slice_rows_jit(table, start, size: int, row_shape):
    out = jax.lax.dynamic_slice_in_dim(table, start, size, axis=0)
    if row_shape is not None:
        out = out.reshape((size,) + row_shape)
    return out


_slice_rows_jit = jax.jit(_slice_rows_jit, static_argnums=(2, 3))


def _slice_rows(table, start: int, size: int, row_shape: tuple | None = None):
    """Contiguous-range fast path: 2.4 ms for the same 128 rows (11.6x the
    native gather).  Only valid for a full in-bounds ascending run."""
    return _slice_rows_jit(table, jnp.int32(start), size, row_shape)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(table2d, chunk2d, start):
    """In-place row-range write into a donated device table (XLA aliases the
    donated input's buffer, so the 6 GB table is NOT copied per chunk)."""
    return jax.lax.dynamic_update_slice(table2d, chunk2d,
                                        (start, jnp.int32(0)))


def _build_image_table_pipelined(ds, num_threads: int, chunk_rows: int = 128):
    """Decode/upload-overlapped pixel-table build: host threads decode chunk
    k+1 while chunk k's H2D streams, writing into a preallocated device
    table via donated in-place row updates.

    Replaces the monolithic decode-everything -> stack -> one 6 GB
    device_put, which serialized ~97 s of host decode BEFORE ~204 s of
    upload at the tunnel's measured 28 MB/s ceiling
    (results/r5/warmup_breakdown_*.json) and spiked host RSS by the full
    table size.  Pipelined, the build approaches max(decode, upload) and
    holds only ~2 chunks of pixels on the host.

    The tail chunk is start-shifted to keep ONE compiled write shape: rows
    it re-covers are rewritten with identical pixels (device tables require
    deterministic per-sample pixels — enforced at loader construction).
    """
    import queue
    import threading

    N = len(ds)
    probe = ds.load_image(0)
    row_shape = probe.shape
    C = min(chunk_rows, N)
    starts = list(range(0, max(N - C, 0) + 1, C))
    if starts[-1] + C < N:
        starts.append(N - C)  # shifted tail: uniform [C, row] writes

    q: queue.Queue = queue.Queue(maxsize=2)
    dead = threading.Event()  # consumer gone: producer must exit, not block

    def _put(item) -> bool:
        # bounded put that gives up if the consumer died (e.g. device_put
        # OOM mid-build) — a plain q.put would park this thread forever
        # with the decode pool and ~2 pinned pixel chunks leaked
        import queue as _queue

        while not dead.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False

    def produce():  # host-only: no JAX dispatch off the consumer thread
        pool = ThreadPoolExecutor(num_threads)
        try:
            for s in starts:
                rows = list(pool.map(ds.load_image, range(s, s + C)))
                arr = np.stack(rows)
                if not _put((s, arr.reshape(C, -1))):
                    return
            _put(None)
        except BaseException as e:
            _put(e)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    threading.Thread(target=produce, daemon=True).start()

    table = jnp.zeros((N, int(np.prod(row_shape))), probe.dtype)
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            s, chunk2d = item
            table = _write_rows(table, jax.device_put(chunk2d), jnp.int32(s))
    finally:
        dead.set()
    return table, row_shape


def _gather_rows(table, idx_np: np.ndarray, row_shape: tuple | None = None):
    """Batch row gather.  ``row_shape`` set means ``table`` is stored
    flattened as [N, prod(row_shape)] (the layout that keeps XLA from
    copying the whole table — see ``_take_rows``); the gathered rows come
    back as [B, *row_shape] either way."""
    B = len(idx_np)
    if B and idx_np[0] + B - 1 == idx_np[-1] and \
            np.array_equal(idx_np, np.arange(idx_np[0], idx_np[0] + B)):
        return _slice_rows(table, int(idx_np[0]), B, row_shape)
    if row_shape is not None:
        return _take_rows_flat(table, jnp.asarray(idx_np), row_shape)
    return _take_rows(table, jnp.asarray(idx_np))


class DeviceLoader:
    def __init__(
        self,
        dataset: TumblrDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        num_threads: int = 8,
        with_images: bool = True,
        device_put=None,
        cache_device_batches: bool = False,
        cache_budget_bytes: int | None = None,
        device_images: bool = False,
        device_text: bool = False,
        num_batches: int | None = None,
        mesh=None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # Multi-host SPMD: every process must run the SAME number of jitted
        # steps per epoch or the host with extra batches blocks forever in
        # its collectives.  ``num_batches`` forces the epoch length: a host
        # whose data runs out emits fully-padded batches (``weight`` all
        # zero, so they contribute nothing to loss/metrics — other hosts'
        # rows of the same global step still carry real samples).
        natural = (len(dataset) + batch_size - 1) // batch_size
        if num_batches is not None and num_batches < natural:
            raise ValueError(
                f"num_batches={num_batches} < {natural} batches of data")
        self.num_batches = num_batches if num_batches is not None else natural
        self.seed = seed
        self.epoch = 0
        self.num_threads = num_threads
        self.with_images = with_images
        # hook for sharded placement (parallel.mesh.batch_device_put)
        self._device_put = device_put or jax.device_put
        # Static eval sets: keep the device-resident batches from the first
        # epoch and replay them (valid only without shuffling/augmentation;
        # TumEmo val = 10k x 448px uint8 ~= 6 GB, fits v5e HBM).
        if cache_device_batches and shuffle:
            raise ValueError("cache_device_batches requires shuffle=False")
        self.cache_device_batches = cache_device_batches
        # Bounded cache: stop caching once the stored batches exceed this
        # many bytes (None = unlimited).  A PARTIAL cache is fine — replay
        # epochs yield the cached prefix from HBM and stream the tail
        # through the normal producer path, so a big eval split degrades to
        # "cache what fits" instead of exhausting HBM mid-training (the
        # failure mode: a 6 GB pixel table + a 6 GB eval cache on one chip).
        self.cache_budget_bytes = cache_budget_bytes
        self._device_cache: list | None = [] if cache_device_batches else None
        self._cache_bytes = 0
        self._cache_complete = False
        self._cache_stopped = False
        # Device-resident images: upload the split's pixels ONCE as one
        # [N, H, W, 3] table and gather each batch on device by index.
        # Per-step host->device image traffic disappears (only tiny text
        # tensors ship), which both removes the H2D bottleneck and sidesteps
        # per-transfer client-side buffer overhead.  Valid under the same
        # condition as the dataset's decoded-image cache (deterministic
        # pixels per sample: eval transforms, or the synthetic backend).
        if device_images and not dataset.cacheable_images():
            raise ValueError(
                "device_images requires deterministic per-sample pixels "
                "(eval transforms or the synthetic backend)")
        self.device_images = device_images and with_images
        self._image_table = None
        # Device-resident TEXT tables: the split's ids/lens/mask/eids are
        # static, so they can live in HBM as [N, ...] tables too (a few
        # KB/sample) and be gathered per batch by sample index on device.
        # With device_images as well, a live batch ships only the [B] index
        # + tiny host-side vectors.  Unlike device_images this is valid for
        # SHUFFLED training (text tensors are always deterministic).
        #
        # Placement has two modes:
        # - default (mesh=None): tables are committed to the default device
        #   and gathered eagerly per batch; incompatible with a sharded
        #   ``device_put`` hook (the committed tables can't feed mesh
        #   batches);
        # - SPMD (mesh=...): tables shard position-major over the mesh's
        #   'data' axis (``parallel.input.InputPlan``) and every batch is
        #   gathered shard-locally inside the fused whole-epoch program —
        #   the same zero-per-step-H2D pipeline, now multi-chip/multi-host.
        #   Streaming iteration (the fused-compile-failure fallback) ignores
        #   the tables and assembles host batches for the device_put hook.
        if device_text and device_put is not None and mesh is None:
            raise ValueError(
                "device_text requires default device placement "
                "(incompatible with sharded/multihost device_put hooks) — "
                "pass mesh=... for SPMD table sharding")
        self.device_text = device_text
        self._text_tables = None
        self._input_plan = None
        # an SPMD plan exists only when the fused epoch can actually use it
        # (text tables are required; pixels ride along when device_images) —
        # a mesh + device_images-only loader streams host batches instead
        if mesh is not None and device_text:
            from mgnns_tpu.parallel.input import make_input_plan

            self._input_plan = make_input_plan(
                mesh, len(dataset), batch_size,
                n_global=getattr(dataset, "global_len", None) or len(dataset))
            if self._input_plan.num_batches > self.num_batches:
                raise ValueError(
                    f"sharded input plan needs {self._input_plan.num_batches}"
                    f" batches/epoch but num_batches={self.num_batches}")
        # streaming-path table flags: under a mesh the tables only feed the
        # fused epoch plan; __iter__ falls back to full host assembly
        self._stream_device_text = self.device_text and mesh is None
        self._stream_device_images = self.device_images and mesh is None
        # With default placement, per-batch [B]-sized vectors (weight,
        # label, sample_index) stay host numpy in the yielded dict: jitted
        # steps upload them per call (~1 KB), and host-side consumers
        # (epoch sample counters, prediction collection) read them for free
        # instead of paying a blocking device readback every step.
        self._host_small = device_put is None
        self._HOST_KEYS = ("weight", "label", "sample_index")

    def __len__(self) -> int:
        return self.num_batches

    def _all_padding_batch(self) -> dict:
        """A fully-padded batch for a loader whose dataset slice is EMPTY.

        Multihost forces the same per-epoch step count on every host
        (``num_batches``), and a host whose contiguous sample range came up
        empty (global N < process_count) must still feed the global SPMD
        program batches of the right static shape.  Shapes come from the
        dataset's metadata (``max_len``/window width are global config, so
        they match the other hosts); ``lens`` is 1 — a PAD-only doc, the
        same shape real tail-padding produces — so the compute stays finite
        and, with ``weight`` all zero, contributes nothing to loss/metrics."""
        B = self.batch_size
        t = self.ds.text
        lens = np.ones((B,), np.int32)
        batch = {
            "label": np.zeros((B,), np.int32),
            "weight": np.zeros((B,), np.float32),
            "sample_index": np.zeros((B,), np.int32),
        }
        if not self._stream_device_text:
            L, W = t.ids.shape[1], t.eids.shape[2]
            batch["ids"] = np.zeros((B, L), np.int32)
            batch["lens"] = lens
            batch["mask"] = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
            batch["eids"] = np.zeros((B, L, W), np.int32)
        if self.with_images and not self._stream_device_images:
            s = self.ds.image_size
            dt = np.uint8 if getattr(self.ds, "pixel_format", "uint8") == "uint8" else np.float32
            batch["image"] = np.zeros((B, s, s, 3), dt)
        return batch

    def _assemble(self, idx: np.ndarray, pool: ThreadPoolExecutor | None, rng: random.Random,
                  n_valid: int | None = None):
        B = self.batch_size
        if len(idx) == 0:
            return self._all_padding_batch()
        n = len(idx) if n_valid is None else n_valid
        pad = B - len(idx)
        full_idx = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        batch = {
            "label": self.ds.labels[full_idx],
            "weight": (np.arange(B) < n).astype(np.float32),
            "sample_index": full_idx.astype(np.int32),
        }
        if not self._stream_device_text:
            t = self.ds.text
            batch["ids"] = t.ids[full_idx]
            batch["lens"] = t.lens[full_idx]
            batch["mask"] = t.mask[full_idx]
            batch["eids"] = t.eids[full_idx]
        if self.with_images and not self._stream_device_images:
            seeds = [random.Random(rng.getrandbits(32)) for _ in full_idx]
            if pool is not None:
                imgs = list(pool.map(self.ds.load_image, full_idx, seeds))
            else:
                imgs = [self.ds.load_image(i, r) for i, r in zip(full_idx, seeds)]
            batch["image"] = np.stack(imgs)
        return batch

    def _ensure_image_table(self):
        """Upload the whole split's pixels once as a device table (runs on
        the consumer thread — JAX dispatch is not safe from the producer).
        Returns ``(table2d, row_shape)``: the table is stored FLATTENED as
        uint8 [N, H*W*3] so per-batch gathers never trigger XLA's
        whole-table layout copy (a 3.3x HBM blowup at 448px, see
        ``_take_rows``), and the natural 2D layout also avoids the 1.3x
        tile-padding a [N,H,W,3] u8 array pays on TPU.  Cached ON THE
        DATASET so every loader over the same split (train/val/test
        ablations) shares one HBM copy."""
        if self._image_table is None:
            entry = getattr(self.ds, "_device_image_table", None)
            if entry is None:
                entry = _build_image_table_pipelined(self.ds, self.num_threads)
                self.ds._device_image_table = entry
            self._image_table = entry
        return self._image_table

    def _ensure_text_tables(self):
        """Upload the split's text tensors once as device tables, shared
        across loaders over the same dataset (like the pixel table)."""
        if self._text_tables is None:
            tabs = getattr(self.ds, "_device_text_tables", None)
            if tabs is None:
                t = self.ds.text
                tabs = {"ids": jax.device_put(t.ids),
                        "lens": jax.device_put(t.lens),
                        "mask": jax.device_put(t.mask),
                        "eids": jax.device_put(t.eids),
                        # labels ride along for fused whole-epoch scans,
                        # where the loss needs them on device per batch
                        "label": jax.device_put(self.ds.labels)}
                self.ds._device_text_tables = tabs
            self._text_tables = tabs
        return self._text_tables

    def _sharded_table_cache(self) -> dict:
        """Per-dataset cache of mesh-sharded tables, so every loader over the
        same split (train/val/test ablations) shares one sharded copy."""
        cache = getattr(self.ds, "_sharded_tables", None)
        if cache is None:
            cache = self.ds._sharded_tables = {}
        return cache

    def _plan_cache_key(self, kind: str) -> tuple:
        p = self._input_plan
        return (kind, id(p.mesh), p.S, tuple(p.local_positions.tolist()))

    def _ensure_text_tables_sharded(self) -> dict:
        """Position-major text tables sharded P('data', ...) over the mesh
        (see ``parallel.input``): device(s) at data position d hold exactly
        their own samples' rows.  Shared per dataset like the default-device
        tables."""
        if self._text_tables is None:
            cache = self._sharded_table_cache()
            key = self._plan_cache_key("text")
            tabs = cache.get(key)
            if tabs is None:
                from mgnns_tpu.parallel.input import shard_table

                rows = self._input_plan.local_table_rows()
                t = self.ds.text
                src = {"ids": t.ids, "lens": t.lens, "mask": t.mask,
                       "eids": t.eids, "label": self.ds.labels}
                tabs = {k: shard_table(self._input_plan, v[rows])
                        for k, v in src.items()}
                cache[key] = tabs
            self._text_tables = tabs
        return self._text_tables

    def _ensure_image_table_sharded(self):
        """Position-major pixel table, stored flattened [rows, H*W*3] (same
        rationale as ``_ensure_image_table``) and sharded P('data', None)."""
        if self._image_table is None:
            cache = self._sharded_table_cache()
            key = self._plan_cache_key("image")
            entry = cache.get(key)
            if entry is None:
                from mgnns_tpu.parallel.input import shard_table

                rows = self._input_plan.local_table_rows()
                pool = ThreadPoolExecutor(self.num_threads)
                try:
                    imgs = list(pool.map(self.ds.load_image, rows))
                finally:
                    pool.shutdown(wait=False)
                arr = np.stack(imgs)
                row_shape = arr.shape[1:]
                entry = (shard_table(self._input_plan,
                                     arr.reshape(arr.shape[0], -1)), row_shape)
                cache[key] = entry
            self._image_table = entry
        return self._image_table

    def _gather_tables(self, out: dict) -> dict:
        """On-device gather of table-resident tensors for one batch (used at
        placement time and when replaying table-free cached batches).
        Contiguous index runs (unshuffled epochs) take the dynamic-slice
        fast path; everything else the 2D-reshaped take."""
        idx_np = np.asarray(out["sample_index"])
        if self._stream_device_text:
            tabs = self._ensure_text_tables()
            for k in ("ids", "lens", "mask", "eids"):
                out[k] = _gather_rows(tabs[k], idx_np)
        if self._stream_device_images:
            table2d, row_shape = self._ensure_image_table()
            out["image"] = _gather_rows(table2d, idx_np, row_shape)
        return out

    def _epoch_chunks(self):
        """This epoch's batch index chunks [(indices, forced_n_valid)],
        advancing the epoch counter (shuffle order differs per epoch)."""
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        chunks = [(order[i : i + self.batch_size], None)
                  for i in range(0, len(order), self.batch_size)]
        # forced epoch length: all-padding batches past the data's end
        chunks += [(order[-1:], 0)] * (self.num_batches - len(chunks))
        return chunks

    def rewind_epoch(self) -> None:
        """Un-consume one epoch: a caller that built (and then discarded) an
        ``epoch_plan`` without training on it calls this before falling back
        to streaming iteration, so the fallback epoch replays the SAME
        shuffle/augmentation streams the plan would have used (otherwise a
        fused-compile failure silently offsets every later epoch's order by
        one, breaking seed determinism against a run that never fused)."""
        self.epoch = max(0, self.epoch - 1)

    def epoch_plan(self) -> dict | None:
        """Fused-epoch handoff: when the split is fully device-resident
        (``device_text`` and, if images are used, ``device_images``), one
        epoch is described by the resident tables plus a [num_batches, B]
        sample-index matrix and weight matrix — the engine runs the whole
        epoch as a single ``lax.scan`` program, gathering every batch on
        device.  Returns None when the loader must stream (then the
        engine falls back to per-batch iteration).  Advances the epoch
        counter like an iteration would.

        Under a mesh the plan is SPMD: tables shard position-major over the
        'data' axis and the index/weight matrices are placed P(None, 'data')
        with POSITION-LOCAL row ids, so the engine's fused scan gathers each
        batch shard-locally (``parallel.input.sharded_gather_fn``) with zero
        collectives in the input path."""
        if not (self.device_text
                and (self.device_images or not self.with_images)):
            return None
        if self._input_plan is not None:
            return self._epoch_plan_sharded()
        if not self._host_small:
            return None
        chunks = self._epoch_chunks()
        B = self.batch_size
        idx = np.zeros((len(chunks), B), np.int32)
        wt = np.zeros((len(chunks), B), np.float32)
        for i, (chunk, n_valid) in enumerate(chunks):
            n = len(chunk) if n_valid is None else n_valid
            pad = B - len(chunk)
            full = (np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
                    if pad else chunk)
            idx[i] = full
            wt[i] = np.arange(B) < n
        tables = dict(self._ensure_text_tables())
        row_shapes = {}
        if self.device_images:
            tables["image"], row_shapes["image"] = self._ensure_image_table()
        return {"tables": tables, "idx": idx, "weight": wt,
                "labels": self.ds.labels[idx], "row_shapes": row_shapes}

    def _epoch_plan_sharded(self) -> dict:
        """The SPMD epoch plan (see ``epoch_plan``).  Host-side keys carry
        this process's column blocks only (``weight_host``/``labels``/
        ``rows_host``); global accounting (sample count, per-batch weight
        sums) is derived from the plan's global position_valid so it needs
        no cross-host exchange."""
        from mgnns_tpu.parallel.input import epoch_index_plan, shard_epoch_matrix

        plan = self._input_plan
        epoch = self.epoch
        self.epoch += 1
        idx, wt, rows = epoch_index_plan(plan, epoch, self.seed, self.shuffle)
        wsums = plan.batch_weight_sums()
        if self.num_batches > plan.num_batches:
            # a forced epoch length (multihost step-count alignment) beyond
            # the plan's natural batches: append all-padding batches
            pad = self.num_batches - plan.num_batches
            idx = np.concatenate([idx, np.zeros((pad,) + idx.shape[1:], idx.dtype)])
            wt = np.concatenate([wt, np.zeros((pad,) + wt.shape[1:], wt.dtype)])
            rows = np.concatenate([rows, np.zeros((pad,) + rows.shape[1:], rows.dtype)])
            wsums = np.concatenate([wsums, np.zeros(pad, wsums.dtype)])
        tables = dict(self._ensure_text_tables_sharded())
        row_shapes = {}
        if self.device_images:
            tables["image"], shape = self._ensure_image_table_sharded()
            row_shapes["image"] = shape
        return {
            "tables": tables,
            "idx": shard_epoch_matrix(plan, idx),
            "weight": shard_epoch_matrix(plan, wt),
            "row_shapes": row_shapes,
            "mesh": plan.mesh,
            "sharded": True,
            # the REAL processed count: equals n_global under multihost, but
            # a single-process pre-sliced dataset (n_local < global_len)
            # only processes its slice
            "n_samples": int(plan.position_valid.sum()),
            "batch_weight_sums": wsums,
            "weight_host": wt,
            "labels": self.ds.labels[rows],
            "rows_host": rows,
        }

    def __iter__(self) -> Iterator[dict]:
        """Producer-thread iteration: batch assembly + H2D placement run on a
        background thread feeding a bounded queue, fully overlapping host
        work with device execution on the consumer side."""
        import queue
        import threading

        n_cached = len(self._device_cache) if self._device_cache else 0
        if n_cached:
            # replay the cached prefix (full epoch when the cache is
            # complete; otherwise the tail streams below)
            if self._stream_device_images or self._stream_device_text:
                # cached batches are stored WITHOUT table-resident tensors
                # (they'd duplicate the device tables); re-gather per replay
                # — a cheap on-device index into the resident tables
                for dev in self._device_cache:
                    yield self._gather_tables(dict(dev))
            else:
                yield from self._device_cache
            if self._cache_complete:
                return

        rng = random.Random(self.seed + self.epoch + 1)
        chunks = self._epoch_chunks()
        # caching requires shuffle=False, so chunk k is identical every
        # epoch: resume streaming right after the cached prefix
        chunks = chunks[n_cached:]

        q: queue.Queue = queue.Queue(maxsize=3)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded-queue put that never blocks forever: if the consumer
            # abandoned the epoch, observe `stop` and bail (otherwise the
            # producer thread + its pool leak on every early exit)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # Host-side work only: JAX dispatch is not thread-safe against the
            # consumer's jitted execution (deadlocks observed over the axon
            # tunnel), so device placement happens on the consumer thread.
            pool = (ThreadPoolExecutor(self.num_threads)
                    if self.with_images and not self._stream_device_images
                    else None)
            try:
                for chunk, n_valid in chunks:
                    if stop.is_set():
                        return
                    if not put_or_stop(self._assemble(chunk, pool, rng, n_valid)):
                        return
                put_or_stop(None)
            except BaseException as e:  # surface producer errors to consumer
                put_or_stop(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False, cancel_futures=True)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        def cache_batch(item, dev):
            # stop caching past the byte budget; the uncached tail streams
            # every epoch (bounded HBM beats a mid-training OOM).  The stop
            # is a latch so the cache stays a contiguous chunk prefix.
            if (not self.cache_device_batches or self._cache_complete
                    or self._cache_stopped):
                return
            nbytes = sum(np.asarray(v).nbytes for v in item.values())
            if (self.cache_budget_bytes is not None
                    and self._cache_bytes + nbytes > self.cache_budget_bytes):
                self._cache_stopped = True
                return
            self._cache_bytes += nbytes
            self._device_cache.append(dev)

        def place(item):
            if self._host_small:
                host = {k: item[k] for k in self._HOST_KEYS if k in item}
                to_place = {k: v for k, v in item.items() if k not in host}
            else:
                host, to_place = {}, item
            dev = dict(self._device_put(to_place)) if to_place else {}
            dev.update(host)
            if self._stream_device_images or self._stream_device_text:
                cache_batch(item, dict(dev))  # table-free
                dev = self._gather_tables(dev)
            else:
                cache_batch(item, dev)
            return dev

        # Double buffering: dispatch batch k+1's (async) device placement
        # BEFORE yielding batch k, so its H2D transfer overlaps the
        # consumer's jitted step on batch k.
        pending = None
        try:
            while True:
                item = q.get()
                if item is None:
                    if pending is not None:
                        yield pending
                    if self.cache_device_batches:
                        self._cache_complete = (
                            len(self._device_cache) == self.num_batches)
                    return
                if isinstance(item, BaseException):
                    raise item
                dev = place(item)
                if pending is not None:
                    yield pending
                pending = dev
        finally:
            stop.set()

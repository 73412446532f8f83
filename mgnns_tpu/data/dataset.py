"""Dataset: one split of TumEmo/MVSA with text tensors, labels and images.

Functional replacement for reference ``utils/Multi_GCN_Co_att_dataset.py``'s
``Tumblr_Dataset``.  Key deltas, by design:

- the per-sample GloVe constants the reference duplicated into every item
  (``:265`` returns the full [80,300]/[365,300] matrices per sample!) are
  loaded once by :func:`load_constants` and uploaded to device once;
- word2id/padding/edge-id work happens once at construction
  (:class:`mgnns_tpu.data.text.TextCorpus`), not per ``__getitem__``;
- images decode lazily per batch (threaded in the loader) with a synthetic
  fallback for the image files the reference checkout does not ship.
"""

from __future__ import annotations

import json
import os
import pickle
import random

import numpy as np

from mgnns_tpu.config import DataConfig, TextGraphConfig
from mgnns_tpu.data import images as I
from mgnns_tpu.data.text import TextCorpus, read_anno
from mgnns_tpu.graphs.cooccur import gen_A
from mgnns_tpu.graphs.pmi import PmiGraph


def load_constants(cfg: DataConfig, *, object_t: float, place_t: float, gama: float = 0.2) -> dict:
    """Device-constant inputs: GloVe matrices and gen_A adjacency.

    Reference loads these per dataset item / at module import
    (``utils/Multi_GCN_Co_att_dataset.py:69-82``,
    ``models/Multi_GCN_Multihead_att.py:20-27,338-347``).
    """
    def unpickle(path):
        with open(path, "rb") as f:
            return np.asarray(pickle.load(f), dtype=np.float32)

    object_A, _ = gen_A(80, object_t, cfg.object_adj_file, gama)
    place_A, _ = gen_A(365, place_t, cfg.place_adj_file, gama)
    return {
        "object_inp": unpickle(cfg.object_inp_name),
        "place_inp": unpickle(cfg.place_inp_name),
        "label_embedding": unpickle(cfg.label_glove_name),
        "object_A": object_A.astype(np.float32),
        "place_A": place_A.astype(np.float32),
    }


class TumblrDataset:
    """One phase split: static text tensors + lazy images + labels."""

    def __init__(
        self,
        data_cfg: DataConfig,
        graph_cfg: TextGraphConfig,
        phase: str,
        vocab: list[str],
        graph: PmiGraph,
        *,
        image_size: int = 448,
        train_transforms: bool = False,
        records: list[dict] | None = None,
        pixel_format: str = "uint8",
        cache_images: bool = True,
        cache_limit_bytes: int = 4 << 30,
    ):
        self.cfg = data_cfg
        self.phase = phase
        self.image_size = image_size
        self.train_transforms = train_transforms
        # 'uint8' ships raw pixels and normalizes on device (4x fewer H2D
        # bytes, no host float passes); 'float32' normalizes on host.
        self.pixel_format = pixel_format
        # Decoded-image cache: correct whenever the transform is
        # deterministic (eval) or the backend is deterministic (synthetic).
        self._cache_ok = cache_images and (
            not train_transforms or data_cfg.image_backend == "synthetic"
        )
        self._image_cache: dict[int, np.ndarray] = {}
        # hard cap on cached bytes: full-resolution train splits would
        # otherwise grow the cache unboundedly (~600 KB/sample at 448 uint8)
        self._cache_limit_bytes = cache_limit_bytes
        self._cache_bytes = 0
        self.records = records if records is not None else read_anno(data_cfg.data_root_path, phase)
        self.text = TextCorpus.build(self.records, vocab, graph, graph_cfg)
        label_path = os.path.join(data_cfg.data_root_path, "label.json")
        with open(label_path) as f:
            self.cat2idx = json.load(f)
        self.num_classes = len(self.cat2idx)
        self.labels = np.asarray(
            [self.cat2idx[r["label"]] for r in self.records], np.int32
        )

    def __len__(self) -> int:
        return len(self.records)

    def cacheable_images(self) -> bool:
        """True when a sample's pixels are deterministic (eval transforms, or
        the synthetic backend whose draws are keyed by sample id) — the
        validity condition for the decoded-image cache and for device-
        resident image tables."""
        return (not self.train_transforms) or self.cfg.image_backend == "synthetic"

    def image_path(self, i: int) -> str:
        return os.path.join(self.cfg.image_root, self.records[i].get("image", ""))

    def load_image(self, i: int, rng: random.Random | None = None) -> np.ndarray:
        i = int(i)
        if self._cache_ok and i in self._image_cache:
            return self._image_cache[i]
        rec = self.records[i]
        loader = I.load_image_uint8 if self.pixel_format == "uint8" else I.load_image
        img = loader(
            self.image_path(i),
            size=self.image_size,
            train=self.train_transforms,
            rng=rng,
            backend=self.cfg.image_backend,
            sample_key=str(rec.get("id", i)),
        )
        if self._cache_ok and self._cache_bytes + img.nbytes <= self._cache_limit_bytes:
            self._image_cache[i] = img
            self._cache_bytes += img.nbytes
        return img

"""Data pipeline tests against the real read-only reference artifacts."""

import os

import numpy as np
import pytest

from mgnns_tpu.config import DataConfig, TextGraphConfig
from mgnns_tpu.data import images as I
from mgnns_tpu.data.dataset import TumblrDataset, load_constants
from mgnns_tpu.data.loader import DeviceLoader
from mgnns_tpu.data.text import build_text_side, read_anno

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference data unavailable")


@pytest.fixture(scope="module")
def text_side():
    cfg = TextGraphConfig()
    vocab, graph, _ = build_text_side(REF, cfg, [], pmi_phase="val")
    return cfg, vocab, graph


@pytest.fixture(scope="module")
def small_ds(text_side):
    cfg, vocab, graph = text_side
    data_cfg = DataConfig(
        data_root_path=REF,
        object_inp_name=f"{REF}/glove/object_glove_word2vec.pkl",
        place_inp_name=f"{REF}/glove/place_glove_word2vec.pkl",
        label_glove_name=f"{REF}/tumblr_label_glove.pkl",
        object_adj_file=f"{REF}/adj/tumblr_objects_adj.pkl",
        place_adj_file=f"{REF}/adj/tumblr_resnet50_places_adj.pkl",
        image_backend="synthetic",
    )
    records = read_anno(REF, "val")[:70]
    return TumblrDataset(data_cfg, cfg, "val", vocab, graph,
                         image_size=32, records=records)


def test_read_anno_schema():
    recs = read_anno(REF, "val")
    assert len(recs) == 10035
    assert {"id", "text", "image", "label"} <= set(recs[0].keys())


def test_text_corpus_shapes(small_ds):
    t = small_ds.text
    assert t.ids.shape == (70, 100) and t.eids.shape == (70, 100, 9)
    assert (t.lens >= 1).all() and (t.lens <= 100).all()
    # mask rows sum to lens
    np.testing.assert_array_equal(t.mask.sum(1).astype(int), t.lens)
    # suffix padding only
    for n in range(len(t.lens)):
        assert (t.ids[n, t.lens[n]:] == 0).all()


def test_labels_mapped(small_ds):
    assert small_ds.num_classes == 7
    assert small_ds.labels.min() >= 0 and small_ds.labels.max() < 7


def test_load_constants():
    data_cfg = DataConfig(
        data_root_path=REF,
        object_inp_name=f"{REF}/glove/object_glove_word2vec.pkl",
        place_inp_name=f"{REF}/glove/place_glove_word2vec.pkl",
        label_glove_name=f"{REF}/tumblr_label_glove.pkl",
        object_adj_file=f"{REF}/adj/tumblr_objects_adj.pkl",
        place_adj_file=f"{REF}/adj/tumblr_resnet50_places_adj.pkl",
    )
    c = load_constants(data_cfg, object_t=0.4, place_t=0.3)
    assert c["object_inp"].shape == (80, 300)
    assert c["place_inp"].shape == (365, 300)
    assert c["label_embedding"].shape == (7, 300)
    assert c["object_A"].shape == (80, 80) and c["place_A"].shape == (365, 365)


def test_synthetic_images_deterministic():
    a = I.synthetic_image("sample-1", 32)
    b = I.synthetic_image("sample-1", 32)
    c = I.synthetic_image("sample-2", 32)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert a.shape == (32, 32, 3) and a.dtype == np.float32


def test_transforms_shapes():
    from PIL import Image
    import random

    img = Image.new("RGB", (500, 400), (128, 64, 32))
    ev = I.eval_transform(img, 64)
    tr = I.train_transform(img, 64, random.Random(0))
    assert ev.shape == tr.shape == (64, 64, 3)
    # normalize: solid color -> constant value per channel
    assert np.allclose(ev.std(axis=(0, 1)), 0.0, atol=1e-3)


def test_loader_static_shapes_and_masking(small_ds):
    loader = DeviceLoader(small_ds, batch_size=32, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3  # 70 -> 32+32+6pad
    for b in batches:
        assert b["ids"].shape == (32, 100)
        assert b["image"].shape == (32, 32, 32, 3)
    # last batch mask: 6 valid
    assert int(np.asarray(batches[-1]["weight"]).sum()) == 6
    # total valid across epoch == dataset size
    total = sum(int(np.asarray(b["weight"]).sum()) for b in batches)
    assert total == 70


def test_loader_shuffle_changes_order(small_ds):
    l1 = DeviceLoader(small_ds, batch_size=32, shuffle=True, seed=1, with_images=False)
    a = np.asarray(next(iter(l1))["sample_index"])
    b = np.asarray(next(iter(l1))["sample_index"])  # next epoch reshuffles
    assert not np.array_equal(a, b)



def test_device_images_matches_per_batch_upload(small_ds):
    """device_images=True (one device table + on-device gather) must yield
    byte-identical batches to the per-batch upload path."""
    ref_loader = DeviceLoader(small_ds, batch_size=32, shuffle=False)
    dev_loader = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                              device_images=True)
    for a, b in zip(ref_loader, dev_loader):
        assert "image" in b and b["image"].shape == a["image"].shape
        np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]), np.asarray(b["ids"]))
    # the pixel table was uploaded exactly once, stored flattened [N, row]
    assert dev_loader._image_table is not None
    table2d, row_shape = dev_loader._image_table
    assert table2d.shape == (len(small_ds), int(np.prod(row_shape)))


def test_device_images_rejects_nondeterministic_pixels(text_side, tmp_path):
    """PIL backend + train transforms => pixels differ per epoch; the loader
    must refuse the device-resident table."""
    cfg, vocab, graph = text_side
    data_cfg = DataConfig(
        data_root_path=REF,
        object_inp_name=f"{REF}/glove/object_glove_word2vec.pkl",
        place_inp_name=f"{REF}/glove/place_glove_word2vec.pkl",
        label_glove_name=f"{REF}/tumblr_label_glove.pkl",
        object_adj_file=f"{REF}/adj/tumblr_objects_adj.pkl",
        place_adj_file=f"{REF}/adj/tumblr_resnet50_places_adj.pkl",
        image_backend="pil",
    )
    ds = TumblrDataset(data_cfg, cfg, "val", vocab, graph, image_size=32,
                       train_transforms=True, records=read_anno(REF, "val")[:4])
    with pytest.raises(ValueError, match="device_images"):
        DeviceLoader(ds, batch_size=2, shuffle=True, device_images=True)


def test_loader_forced_num_batches(small_ds):
    """Multi-host epoch-length forcing: a loader with num_batches beyond its
    data emits all-padding batches (weight 0) so every host runs the same
    number of SPMD steps; valid-sample accounting is unchanged."""
    loader = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                          with_images=False, num_batches=5)
    batches = list(loader)
    assert len(loader) == 5 and len(batches) == 5
    for b in batches:
        assert b["ids"].shape == (32, 100)
    weights = [int(np.asarray(b["weight"]).sum()) for b in batches]
    assert weights == [32, 32, 6, 0, 0]
    assert sum(weights) == 70
    # shuffled loaders accept forcing too
    sl = DeviceLoader(small_ds, batch_size=32, shuffle=True,
                      with_images=False, num_batches=4)
    ws = [int(np.asarray(b["weight"]).sum()) for b in sl]
    assert len(ws) == 4 and sum(ws) == 70 and ws[-1] == 0
    # forcing below the natural count would drop data: rejected
    with pytest.raises(ValueError):
        DeviceLoader(small_ds, batch_size=32, num_batches=2)


def test_cached_batches_and_budget(small_ds):
    """cache_device_batches replays identical batches; a byte budget caps
    the cache to a contiguous prefix and streams the tail every epoch."""
    full = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                        cache_device_batches=True)
    e1 = [{k: np.asarray(v) for k, v in b.items()} for b in full]
    assert full._cache_complete and len(full._device_cache) == 3
    e2 = [{k: np.asarray(v) for k, v in b.items()} for b in full]
    for a, b in zip(e1, e2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    # budget for ~1 batch: cache holds a 1-batch prefix, epochs still
    # yield all 3 batches with identical content
    one_batch = sum(v.nbytes for v in e1[0].values())
    part = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                        cache_device_batches=True,
                        cache_budget_bytes=one_batch + 1)
    p1 = [{k: np.asarray(v) for k, v in b.items()} for b in part]
    assert len(part._device_cache) == 1 and not part._cache_complete
    assert part._cache_stopped
    p2 = [{k: np.asarray(v) for k, v in b.items()} for b in part]
    assert len(p1) == len(p2) == 3
    for a, b in zip(p1, p2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    for a, b in zip(e1, p1):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # the cache did not grow on the replay epoch
    assert len(part._device_cache) == 1

    # budget 0: nothing cached, still correct
    none = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                        cache_device_batches=True, cache_budget_bytes=0)
    n1 = list(none)
    assert len(none._device_cache) == 0 and len(n1) == 3

    # partial cache + device_images: pixel-free cache, images re-gathered
    di = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                      cache_device_batches=True, device_images=True,
                      cache_budget_bytes=one_batch + 1)
    d1 = [{k: np.asarray(v) for k, v in b.items()} for b in di]
    d2 = [{k: np.asarray(v) for k, v in b.items()} for b in di]
    for a, b, c in zip(e1, d1, d2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])


def test_device_text_matches_host_path(small_ds):
    """device_text=True (text tensors gathered on device from resident
    tables) must yield value-identical batches to the host-assembly path —
    including under shuffling, where table mode is valid because text
    tensors are deterministic per sample."""
    for shuffle in (False, True):
        ref_loader = DeviceLoader(small_ds, batch_size=32, shuffle=shuffle,
                                  seed=3, with_images=False)
        dt_loader = DeviceLoader(small_ds, batch_size=32, shuffle=shuffle,
                                 seed=3, with_images=False, device_text=True)
        n = 0
        for a, b in zip(ref_loader, dt_loader):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
            n += 1
        assert n == 3
    # the text tables exist and are shared via the dataset
    assert dt_loader._text_tables is not None
    assert dt_loader._text_tables["ids"].shape[0] == len(small_ds)
    another = DeviceLoader(small_ds, batch_size=16, with_images=False,
                           device_text=True)
    next(iter(another))
    assert another._text_tables is dt_loader._text_tables


def test_device_text_with_device_images_and_cache(small_ds):
    """Full table mode (text + pixels) + cached batches: cached entries are
    table-free (tiny), and replays re-gather to identical values."""
    ref = DeviceLoader(small_ds, batch_size=32, shuffle=False)
    expect = [{k: np.asarray(v) for k, v in b.items()} for b in ref]
    full = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                        device_images=True, device_text=True,
                        cache_device_batches=True)
    e1 = [{k: np.asarray(v) for k, v in b.items()} for b in full]
    e2 = [{k: np.asarray(v) for k, v in b.items()} for b in full]
    assert full._cache_complete
    # cached entries hold no table-resident tensors
    for dev in full._device_cache:
        assert "image" not in dev and "ids" not in dev and "eids" not in dev
    for a, b, c in zip(expect, e1, e2):
        for k in a:
            np.testing.assert_array_equal(a[k], np.asarray(b[k]))
            np.testing.assert_array_equal(a[k], np.asarray(c[k]))


def test_device_text_rejects_sharded_placement(small_ds):
    with pytest.raises(ValueError, match="device_text"):
        DeviceLoader(small_ds, batch_size=32, with_images=False,
                     device_text=True, device_put=lambda b: b)


def test_small_vectors_stay_host_numpy(small_ds):
    """With default placement, weight/label/sample_index are host numpy in
    the yielded batch (epoch accounting must not block on a device
    readback); the big tensors are device arrays."""
    import jax

    loader = DeviceLoader(small_ds, batch_size=32, shuffle=False,
                          with_images=False)
    b = next(iter(loader))
    for k in ("weight", "label", "sample_index"):
        assert isinstance(b[k], np.ndarray), k
    assert isinstance(b["ids"], jax.Array)
    # a custom placement hook (sharded/multihost path) places everything
    placed = next(iter(DeviceLoader(small_ds, batch_size=32, shuffle=False,
                                    with_images=False,
                                    device_put=jax.device_put)))
    assert isinstance(placed["weight"], jax.Array)


def test_gather_rows_fast_paths_match_naive():
    """`_gather_rows` picks dynamic_slice for contiguous ascending runs and
    a 2D-reshaped take otherwise (XLA:TPU lowers the native N-d row gather
    ~4x slower for large rows, see data/loader.py); both must equal the
    naive per-row gather, including N-d rows and repeated indices."""
    from mgnns_tpu.data.loader import _gather_rows

    rng = np.random.default_rng(0)
    table = rng.integers(0, 255, size=(17, 3, 4, 2), dtype=np.uint8)
    import jax
    dtab = jax.device_put(table)

    cases = [
        np.arange(5, 13),                 # contiguous run -> dynamic_slice
        np.arange(0, 17),                 # full table
        np.array([3]),                    # single row (contiguous)
        np.array([4, 2, 16, 0, 4]),       # shuffled + repeat -> 2D take
        np.array([16, 15, 14]),           # descending -> 2D take
    ]
    for idx in cases:
        got = np.asarray(_gather_rows(dtab, idx))
        np.testing.assert_array_equal(got, table[idx], err_msg=str(idx))


def test_empty_host_slice_yields_padding_batches(text_side, small_ds):
    """A multihost process whose contiguous sample range came up empty
    (global N < process_count) must still emit ``num_batches`` fully-padded
    batches with the SAME static shapes/dtypes as data-carrying hosts, or
    the global SPMD program diverges across hosts (regression: forced-length
    chunks were built from ``order[-1:]`` of an EMPTY index array, producing
    zero-leading-dim batches)."""
    cfg, vocab, graph = text_side
    empty = TumblrDataset(small_ds.cfg, cfg, "val", vocab, graph,
                          image_size=32, records=[])
    assert len(empty) == 0
    loader = DeviceLoader(empty, batch_size=4, shuffle=False, num_batches=2)
    ref_batch = next(iter(DeviceLoader(small_ds, batch_size=4, shuffle=False)))
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert set(b) == set(ref_batch)
        for k in b:
            assert np.shape(b[k]) == np.shape(ref_batch[k]), k
            assert np.asarray(b[k]).dtype == np.asarray(ref_batch[k]).dtype, k
        assert np.asarray(b["weight"]).sum() == 0
        assert (np.asarray(b["lens"]) >= 1).all()


def test_pipelined_image_table_matches_naive():
    """The decode/upload-overlapped table builder (round-5 cold-start fix)
    must produce byte-identical tables to the naive stack-then-upload path,
    including the shifted tail chunk that rewrites overlap rows."""
    from mgnns_tpu.data.loader import _build_image_table_pipelined

    class _DS:
        def __init__(self, n, size=17):
            self.n, self.size = n, size

        def __len__(self):
            return self.n

        def load_image(self, i, rng=None):
            r = np.random.default_rng(int(i))
            return r.integers(0, 255, (self.size, self.size, 3)).astype(np.uint8)

    for n in (1, 5, 16, 37):  # single chunk, sub-chunk, exact, shifted tail
        ds = _DS(n)
        table, row_shape = _build_image_table_pipelined(ds, 4, chunk_rows=16)
        want = np.stack([ds.load_image(i) for i in range(n)]).reshape(n, -1)
        np.testing.assert_array_equal(np.asarray(table), want)
        assert row_shape == (17, 17, 3)

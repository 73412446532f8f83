"""Worker for the multi-process SPMD *fused input path* test.

Launched (2x) by tests/test_multihost_2proc.py.  Each process owns 2 virtual
CPU devices; the global mesh is ('data'=2, 'model'=2), so each process owns
exactly one data-axis position.  The worker builds its contiguous record
slice of a 9-sample synthetic text split, shards the device-resident text
tables position-major over 'data' (``parallel.input``), and runs fused
whole-epoch programs — eval, train, eval — through the standard
DeviceLoader/Engine path.  Results go to JSON for the parent, which compares
them against a SINGLE-DEVICE run of the same split (round-3 verdict item 1:
"a multi-process CPU test asserts metrics identical to the single-device
run").
"""

import json
import sys

N, GLOBAL_BATCH, L, W, V, E, C = 9, 4, 8, 5, 41, 57, 3
IMG = 6  # tiny pixel rows: the flagship path is text AND image tables


def make_data(n=N, seed=11):
    """The full split's arrays — identical on every process (fixed seed)."""
    import numpy as np

    r = np.random.default_rng(seed)
    lens = r.integers(2, L + 1, (n,)).astype(np.int32)
    ids = (r.integers(1, V, (n, L)) *
           (np.arange(L)[None] < lens[:, None])).astype(np.int32)
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.float32)
    eids = r.integers(0, E, (n, L, W)).astype(np.int32)
    labels = r.integers(0, C, (n,)).astype(np.int32)
    return ids, lens, mask, eids, labels


class FakeTextDS:
    def __init__(self, lo=0, hi=N, global_len=N):
        from types import SimpleNamespace

        ids, lens, mask, eids, labels = make_data()
        self.text = SimpleNamespace(ids=ids[lo:hi], lens=lens[lo:hi],
                                    mask=mask[lo:hi], eids=eids[lo:hi])
        self.labels = labels[lo:hi]
        self.global_len = global_len
        self.offset = lo
        self.image_size = IMG
        self.pixel_format = "float32"

    def __len__(self):
        return len(self.labels)

    def cacheable_images(self):
        return True

    def load_image(self, i, rng=None):
        """Deterministic by GLOBAL sample id, so every process's shard and
        the parent's single-device reference see identical pixels."""
        import numpy as np

        r = np.random.default_rng(500 + self.offset + int(i))
        return r.standard_normal((IMG, IMG, 3)).astype(np.float32)


def apply_fn_factory():
    import jax.numpy as jnp

    from mgnns_tpu.models import text_model_apply

    def apply_fn(p, bs, batch, *, train, rng):
        logits = text_model_apply(p, batch, ngram=2, train=train, rng=rng,
                                  dropout_rate=0.0)
        # fold a per-sample pixel statistic in so the sharded IMAGE table
        # affects loss, preds, and gradients — a wrong pixel-gather row
        # cannot hide (same device as test_engine's image fixture)
        bump = jnp.mean(batch["image"].astype(jnp.float32), axis=(1, 2, 3))
        return logits + bump[:, None], bs

    return apply_fn


def main():
    out_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mgnns_tpu.parallel.multihost import (
        epoch_num_batches, host_local_to_global, initialize,
        process_batch_slice,
    )

    initialize()
    assert jax.process_count() == 2

    import numpy as np

    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.models import text_model_init
    from mgnns_tpu.parallel.mesh import _BATCH_FIELDS, create_mesh
    from mgnns_tpu.parallel.sharding import text_model_param_rules

    mesh = create_mesh(data=2, model=2)
    start, stop, per_host = process_batch_slice(N, GLOBAL_BATCH)
    num_batches = epoch_num_batches(N, GLOBAL_BATCH)
    ds = FakeTextDS(start, stop)

    def loader(shuffle):
        return DeviceLoader(
            ds, per_host, shuffle=shuffle, with_images=True,
            device_text=True, device_images=True, mesh=mesh,
            num_batches=num_batches,
            device_put=lambda b: host_local_to_global(b, mesh, _BATCH_FIELDS))

    params = text_model_init(jax.random.key(0), V, C, E)
    eng = Engine(apply_fn_factory(), params, {}, num_classes=C, lr=1e-2,
                 steps_per_epoch=num_batches, mesh=mesh,
                 param_sharding_rules=text_model_param_rules())

    ev = eng.eval_epoch(loader(False), collect_preds=True)
    assert ev.get("fused") is True, "multihost epoch did not use the fused SPMD path"
    tr = eng.train_epoch(loader(True))
    assert tr.get("fused") is True
    ev2 = eng.eval_epoch(loader(False))
    jax.block_until_ready(eng.state.params)

    head_w = np.asarray(jax.device_get(eng.state.params["head"]["w"]))
    out = {
        "process": jax.process_index(),
        "slice": [int(start), int(stop)],
        "eval_confusion": np.asarray(ev["confusion"]).tolist(),
        "eval_loss": float(ev["loss"]),
        # host-local preds keyed by GLOBAL sample id
        "preds": {str(ds.offset + int(i)): int(p)
                  for i, p in zip(ev["sample_index"], ev["preds"])},
        "train_loss": float(tr["loss"]),
        "post_confusion": np.asarray(ev2["confusion"]).tolist(),
        "post_loss": float(ev2["loss"]),
        "head_w_sum": float(head_w.sum()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[fused worker {jax.process_index()}] ok", flush=True)


if __name__ == "__main__":
    main()

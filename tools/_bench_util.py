"""Shared measurement scaffolding for the perf tools and ``bench.py``.

One copy of the slope-timing helper, the measured-peak methodology, and the
flagship model/dataset setup.  A fix to the readback-barrier or the peak
methodology lands in every tool at once instead of silently diverging their
recorded numbers (the tools each write committed ``results/`` artifacts).
"""

import os
import time
from types import SimpleNamespace

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, args, iters, readback):
    """Slope timing: warm once, run ``iters`` chained calls, force completion
    with a real D2H ``readback`` — ``block_until_ready`` alone can return
    before remote execution completes on a network-attached TPU (see
    docs/PERFORMANCE.md, "Measurement discipline")."""
    out = fn(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / iters


def measured_bf16_peak(n: int = 8192, chain: int = 128, iters: int = 8) -> float:
    """Sustained bf16 matmul TFLOP/s of THIS chip: a chained ``n^3`` matmul
    loop (data-dependent, so nothing dead-code eliminates), scalar readback.
    The measured number (173.6 on this v5e), not the datasheet 197, is the
    denominator for every MFU/%-of-peak figure the tools report.

    chain=128 (round 5): short chains under-measure through the tunnel's
    dispatch+readback latency, and by a run-varying amount — chain=8 read
    118-152 TF/s across runs while chain=32/128 converge to 170/174 on the
    same chip minutes apart.  ~0.9 s/call at 128 amortizes the round trip
    below the noise floor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    scale = jnp.bfloat16(1.0 / np.sqrt(n))
    A = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16) * scale
    x0 = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    @jax.jit
    def peak_fn(x, a):
        def body(_, acc):
            return jnp.dot(acc, a, preferred_element_type=jnp.bfloat16)

        return jax.lax.fori_loop(0, chain, body, x)

    dt = timed(peak_fn, (x0, A), iters=iters,
               readback=lambda o: float(o[0, 0].astype(jnp.float32)))
    return chain * 2 * n ** 3 / dt / 1e12


def flagship_data_cfg(ref: str):
    """The reference checkout's artifact paths (synthetic pixels — no image
    files ship upstream)."""
    from mgnns_tpu.config import DataConfig

    return DataConfig(
        data_root_path=ref,
        object_inp_name=f"{ref}/glove/object_glove_word2vec.pkl",
        place_inp_name=f"{ref}/glove/place_glove_word2vec.pkl",
        label_glove_name=f"{ref}/tumblr_label_glove.pkl",
        object_adj_file=f"{ref}/adj/tumblr_objects_adj.pkl",
        place_adj_file=f"{ref}/adj/tumblr_resnet50_places_adj.pkl",
        image_backend="synthetic",
    )


def flagship_data(ref: str | None = None, n_records: int | None = None,
                  image_size: int = 448) -> SimpleNamespace:
    """Real TumEmo val text + graph + dataset + model constants at the
    reference's canonical config (the setup every perf tool measures)."""
    from mgnns_tpu.config import TextGraphConfig
    from mgnns_tpu.data.dataset import TumblrDataset, load_constants
    from mgnns_tpu.data.text import build_text_side, read_anno

    ref = ref or os.environ.get("MGNNS_DATA", "/root/reference/data")
    graph_cfg = TextGraphConfig()
    data_cfg = flagship_data_cfg(ref)
    vocab, graph, _ = build_text_side(ref, graph_cfg, [], pmi_phase="val")
    records = read_anno(ref, "val")
    if n_records is not None:
        records = records[:n_records]
    ds = TumblrDataset(data_cfg, graph_cfg, "val", vocab, graph,
                       image_size=image_size, records=records)
    consts_np = load_constants(data_cfg, object_t=0.4, place_t=0.3)
    return SimpleNamespace(ref=ref, graph_cfg=graph_cfg, data_cfg=data_cfg,
                           vocab=vocab, graph=graph, ds=ds,
                           consts_np=consts_np)


def flagship_model(data: SimpleNamespace, *, use_pallas: bool = True,
                   **cfg_overrides) -> SimpleNamespace:
    """Jitted-init flagship model + an ``apply_fn(p, bs, batch, *, train,
    rng)`` closure that injects the device-resident object/place GloVe
    inputs — the exact program bench.py/roofline/capture_trace measure."""
    import jax

    from mgnns_tpu.config import ModelConfig
    from mgnns_tpu.models import mgnns_apply
    from mgnns_tpu.models.mgnns import mgnns_init_jitted

    cfg_kw = dict(vocab_size=len(data.vocab), edges_num=data.graph.num_edges,
                  compute_dtype="bfloat16")
    cfg_kw.update(cfg_overrides)
    cfg = ModelConfig(**cfg_kw)
    params, bstats, consts = mgnns_init_jitted(
        jax.random.key(0), cfg, num_edges=data.graph.num_edges,
        label_embedding=data.consts_np["label_embedding"],
        object_A=data.consts_np["object_A"],
        place_A=data.consts_np["place_A"])
    object_inp = jax.device_put(data.consts_np["object_inp"])
    place_inp = jax.device_put(data.consts_np["place_inp"])

    def apply_fn(p, bs, batch, *, train, rng):
        full = dict(batch)
        full["object_inp"] = object_inp
        full["place_inp"] = place_inp
        logits, new_bs, _ = mgnns_apply(p, bs, consts, full, cfg=cfg,
                                        train=train, rng=rng,
                                        use_pallas=use_pallas)
        return logits, new_bs

    return SimpleNamespace(cfg=cfg, params=params, bstats=bstats,
                           consts=consts, object_inp=object_inp,
                           place_inp=place_inp, apply_fn=apply_fn)

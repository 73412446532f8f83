"""Capture a jax.profiler trace of the flagship fine-tune train step on TPU.

VERDICT r2 item 3 asked for a committed profiler trace of the fine-tune
step.  This traces a handful of already-compiled steps (warmup first, so
compile time stays out of the trace) into ``results/r3/trace/``.

Run ON TPU:  python tools/capture_trace.py
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax

    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from mgnns_tpu.config import DataConfig, ModelConfig, TextGraphConfig
    from mgnns_tpu.data.dataset import TumblrDataset, load_constants
    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.data.text import build_text_side, read_anno
    from mgnns_tpu.engine import metrics as M
    from mgnns_tpu.engine.train import Engine
    from mgnns_tpu.models import mgnns_apply
    from mgnns_tpu.models.mgnns import mgnns_init_jitted

    ref = os.environ.get("MGNNS_DATA", "/root/reference/data")
    B = int(os.environ.get("MGNNS_BENCH_BATCH", "32"))
    out_dir = os.path.join(ROOT, "results", "r3", "trace")
    graph_cfg = TextGraphConfig()
    data_cfg = DataConfig(
        data_root_path=ref,
        object_inp_name=f"{ref}/glove/object_glove_word2vec.pkl",
        place_inp_name=f"{ref}/glove/place_glove_word2vec.pkl",
        label_glove_name=f"{ref}/tumblr_label_glove.pkl",
        object_adj_file=f"{ref}/adj/tumblr_objects_adj.pkl",
        place_adj_file=f"{ref}/adj/tumblr_resnet50_places_adj.pkl",
        image_backend="synthetic",
    )
    vocab, graph, _ = build_text_side(ref, graph_cfg, [], pmi_phase="val")
    ds = TumblrDataset(data_cfg, graph_cfg, "val", vocab, graph,
                       image_size=448, records=read_anno(ref, "val")[:B * 2])
    consts_np = load_constants(data_cfg, object_t=0.4, place_t=0.3)
    cfg = ModelConfig(vocab_size=len(vocab), edges_num=graph.num_edges,
                      compute_dtype="bfloat16", bn_mode="frozen",
                      unroll_trunks=True, remat_policy="none")
    params, bstats, consts = mgnns_init_jitted(
        jax.random.key(0), cfg, num_edges=graph.num_edges,
        label_embedding=consts_np["label_embedding"],
        object_A=consts_np["object_A"], place_A=consts_np["place_A"])
    object_inp = jax.device_put(consts_np["object_inp"])
    place_inp = jax.device_put(consts_np["place_inp"])
    batch = next(iter(DeviceLoader(ds, B, shuffle=False, num_threads=8)))

    def apply_fn(p, bs, b, *, train, rng):
        full = dict(b)
        full["object_inp"] = object_inp
        full["place_inp"] = place_inp
        logits, new_bs, _ = mgnns_apply(p, bs, consts, full, cfg=cfg,
                                        train=train, rng=rng, use_pallas=True)
        return logits, new_bs

    eng = Engine(apply_fn, params, bstats, num_classes=7, steps_per_epoch=1)
    state = eng.state
    for _ in range(3):  # compile + settle before tracing
        state, loss, cm = eng._train_step(state, batch, M.confusion_init(7))
    float(jax.tree_util.tree_leaves(state.params)[0].astype("float32").sum())

    with jax.profiler.trace(out_dir):
        for _ in range(5):
            state, loss, cm = eng._train_step(state, batch, M.confusion_init(7))
        float(jax.tree_util.tree_leaves(state.params)[0].astype("float32").sum())
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main()

"""Training/eval CLI, mirroring the reference's argparse surface.

Reference: ``Tumblr_Multi_GCN_Multihead_Att.py:12-204`` (``main_MVSA``).  Flags
keep the reference's names (underscores accepted for dashed variants) plus
TPU-specific additions: ``--text_only``, ``--pmi_phase``, ``--compute_dtype``,
``--mesh_data/--mesh_model``, ``--image_backend``, ``--use_pallas``.

Example (text-only slice on the checked-in val/test splits):

    python -m mgnns_tpu.cli.main --data_root_path /root/reference/data \
        --pmi_phase val --train_phase val --text_only --epochs 2 -b 64
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MGNNS-TPU training")
    # reference flags (Tumblr_...py:12-81)
    p.add_argument("--dataset", type=str, default="tumblr")
    p.add_argument("--data_root_path", type=str, default="data")
    p.add_argument("--bidirectional", type=bool, default=True)
    p.add_argument("--hidden_size", type=int, default=150)
    p.add_argument("--emb_size", type=int, default=300)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("-dropout", "--dropout", type=float, default=0.5)
    p.add_argument("-emb_type", "--emb_type", type=str, default="glove",
                   choices=["random", "glove", "glove200d", "glove300d", "fasttext300d"])
    p.add_argument("--stack_num", type=int, default=2)
    p.add_argument("--n_head", type=int, default=4)
    p.add_argument("--d_kv", type=int, default=128)
    p.add_argument("--is_regu", type=bool, default=False)
    p.add_argument("--text_min_count", type=int, default=5)
    p.add_argument("--window_size", type=int, default=6)
    p.add_argument("--ngram", type=int, default=4)
    p.add_argument("--min_cooccurence", type=int, default=2)
    p.add_argument("--image-size", "-i", dest="image_size", type=int, default=448)
    p.add_argument("-j", "--workers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch_step", type=int, nargs="+", default=[10])
    p.add_argument("--device_ids", type=int, nargs="+", default=[0])
    p.add_argument("--start-epoch", dest="start_epoch", type=int, default=0)
    p.add_argument("-b", "--batch-size", dest="batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=0,
                   help="batch size for val/test epochs (0 = same as train; "
                        "eval fits much larger batches than fwd+bwd)")
    p.add_argument("--cache_eval_batches", action="store_true",
                   help="keep val/test batches device-resident after the "
                        "first epoch (static eval sets; ~6 GB HBM for 10k "
                        "448px uint8 samples).  Bounded by the input-HBM "
                        "budget left over from --device_images tables: "
                        "batches past it stream every epoch instead")
    p.add_argument("--no_augmentation", action="store_true",
                   help="use eval transforms (Warp) for the train split too: "
                        "no MultiScaleCrop/flip.  With --device_images and "
                        "train_phase == val/test phase the splits then share "
                        "ONE pixel table")
    p.add_argument("--device_images", action="store_true",
                   help="upload each split's pixels ONCE as a device table "
                        "and gather batches on device by index — removes "
                        "per-step image H2D (requires deterministic pixels: "
                        "eval transforms or the synthetic backend; ~600 KB "
                        "HBM per 448px sample per split)")
    p.add_argument("--device_text", action="store_true",
                   help="upload each split's text tensors (ids/lens/mask/"
                        "edge-ids) ONCE as device tables and gather batches "
                        "on device by index — per-step H2D shrinks to a [B] "
                        "index vector (~4 KB/sample HBM; valid for shuffled "
                        "training, single-device placement only)")
    p.add_argument("--device_images_budget_gb", type=float, default=7.0,
                   help="HBM budget for input data: --device_images pixel "
                        "tables (granted greedily: train, val, test; splits "
                        "past the budget fall back to per-batch upload) and, "
                        "from what remains, --cache_eval_batches caches. "
                        "Default leaves >=8 GB of a 16 GB v5e for step "
                        "workspace: 9.0 (a 6 GB train table + ~3 GB of eval "
                        "caches) fragments the heap enough that the epoch-1 "
                        "train step OOMs after the caches fill during epoch 0")
    p.add_argument("--fused_segments", type=int, default=1,
                   help="run each fused epoch as K scan programs of "
                        "~num_batches/K steps instead of one whole-epoch "
                        "program (HBM-tight configs; the engine also "
                        "auto-escalates x4 on fused compile failure before "
                        "falling back to per-batch dispatch)")
    p.add_argument("--val_limit", type=int, default=0,
                   help="evaluate only the first N val samples per epoch "
                        "(faster epochs; the final test pass is always full)")
    p.add_argument("--lr", "--learning-rate", dest="lr", type=float, default=5e-5)
    p.add_argument("--lrp", "--learning-rate-pretrained", dest="lrp", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", "--weight_decay", "--wd",
                   dest="weight_decay", type=float, default=1e-5)
    p.add_argument("--print-freq", "-p", dest="print_freq", type=int, default=10)
    p.add_argument("--resume", type=str, nargs="?", const="latest", default=None,
                   help="bare --resume: resume from this run's latest "
                        "checkpoint; --resume <dir>: resume full train state "
                        "from that Orbax checkpoint dir; --resume <x.pth[.tar]>: "
                        "import a reference torch checkpoint's weights "
                        "(optimizer state starts fresh, as the reference's "
                        "resume does: engine/...:347-357)")
    p.add_argument("--object_trunk_ckpt", type=str, default=None,
                   help="torchvision-format ResNet-101 .pth[.tar] for the "
                        "object trunk (reference models.resnet101("
                        "pretrained=True), Multi_GCN_Multihead_att.py:629)")
    p.add_argument("--place_trunk_ckpt", type=str, default=None,
                   help="Places365 ResNet-50 .pth[.tar] for the scene trunk "
                        "(reference weights/resnet50_places365.pth.tar, "
                        "Multi_GCN_Multihead_att.py:586-595); a 'module.' "
                        "DataParallel prefix is stripped automatically")
    p.add_argument("--init_from_reference", type=str, default=None,
                   help="initialize ALL model weights from a reference "
                        "Multi_GCN_Multihead_Att torch checkpoint "
                        "(models/import_reference.py); training starts at "
                        "epoch 0 with a fresh optimizer")
    p.add_argument("--include_dead_modules", action="store_true",
                   help="also carry the reference modules its forward never "
                        "runs (GRU 'rnn', gates, linear_1..3, "
                        "text_object_text/text_place_text attention, the "
                        "Text_GCN head) so exported checkpoints satisfy a "
                        "reference-side load_state_dict(strict=True); they "
                        "stay frozen and cost nothing per step")
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--save_experiment_result_path", type=str, default="result/experiment_result")
    p.add_argument("--save_pred_result_path", type=str, default="result/pred_result")
    p.add_argument("--model_name", type=str, default="mgnns_tpu")
    p.add_argument("--save_model_path", type=str, default="checkpoint")
    p.add_argument("--object_t_value", type=float, default=0.4)
    p.add_argument("--place_t_value", type=float, default=0.3)
    p.add_argument("--num_labels", type=int, default=7)
    p.add_argument("--object_num_classes", type=int, default=80)
    p.add_argument("--place_num_classes", type=int, default=365)
    p.add_argument("--accumulation_steps", type=int, default=8)
    p.add_argument("--fp16", action="store_true",
                   help="alias for --compute_dtype bfloat16 on TPU")
    p.add_argument("--fp16_opt_level", type=str, default="O1")
    # TPU-native additions
    p.add_argument("--text_only", action="store_true", help="train the text-only slice")
    p.add_argument("--pmi_phase", type=str, default="train",
                   help="split whose texts build the PMI graph")
    p.add_argument("--train_phase", type=str, default="train")
    p.add_argument("--val_phase", type=str, default="val")
    p.add_argument("--test_phase", type=str, default="test")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--image_backend", type=str, default="synthetic", choices=["pil", "synthetic"])
    p.add_argument("--image_root", type=str, default=".")
    p.add_argument("--mesh_data", type=int, default=1, help="data-parallel mesh axis size")
    p.add_argument("--mesh_model", type=int, default=1, help="model-parallel mesh axis size")
    p.add_argument("--multihost", action="store_true",
                   help="initialize the JAX distributed runtime (multi-process "
                        "SPMD over a pod slice); each host loads its own data "
                        "shard — see parallel/multihost.py")
    pg = p.add_mutually_exclusive_group()
    pg.add_argument("--use_pallas", dest="use_pallas", action="store_true",
                    default=None,
                    help="use the Pallas text-GCN kernel (custom backward; "
                         "measured 1.27-2.0x faster than XLA's VJP on TPU — "
                         "docs/PERFORMANCE.md).  Default: ON when the "
                         "resolved JAX backend is TPU, OFF elsewhere "
                         "(interpret mode is slow on CPU)")
    pg.add_argument("--no_use_pallas", dest="use_pallas", action="store_false",
                    help="force the XLA text-GCN path even on TPU")
    p.add_argument("--faithful_param_groups", action="store_true")
    p.add_argument("--limit_samples", type=int, default=0,
                   help="truncate each split (debug/smoke)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_to_keep", type=int, default=3)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu, tpu); the ambient "
                        "JAX_PLATFORMS env var is unreliable on this host")
    p.add_argument("--grad_accumulation_steps", type=int, default=1,
                   help="working gradient accumulation (the reference's "
                        "--accumulation_steps flag is parsed but unused there)")
    p.add_argument("--regu_weight", type=float, default=0.0,
                   help="weight of the head-diversity penalty when --is_regu")
    p.add_argument("--edges_init", type=str, default="ones", choices=["ones", "pmi"],
                   help="text-GCN edge-weight init: trainable-from-1.0 (reference "
                        "default, Text_GCN.py:68) or from PMI values (:72)")
    p.add_argument("--bn_mode", type=str, default="batch", choices=["batch", "frozen"],
                   help="'batch'=torch-faithful train-mode BatchNorm; 'frozen'=running stats")
    p.add_argument("--remat_trunks", action="store_true",
                   help="jax.checkpoint the ResNet trunks (memory for FLOPs); "
                        "alias for --remat_policy trunk")
    p.add_argument("--remat_policy", type=str, default="none",
                   choices=["none", "trunk", "block"],
                   help="trunk rematerialization granularity: 'block' "
                        "checkpoints each bottleneck block (per-block peak "
                        "memory; the lever for large-batch fine-tuning)")
    p.add_argument("--unroll_trunks", action="store_true",
                   help="unroll the per-stage residual-block scans: slower "
                        "compile, ~19%% faster ResNet-101 backward")
    p.add_argument("--freeze_trunks", action="store_true",
                   help="feature-extraction fine-tuning: stop trunk "
                        "gradients and freeze trunk params (~4x train "
                        "throughput; the reference always fine-tunes)")
    p.add_argument("--stem_s2d", action="store_true",
                   help="space-to-depth stem: the 7x7/s2 trunk stem as an "
                        "exact-equivalent 4x4/s1 conv over a s2d-2 input "
                        "(MLPerf TPU trick; same math, params, checkpoints "
                        "— only the XLA lowering changes)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace for the first train epoch")
    p.add_argument("--metrics_path", type=str, default=None,
                   help="append one JSON line of train/val metrics per epoch "
                        "(machine-readable run observability)")
    p.add_argument("--libtpu_init_args", type=str, default=None,
                   help="extra server-side TPU compiler flags, appended to "
                        "LIBTPU_INIT_ARGS before backend init ('--xla_tpu_*' "
                        "flags crash the CLIENT flag parser if put in "
                        "XLA_FLAGS on tunnel rigs — this is the working "
                        "channel; see tools/xla_flag_sweep.py).  Use the "
                        "'=' form: --libtpu_init_args='--xla_tpu_...=1'")
    p.add_argument("--perf_preset", action="store_true",
                   help="apply the recorded TPU compiler-flag sweep winner "
                        "(+3%% on the fine-tune step, results/r3/"
                        "xla_flag_sweep.json): "
                        "--xla_tpu_enable_aggressive_loop_fusion_layout_opt")
    return p


_PERF_PRESET_FLAGS = "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"


def _apply_tpu_compile_flags(args) -> str | None:
    """Set LIBTPU_INIT_ARGS before the TPU backend initializes and return a
    compilation-cache salt.  The JAX compilation cache key IGNORES libtpu
    flags (measured: a warm cache silently serves programs compiled under
    different flags), so runs with non-default flags get their own cache
    subdirectory."""
    extra = []
    if args.perf_preset:
        extra.append(_PERF_PRESET_FLAGS)
    if args.libtpu_init_args:
        extra.append(args.libtpu_init_args)
    if not extra:
        return None
    flags = " ".join(extra)
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
    import hashlib

    return hashlib.sha256(os.environ["LIBTPU_INIT_ARGS"].encode()).hexdigest()[:10]


def load_torch_state_dict(path: str) -> tuple[dict, dict]:
    """(state_dict, meta) from a reference/torchvision ``.pth[.tar]`` file.

    Accepts either a bare state_dict or the reference's checkpoint wrapper
    ``{'epoch', 'arch', 'state_dict', 'best_score'}`` (written by
    ``engine/...:624-643``; the Places365 release uses the same format) and
    strips DataParallel's ``module.`` prefix.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        meta = {k: obj[k] for k in ("epoch", "best_score") if k in obj}
        obj = obj["state_dict"]
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v
    return sd, meta


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    cache_salt = _apply_tpu_compile_flags(args)  # before any backend init
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from mgnns_tpu.parallel.multihost import initialize

        initialize()
    if args.mesh_data > 1:  # args-only check: fail before the expensive
        # vocab/PMI/dataset construction, not minutes into it
        for nm, b in (("-b/--batch_size", args.batch_size),
                      ("--eval_batch_size", args.eval_batch_size or 0)):
            if b and b % args.mesh_data:
                raise SystemExit(
                    f"{nm}={b} must divide by --mesh_data={args.mesh_data} "
                    "(batches shard row-wise over the 'data' axis)")
    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache(salt=cache_salt)
    if args.use_pallas is None:  # backend-conditional default: the kernel is
        # a measured win on TPU (docs/PERFORMANCE.md) but compiles via slow
        # interpret mode on CPU — match the repo's own recommendation
        args.use_pallas = jax.default_backend() == "tpu"
        print(f"use_pallas={args.use_pallas} (auto: backend="
              f"{jax.default_backend()}; --no_use_pallas to override)")
    from mgnns_tpu.config import DataConfig, ModelConfig, TextGraphConfig
    from mgnns_tpu.data.dataset import TumblrDataset, load_constants
    from mgnns_tpu.data.loader import DeviceLoader
    from mgnns_tpu.data.text import build_text_side, read_anno
    from mgnns_tpu.engine.train import Engine

    graph_cfg = TextGraphConfig(
        text_min_count=args.text_min_count, window_size=args.window_size,
        ngram=args.ngram, min_cooccurrence=args.min_cooccurence,
    )
    data_cfg = DataConfig(
        data_root_path=args.data_root_path, dataset=args.dataset,
        object_inp_name=os.path.join(args.data_root_path, "glove/object_glove_word2vec.pkl"),
        place_inp_name=os.path.join(args.data_root_path, "glove/place_glove_word2vec.pkl"),
        label_glove_name=os.path.join(args.data_root_path, "tumblr_label_glove.pkl"),
        object_adj_file=os.path.join(args.data_root_path, "adj/tumblr_objects_adj.pkl"),
        place_adj_file=os.path.join(args.data_root_path, "adj/tumblr_resnet50_places_adj.pkl"),
        image_root=args.image_root, image_backend=args.image_backend,
    )

    vocab, graph, _ = build_text_side(args.data_root_path, graph_cfg, [], pmi_phase=args.pmi_phase)
    print(f"vocab={len(vocab)} pmi_edges={graph.num_edges - 1}")

    # Pretrained vocab GloVe (reference loads data/glove_embedding/
    # glove_embedding_{k}.pkl for both the sequence embedding and the
    # text-GCN node table when emb_type != 'random'; build it with
    # `prepare pack-glove --kind vocab`).
    vocab_embedding = None
    if args.emb_type != "random":
        import pickle

        emb_path = os.path.join(args.data_root_path, "glove_embedding",
                                f"glove_embedding_{args.text_min_count}.pkl")
        if os.path.exists(emb_path):
            with open(emb_path, "rb") as f:
                vocab_embedding = np.asarray(pickle.load(f), np.float32)
            print(f"loaded vocab embedding {vocab_embedding.shape} from {emb_path}")
        else:
            print(f"note: no pretrained embedding at {emb_path}; using random init")
    edge_weights = graph.initial_edge_weights(
        trainable_init_one=(args.edges_init == "ones"))

    # persist preprocessing next to the checkpoints so serving
    # (mgnns_tpu.serving.Predictor) is self-contained
    from mgnns_tpu.serving import save_preproc

    label_map = json.load(open(os.path.join(args.data_root_path, "label.json")))
    ckpt_dir = os.path.join(args.save_model_path, args.model_name)
    save_preproc(ckpt_dir, vocab, graph, label_map, graph_cfg)

    multihost_active = args.multihost and jax.process_count() > 1

    _anno_cache: dict = {}

    def get_records(phase):
        if phase not in _anno_cache:
            records = read_anno(args.data_root_path, phase)
            if args.limit_samples:
                records = records[: args.limit_samples]
            _anno_cache[phase] = records
        return _anno_cache[phase]

    def make_ds(phase, train, limit=0):
        records = get_records(phase)
        if limit:
            records = records[:limit]
        global_len = len(records)
        if multihost_active:
            from mgnns_tpu.parallel.multihost import process_batch_slice

            start, stop, _ = process_batch_slice(len(records), args.batch_size)
            records = records[start:stop]
        ds = TumblrDataset(
            data_cfg, graph_cfg, phase, vocab, graph,
            image_size=args.image_size, train_transforms=train, records=records,
        )
        # pre-slice count: multihost epoch lengths derive from the GLOBAL
        # split size so every host runs the same number of SPMD steps
        ds.global_len = global_len
        return ds

    # Dedupe: identical (phase, transforms) pairs share one dataset —
    # common in ablations (val split doubling as test) and essential with
    # --device_images, where each dataset pins a pixel table in HBM.
    _ds_cache: dict = {}

    def make_ds_cached(phase, train, limit=0):
        if limit and limit >= len(get_records(phase)):
            limit = 0  # no-op limit: share the unlimited dataset object
        key = (phase, train, limit)
        if key not in _ds_cache:
            _ds_cache[key] = make_ds(phase, train, limit)
        return _ds_cache[key]

    train_ds = make_ds_cached(args.train_phase, not args.no_augmentation)
    val_ds = make_ds_cached(args.val_phase, False, args.val_limit)
    test_ds = make_ds_cached(args.test_phase, False)

    compute_dtype = "bfloat16" if args.fp16 else args.compute_dtype
    model_cfg = ModelConfig(
        num_labels=args.num_labels, vocab_size=len(vocab), emb_size=args.emb_size,
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        bidirectional=args.bidirectional, dropout=args.dropout,
        stack_num=args.stack_num, n_head=args.n_head, d_kv=args.d_kv,
        is_regu=args.is_regu, object_num_classes=args.object_num_classes,
        place_num_classes=args.place_num_classes, object_t=args.object_t_value,
        place_t=args.place_t_value, image_size=args.image_size,
        edges_num=graph.num_edges, compute_dtype=compute_dtype,
        remat_trunks=args.remat_trunks, remat_policy=args.remat_policy,
        bn_mode=args.bn_mode,
        unroll_trunks=args.unroll_trunks, freeze_trunks=args.freeze_trunks,
        stem_s2d=args.stem_s2d,
    )

    mesh = None
    rules = None
    if args.mesh_data * args.mesh_model > 1:
        from mgnns_tpu.parallel.mesh import create_mesh
        from mgnns_tpu.parallel.sharding import mgnns_param_rules

        mesh = create_mesh(data=args.mesh_data, model=args.mesh_model)
        rules = mgnns_param_rules()

    if args.text_only and (args.object_trunk_ckpt or args.place_trunk_ckpt
                           or args.init_from_reference):
        raise SystemExit("--object_trunk_ckpt/--place_trunk_ckpt/"
                         "--init_from_reference need the fusion model; "
                         "drop --text_only")

    key = jax.random.key(args.seed)
    with_images = not args.text_only
    if args.text_only:
        from mgnns_tpu.models import text_model_apply, text_model_init

        params = text_model_init(
            key, len(vocab), args.num_labels, graph.num_edges,
            node_embedding=vocab_embedding, edge_weights=edge_weights)
        batch_stats = {}

        def apply_fn(p, bs, batch, *, train, rng):
            logits = text_model_apply(
                p, batch, ngram=graph_cfg.ngram, dropout_rate=args.dropout,
                train=train, rng=rng, use_pallas=args.use_pallas,
            )
            return logits, bs
    else:
        from mgnns_tpu.models import mgnns_apply
        from mgnns_tpu.models.mgnns import mgnns_init_jitted

        consts_np = load_constants(
            data_cfg, object_t=args.object_t_value, place_t=args.place_t_value
        )
        params, batch_stats, consts = mgnns_init_jitted(
            key, model_cfg, num_edges=graph.num_edges,
            label_embedding=consts_np["label_embedding"],
            object_A=consts_np["object_A"], place_A=consts_np["place_A"],
            include_dead_modules=args.include_dead_modules,
            vocab_embedding=vocab_embedding, node_embedding=vocab_embedding,
            edge_weights=edge_weights,
        )
        # Pretrained ingestion (reference Multi_GCN_Multihead_att.py:586-595,
        # 629): replace the random trunks post-init so the imported arrays
        # arrive as data, not as constants baked into the jitted init.
        if args.init_from_reference:
            from mgnns_tpu.models.import_reference import import_reference_state_dict

            sd, _ = load_torch_state_dict(args.init_from_reference)
            params, batch_stats = import_reference_state_dict(
                sd, num_layers=args.num_layers,
                bidirectional=args.bidirectional, stack_num=args.stack_num)
            got_v = params["embedding"]["table"].shape[0]
            if got_v != len(vocab):
                raise SystemExit(
                    f"--init_from_reference vocab mismatch: checkpoint has "
                    f"{got_v} rows, this corpus/config has {len(vocab)} "
                    f"(check --text_min_count/--pmi_phase)")
            print(f"initialized all weights from {args.init_from_reference}")
        # Precedence (docs/MIGRATION.md "Day one"): --emb_type glove seeds
        # the embedding tables at init; --init_from_reference then replaces
        # ALL weights; --object/place_trunk_ckpt override the trunks LAST
        # (e.g. fine-tuning a reference checkpoint with refreshed trunks).
        for side, ckpt_path, depth in (("object", args.object_trunk_ckpt, 101),
                                       ("place", args.place_trunk_ckpt, 50)):
            if not ckpt_path:
                continue
            from mgnns_tpu.nn.resnet import import_torch_state_dict

            sd, _ = load_torch_state_dict(ckpt_path)
            tp, ts = import_torch_state_dict(sd, depth)
            params[f"{side}_trunk"], batch_stats[f"{side}_trunk"] = tp, ts
            print(f"loaded {side} trunk (resnet{depth}) from {ckpt_path}")
        object_inp = jax.device_put(consts_np["object_inp"])
        place_inp = jax.device_put(consts_np["place_inp"])

        def apply_fn(p, bs, batch, *, train, rng):
            full = dict(batch)
            full["object_inp"] = object_inp
            full["place_inp"] = place_inp
            logits, new_bs, aux = mgnns_apply(
                p, bs, consts, full, cfg=model_cfg, train=train, rng=rng,
                use_pallas=args.use_pallas,
            )
            return logits, new_bs, aux.get("head_diversity", 0.0)

    device_put = None
    loader_batch = args.batch_size
    if mesh is not None:
        from mgnns_tpu.parallel.mesh import _BATCH_FIELDS, batch_device_put

        if multihost_active:
            from mgnns_tpu.parallel.multihost import host_local_to_global

            # each host assembles its share of the global batch; the hook
            # stitches per-host shards into global 'data'-sharded arrays
            loader_batch = args.batch_size // jax.process_count()
            device_put = lambda b: host_local_to_global(b, mesh, _BATCH_FIELDS)
        else:
            device_put = lambda b: batch_device_put(b, mesh)

    def split_num_batches(ds, per_host_batch):
        """Forced per-epoch batch count (identical across hosts), or None
        for the loader's natural count when single-process."""
        if multihost_active:
            from mgnns_tpu.parallel.multihost import epoch_num_batches

            return epoch_num_batches(ds.global_len,
                                     per_host_batch * jax.process_count())
        return None

    # LR-schedule epoch length counts APPLIED optimizer steps actually run
    # per epoch: the loader's batch count (per-host batch under multihost)
    # over the accumulation factor.
    train_batches = (split_num_batches(train_ds, loader_batch)
                     or (len(train_ds) + loader_batch - 1) // loader_batch)
    steps_per_epoch = max(1, train_batches // args.grad_accumulation_steps)
    engine = Engine(
        apply_fn, params, batch_stats,
        num_classes=args.num_labels, lr=args.lr, lrp=args.lrp,
        weight_decay=args.weight_decay, steps_per_epoch=steps_per_epoch,
        epoch_step=args.epoch_step, faithful_param_groups=args.faithful_param_groups,
        accumulation_steps=args.grad_accumulation_steps,
        freeze_trunks=args.freeze_trunks and not args.text_only,
        aux_loss_weight=args.regu_weight,
        seed=args.seed,
        checkpoint_dir=os.path.join(args.save_model_path, args.model_name),
        max_to_keep=args.max_to_keep, mesh=mesh, param_sharding_rules=rules,
        fused_segments=args.fused_segments,
    )

    eval_batch = loader_batch
    if args.eval_batch_size:
        eval_batch = args.eval_batch_size
        if multihost_active:
            eval_batch //= jax.process_count()

    # Greedy HBM budget for device-resident pixel tables (train first —
    # it reships every epoch otherwise; splits past the budget use the
    # per-batch upload path).
    _device_images_for: dict = {}
    if args.device_text and args.multihost and mesh is None:
        raise SystemExit("--device_text under --multihost needs a mesh "
                         "(--mesh_data/--mesh_model) for SPMD table sharding")
    if args.device_images and not args.device_text and mesh is not None:
        # the SPMD fused epoch gathers ALL inputs from sharded tables; with
        # pixels resident but text streaming there is no fused plan, so the
        # granted tables would silently never be used (pixels would re-ship
        # per batch — the exact path the tables exist to avoid)
        raise SystemExit("--device_images under a mesh requires "
                         "--device_text (the fused SPMD epoch gathers all "
                         "inputs from device-resident tables)")
    # HBM budgeting is per CHIP: under a mesh the tables shard over the
    # 'data' axis, so each device holds only its position's rows
    data_shards = mesh.shape["data"] if mesh is not None else 1
    input_hbm_budget = args.device_images_budget_gb * 1e9
    if args.device_images:
        for ds in (train_ds, val_ds, test_ds):
            if id(ds) in _device_images_for:
                continue
            size = (len(ds) * args.image_size * args.image_size * 3
                    / max(1, data_shards))
            grant = size <= input_hbm_budget and ds.cacheable_images()
            _device_images_for[id(ds)] = grant
            if grant:
                input_hbm_budget -= size
        granted = sum(_device_images_for.values())
        print(f"device_images: {granted}/{len(_device_images_for)} split tables "
              f"within {args.device_images_budget_gb} GB budget")

    _loader_cache: dict = {}

    def loader(ds, shuffle, reused=True):
        # ONE loader per split: its internal epoch counter advances every
        # iteration so shuffling order and augmentation draws differ each
        # epoch (a fresh instance per epoch would replay epoch 0 forever).
        # Same (dataset, shuffle) pair -> same loader, so a val split that
        # doubles as the test split shares its device caches/image table.
        key = (id(ds), shuffle)
        if key not in _loader_cache:
            dev_imgs = _device_images_for.get(id(ds), False)
            per_host = loader_batch if shuffle else eval_batch
            _loader_cache[key] = DeviceLoader(
                ds, per_host, shuffle=shuffle,
                seed=args.seed, num_threads=args.workers, with_images=with_images,
                device_put=device_put, num_batches=split_num_batches(ds, per_host),
                # caching pixel batches only pays when the loader is
                # iterated more than once (pixel-free batches are cheap
                # either way with a device table)
                cache_device_batches=(args.cache_eval_batches and not shuffle
                                      and (reused or dev_imgs)),
                # cached eval batches share the input-HBM budget with the
                # pixel tables: cache what fits, stream the rest (a full
                # 10k x 448px eval cache next to a train pixel table
                # otherwise OOMs the chip mid-training).  The remaining
                # budget is split across the distinct eval splits.
                cache_budget_bytes=int(input_hbm_budget
                                       / max(1, len({id(val_ds), id(test_ds)}))),
                device_images=dev_imgs,
                device_text=args.device_text,
                # SPMD input: under a mesh the tables shard position-major
                # over 'data' and fused epochs gather shard-locally
                # (parallel/input.py); streaming falls back to host batches
                # through the device_put hook
                mesh=mesh,
            )
        ld = _loader_cache[key]
        return lambda: ld

    # --resume semantics (reference engine/...:347-357 resumes from an
    # explicit file): bare --resume = this run's latest; a directory = that
    # Orbax checkpoint; a .pth[.tar] = imported reference weights.
    resume_latest = False
    if args.resume == "latest":
        resume_latest = True
    elif args.resume:
        if os.path.isdir(args.resume) and not args.resume.endswith((".pth", ".pth.tar", ".pt")):
            engine.restore_from_dir(args.resume)
            print(f"resumed train state from {args.resume} (epoch {engine.epoch})")
        elif os.path.isfile(args.resume):
            if args.text_only:
                raise SystemExit("--resume <torch ckpt> needs the fusion "
                                 "model; drop --text_only")
            from mgnns_tpu.models.import_reference import import_reference_state_dict

            sd, meta = load_torch_state_dict(args.resume)
            p_imp, bs_imp = import_reference_state_dict(
                sd, num_layers=args.num_layers,
                bidirectional=args.bidirectional, stack_num=args.stack_num)
            engine.load_model_state(p_imp, bs_imp)
            if "epoch" in meta:
                # the reference stores the NEXT epoch index (engine/...:390)
                engine.epoch = int(meta["epoch"])
            if "best_score" in meta:
                engine.best_score = float(meta["best_score"])
            print(f"resumed weights from torch checkpoint {args.resume} "
                  f"(epoch {engine.epoch}, fresh optimizer)")
        else:
            raise SystemExit(f"--resume: {args.resume!r} is neither a "
                             f"checkpoint directory nor a .pth[.tar] file")

    run_config = {
        "text_min_count": args.text_min_count, "ngram": args.ngram,
        "window_size": args.window_size, "object_t": args.object_t_value,
        "place_t": args.place_t_value, "batch_size": args.batch_size, "lr": args.lr,
    }
    tag = (f"text_min_count_{args.text_min_count}_ngram_{args.ngram}"
           f"_window_{args.window_size}_bts_{args.batch_size}.txt")
    result_paths = {
        "experiment": os.path.join(args.save_experiment_result_path, args.model_name, tag),
        "pred": os.path.join(args.save_pred_result_path, args.model_name, tag),
        "label_names": list(json.load(open(os.path.join(args.data_root_path, "label.json")))),
    }

    try:
        if args.evaluate:
            res = engine.learning(
                loader(train_ds, True), loader(val_ds, False),
                loader(test_ds, False, reused=(test_ds is val_ds)),
                max_epochs=args.epochs, resume=resume_latest,
                log_every=args.print_freq, result_paths=result_paths, run_config=run_config,
                profile_dir=args.profile_dir, metrics_path=args.metrics_path,
            )
        else:
            res = engine.learning(
                loader(train_ds, True), loader(val_ds, False), None,
                max_epochs=args.epochs, resume=resume_latest,
                log_every=args.print_freq, profile_dir=args.profile_dir,
                metrics_path=args.metrics_path,
            )
    except Exception as e:
        if "RESOURCE_EXHAUSTED" in str(e) and (args.device_images
                                               or args.device_text):
            # measured boundary: full fine-tune at 448px needs ~9.3 GB of
            # step workspace, so a 6 GB resident pixel table cannot coexist
            # on a 16 GB chip even per-batch (results/r4, seg448 probe)
            raise SystemExit(
                "out of device HBM: the resident input tables plus the "
                "train-step workspace exceed device memory at this config. "
                "Options: drop --device_images (per-batch pixel upload), "
                "lower --device_images_budget_gb, or shrink the step "
                "(--freeze_trunks, --remat_policy block, smaller -b or "
                "--image_size).") from e
        raise
    return res


def cli(argv=None) -> int:
    """Console-script entry point (``mgnns-train``): setuptools wraps it in
    ``sys.exit(...)``, and :func:`main`'s result dict would read as a failure
    exit code — discard it."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()

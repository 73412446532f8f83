"""Typed configuration for MGNNS-TPU.

Mirrors the reference's argparse surface (reference
``Tumblr_Multi_GCN_Multihead_Att.py:12-81``) as dataclasses, replacing the two
untyped ``opt``/``state`` dicts (reference ``:100-112`` and ``:170-196``).
Defaults reproduce the reference's canonical hyperparameters.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TextGraphConfig:
    """Parameters of the global PMI word graph and per-doc windowed subgraphs.

    Reference: ``utils/pmi.py:28`` (window_size, min_cooccurence),
    ``models/Text_GCN.py:83`` (ngram), ``Tumblr_...py:26-33``.
    """

    text_min_count: int = 5      # vocab frequency threshold
    window_size: int = 6         # PMI co-occurrence window
    ngram: int = 4               # per-doc sliding-window edge radius
    min_cooccurrence: int = 2    # pair-count threshold
    max_len: int = 100           # hard cap on tokens per document

    @property
    def window_width(self) -> int:
        """Number of window slots per position in the per-doc graph: +/-ngram
        plus the center (which doubles as the reference's explicit self-loop,
        ``models/Text_GCN.py:163-164``)."""
        return 2 * self.ngram + 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters of the MGNNS fusion model.

    Defaults follow reference ``Tumblr_...py:15-24`` and
    ``models/Multi_GCN_Multihead_att.py:135-351``.
    """

    num_labels: int = 7             # 7 TumEmo emotions / 3 for MVSA
    vocab_size: int = 20153         # len(vocab-5.txt); set from data in practice
    emb_size: int = 300             # GloVe dim
    hidden_size: int = 150          # LSTM hidden per direction
    num_layers: int = 2             # LSTM layers
    bidirectional: bool = True
    dropout: float = 0.5
    stack_num: int = 2              # cross-modal MHA stack depth
    n_head: int = 4                 # cross-modal MHA heads
    d_kv: int = 128                 # per-head dim in cross-modal MHA
    is_regu: bool = False           # head-diversity regularizer
    n_label_heads: int = 5          # heads in label-query image attention
    object_num_classes: int = 80    # COCO objects
    place_num_classes: int = 365    # Places365 scenes
    object_t: float = 0.4           # co-occurrence binarization threshold
    place_t: float = 0.3
    gama: float = 0.2               # gen_A reweight p (reference utils/util.py:396)
    in_channel: int = 300           # image-GCN input dim (label GloVe)
    gcn_hidden: int = 1024          # gc1 out (reference :304)
    gcn_out: int = 2048             # gc2 out (reference :305)
    image_size: int = 448
    text_dropout: float = 0.5
    # Number of edges in the PMI graph incl. reserved id 0; set from data.
    edges_num: int = 1
    # True reproduces the reference's trainable-from-1.0 edge weights
    # (models/Text_GCN.py:68); False initializes from PMI values (:72).
    trainable_edges_init_one: bool = True
    # bfloat16 compute for conv/matmul-heavy paths (params stay f32).
    compute_dtype: str = "float32"
    # 'batch' = train-mode BatchNorm like the reference; 'frozen' = running
    # stats only (recommended for fine-tuning on TPU).
    bn_mode: str = "batch"
    # jax.checkpoint the ResNet trunks: trades recompute for activation
    # memory, enabling much larger batches at 448px.
    remat_trunks: bool = False
    # Rematerialization granularity for the trunks: 'none', 'trunk' (one
    # jax.checkpoint around the whole trunk — cheapest memory, recomputes the
    # full forward in the backward), or 'block' (checkpoint each bottleneck
    # block — keeps stage boundaries resident so the backward re-runs only
    # one block at a time; the standard policy for deep conv stacks at large
    # batch).  remat_trunks=True is kept as an alias for 'trunk'.
    remat_policy: str = "none"
    # Unroll the per-stage residual-block scans.  The scan formulation
    # compiles an order of magnitude faster (one block body per stage);
    # unrolling lets XLA schedule each block's backward individually, ~19%
    # faster ResNet-101 fwd+bwd (measured).  Eval perf is unchanged.
    unroll_trunks: bool = False
    # Feature-extraction fine-tuning: stop gradients at the trunk outputs
    # (skips the entire conv backward, ~4x train throughput) and freeze the
    # trunk parameters in the optimizer.  The reference always fine-tunes
    # the trunks at lr*lrp; this is a documented TPU-native extension.
    freeze_trunks: bool = False
    # Space-to-depth stem: compute the 7x7/stride-2 stem conv as the exact
    # equivalent 4x4/stride-1 conv over a space-to-depth-2 input (the MLPerf
    # ResNet TPU trick; nn/resnet.py:stem_s2d_apply).  Same multiply-adds
    # and unchanged parameters/checkpoints — only the XLA lowering changes
    # (3-channel stride-2 convs are the one shape XLA:TPU lowers poorly).
    stem_s2d: bool = False

    @property
    def bi_hidden_size(self) -> int:
        return (2 if self.bidirectional else 1) * self.hidden_size

    @property
    def d_model(self) -> int:
        return self.bi_hidden_size

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def feat_hw(self) -> int:
        """Spatial size of the trunk feature map (image_size/32)."""
        return self.image_size // 32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization/runtime settings (reference ``Tumblr_...py:39-68`` and the
    engine, ``engine/Multi_GCN_Multihead_Att_engine.py``)."""

    batch_size: int = 16
    epochs: int = 10
    lr: float = 5e-5
    lrp: float = 0.1                 # multiplier for pretrained ResNet trunks
    weight_decay: float = 1e-5
    epoch_step: Sequence[int] = (10,)  # epochs at which lr *= lr_decay
    lr_decay: float = 0.2            # reference engine :651
    grad_clip: float = 10.0          # reference engine :848
    seed: int = 0
    # True reproduces the reference exactly: only the parameter groups listed
    # in get_config_optim (models/Multi_GCN_Multihead_att.py:569-585) receive
    # updates; the embedding, image-linear maps, classifier head and A
    # matrices are frozen.  False optimizes every parameter (classifier/etc.
    # at base lr), which is almost certainly what was intended.
    faithful_param_groups: bool = False
    workers: int = 4
    print_freq: int = 10
    evaluate: bool = False
    resume: str | None = None
    model_name: str = "mgnns_tpu"
    save_model_path: str = "checkpoint"
    save_experiment_result_path: str = "result/experiment_result"
    save_pred_result_path: str = "result/pred_result"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Filesystem layout of the dataset artifacts (reference ``data/``)."""

    data_root_path: str = "data"
    dataset: str = "tumblr"
    object_inp_name: str = "data/glove/object_glove_word2vec.pkl"
    place_inp_name: str = "data/glove/place_glove_word2vec.pkl"
    label_glove_name: str = "data/tumblr_label_glove.pkl"
    object_adj_file: str = "data/adj/tumblr_objects_adj.pkl"
    place_adj_file: str = "data/adj/tumblr_resnet50_places_adj.pkl"
    # Where image files live; records in the anno JSONL reference paths
    # relative to the repo root.  'synthetic' generates deterministic pixels
    # for records whose image file is missing (the reference checkout ships
    # no image data).
    image_root: str = "."
    image_backend: str = "synthetic"  # 'pil' | 'synthetic'


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit execution.

    The flagship layout is a 2-D ('data', 'model') mesh: batch sharded over
    'data'; the large text-graph tables (vocab embedding, edge weights) and
    wide projection matrices sharded over 'model'.
    """

    data: int = 1
    model: int = 1

    @property
    def size(self) -> int:
        return self.data * self.model


@dataclasses.dataclass(frozen=True)
class Config:
    graph: TextGraphConfig = dataclasses.field(default_factory=TextGraphConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

"""MGNNS-TPU: a TPU-native multimodal multi-channel graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
MGNNS codebase (YangXiaocui1215/MGNNS, ACL 2021): multimodal sentiment/emotion
detection fusing a text-level GCN channel, an image-object GCN channel and an
image-scene GCN channel via stacked multi-head cross attention.

Layering (host -> device):

- :mod:`mgnns_tpu.graphs`   — host-side graph construction (vocab, PMI word
  graph, object/scene co-occurrence adjacency).  Pure numpy, vectorized,
  sparse; replaces the reference's O(V^2) Python loops.
- :mod:`mgnns_tpu.nn`       — functional neural-net primitives (pure pytree
  params + apply functions): linear/layernorm/embedding, masked BiLSTM,
  multi-head cross attention, label-query attention, ResNet trunks, dense
  image GCN, and the windowed text-level GCN with edge-weighted
  max-aggregation.
- :mod:`mgnns_tpu.kernels`  — Pallas TPU kernels for the hot custom ops.
- :mod:`mgnns_tpu.models`   — the full MGNNS fusion model and the text-only
  slice, as jittable pure functions.
- :mod:`mgnns_tpu.engine`   — jitted train/eval steps, optimizer with
  per-group learning rates, on-device confusion-matrix metrics, Orbax
  checkpointing, LR schedule.
- :mod:`mgnns_tpu.data`     — host input pipeline: JSONL annotations,
  tokenization, static-shape padding, image decode + Warp/MultiScaleCrop
  transforms, prefetch to device.
- :mod:`mgnns_tpu.parallel` — device mesh + named-sharding rules for
  data/model parallel execution via jit over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

"""Named-sharding rules: parameter-path regex -> PartitionSpec.

Model-parallel layout rationale (Megatron-style, expressed declaratively and
realized by XLA's SPMD partitioner — no hand-written collectives):

- the big text-graph tables (vocab embedding [V, 300], GCN node embedding
  [V, 300], edge weights [E, 1]) shard their huge leading axis over 'model';
  gathers at batch indices become cross-shard collectives XLA schedules over
  ICI.  This is what lets 100k+ vocabularies / tens of millions of PMI edges
  scale past one chip's HBM.
- attention projections shard the fused head axis (column-parallel in,
  row-parallel out) so each chip computes a head subset;
- the image-GCN pair gc1/gc2 is column- then row-parallel (the classic
  two-matmul split with one reduce);
- ResNet trunks replicate (they are batch-parallel-dominated at these sizes);
- everything unmatched replicates.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mgnns_param_rules() -> list[tuple[str, P]]:
    return [
        (r"text_gcn/node_embedding", P("model", None)),
        (r"text_gcn/edge_weight", P("model", None)),
        (r"embedding/table", P("model", None)),
        (r".*mha.*/slf_attn/w_[qkv]s/w", P(None, "model")),
        (r".*mha.*/slf_attn/w_[qkv]s/b", P("model")),
        (r".*mha.*/slf_attn/fc/w", P("model", None)),
        (r".*mha.*/pos_ffn/w_1/w", P(None, "model")),
        (r".*mha.*/pos_ffn/w_1/b", P("model")),
        (r".*mha.*/pos_ffn/w_2/w", P("model", None)),
        (r"gc1/w", P(None, "model")),
        (r"gc2/w", P("model", None)),
        (r"liner_img_(object|place)/w", P("model", None)),
        (r"multi_linear_1/w", P("model", None)),
    ]


def text_model_param_rules() -> list[tuple[str, P]]:
    return [
        (r"text_gcn/node_embedding", P("model", None)),
        (r"text_gcn/edge_weight", P("model", None)),
    ]


def batch_spec() -> P:
    return P("data")


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def resolve_spec(path_string: str, rules: list[tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path_string):
            return spec
    return P()


# Gather tables whose leading axis may be zero-padded to a mesh-axis
# multiple: rows past the real size are never indexed (token/edge ids are
# < V / < E), receive zero gradient, and round-trip through checkpoints.
# This is what makes the 'model'-axis rules REAL at flagship sizes — the
# reference vocab is 20,153 (odd) and E ≈ 166k+1, so without padding every
# table would silently fall back to replication on any model axis >= 2.
_PADDABLE_TABLES = (
    r"text_gcn/node_embedding",
    r"text_gcn/edge_weight",
    r"embedding/table",
)


def _is_paddable(path_string: str) -> bool:
    return any(re.fullmatch(p, path_string) for p in _PADDABLE_TABLES)


def pad_dim_to_multiple(leaf, dim: int, multiple: int):
    """Zero-pad ``leaf`` along ``dim`` up to the next multiple."""
    import jax.numpy as jnp

    rem = leaf.shape[dim] % multiple
    if rem == 0:
        return leaf
    widths = [(0, 0)] * leaf.ndim
    widths[dim] = (0, multiple - rem)
    return jnp.pad(leaf, widths)


def shard_pytree(tree, mesh: Mesh, rules: list[tuple[str, P]], *, pad_tables: bool = True):
    """device_put every leaf with the NamedSharding its path resolves to.

    Gather tables (``_PADDABLE_TABLES``) whose leading dim does not divide the
    mesh axis are zero-padded up to the next multiple so they actually shard.
    Any other leaf whose matched spec does not divide its shape evenly falls
    back to replication (padding a matmul operand would corrupt the
    contraction; padding a gather table is free).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(path, leaf):
        ps = _path_str(path)
        spec = resolve_spec(ps, rules)
        if spec != P():
            for dim, name in enumerate(spec):
                if name is None:
                    continue
                if dim >= leaf.ndim:
                    spec = P()
                    break
                if leaf.shape[dim] % axis_sizes[name] != 0:
                    if pad_tables and dim == 0 and _is_paddable(ps):
                        leaf = pad_dim_to_multiple(leaf, dim, axis_sizes[name])
                    else:
                        spec = P()
                        break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)

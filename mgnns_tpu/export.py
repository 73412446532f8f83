"""AOT model export: package a trained model as a portable serving artifact.

The reference has no deployment format at all — its checkpoints are pickled
torch ``state_dict``s that require the full model-construction code (and the
same class definitions) at load time (``engine/...:624-643``).  The
TPU-native equivalent is :mod:`jax.export`: the jitted probability forward is
serialized as **versioned StableHLO** — loadable in a fresh process without
the model code, without a re-trace, and lowered for BOTH ``cpu`` and ``tpu``
so one artifact exported anywhere serves unchanged on either platform.

Artifact layout (one directory)::

    model.jaxexport    serialized jax.export.Exported (StableHLO bytecode)
    params.npz         flattened params/batch_stats leaves
    params_tree.json   keypath skeleton that rebuilds the pytrees
    preproc.npz/json   vocab, PMI graph, label map, graph config
    meta.json          text_only / image_size / max_batch / input template

Weights stay OUTSIDE the program (the exported fn takes them as arguments):
the .npz can be swapped for a newer fine-tune without re-exporting, and the
StableHLO stays small.  The graph constants the model closes over
(object/place GloVe inputs, normalized adjacencies, label embeddings) are
baked into the program as literals — they are part of the architecture, not
the training state.

Usage::

    from mgnns_tpu.export import export_predictor, load_exported
    export_predictor(predictor, "artifacts/mgnns-v1")
    pred = load_exported("artifacts/mgnns-v1")       # no model code needed
    pred.predict([{"text": "what a wonderful day"}])
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.serving import Predictor, load_preproc, save_preproc

EXPORT_FILE = "model.jaxexport"
PARAMS_NPZ = "params.npz"
TREE_JSON = "params_tree.json"
META_JSON = "meta.json"

# ------------------------------------------------------------------ pytrees


def _flatten_with_paths(tree):
    """(paths, leaves) where each path is a list of [tag, key] steps —
    tag 'k' for a dict key, 'i' for a sequence index — JSON-round-trippable
    without a pickled treedef."""
    paths, leaves = [], []

    def walk(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], path + [["k", k]])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [["i", i]])
        else:
            paths.append(path)
            leaves.append(node)

    walk(tree, [])
    return paths, leaves


def _unflatten_from_paths(paths, leaves):
    if not paths:
        return {}
    if not paths[0]:  # a bare leaf
        return leaves[0]
    root: dict | list = {} if paths[0][0][0] == "k" else []

    def ensure(container, step, nxt):
        tag, key = step
        empty = ({} if nxt[0] == "k" else []) if nxt is not None else None
        if tag == "k":
            if empty is not None and key not in container:
                container[key] = empty
            return container.get(key)
        while len(container) <= key:
            container.append(None)
        if empty is not None and container[key] is None:
            container[key] = empty
        return container[key]

    for path, leaf in zip(paths, leaves):
        node = root
        for d, step in enumerate(path[:-1]):
            node = ensure(node, step, path[d + 1])
        tag, key = path[-1]
        if tag == "k":
            node[key] = leaf
        else:
            while len(node) <= key:
                node.append(None)
            node[key] = leaf
    return root


def save_weights(out_dir: str, params, batch_stats) -> None:
    tree = {"params": params, "batch_stats": batch_stats}
    paths, leaves = _flatten_with_paths(tree)
    np.savez_compressed(
        os.path.join(out_dir, PARAMS_NPZ),
        **{str(i): np.asarray(l) for i, l in enumerate(leaves)})
    with open(os.path.join(out_dir, TREE_JSON), "w") as f:
        json.dump(paths, f)


def load_weights(out_dir: str):
    with open(os.path.join(out_dir, TREE_JSON)) as f:
        paths = json.load(f)
    z = np.load(os.path.join(out_dir, PARAMS_NPZ))
    # place on device ONCE here — raw numpy leaves would be re-uploaded on
    # every jitted serving call
    leaves = [jnp.asarray(z[str(i)]) for i in range(len(paths))]
    tree = _unflatten_from_paths(paths, leaves)
    # empty containers carry no leaves, so they vanish in the flattening —
    # e.g. text-only models have batch_stats == {}
    return tree.get("params", {}), tree.get("batch_stats", {})


# ------------------------------------------------------------------- export


def _example_batch(pred: Predictor) -> dict:
    """A max_batch-shaped input template with the Predictor's exact
    preprocessing shapes/dtypes (the exported program is fixed-shape, like
    every serving call the Predictor makes)."""
    B = pred.max_batch
    ids, lens, mask, eids = pred._encode_text(["export template"] * B)
    batch = {"ids": np.asarray(ids), "lens": np.asarray(lens),
             "mask": np.asarray(mask), "eids": np.asarray(eids)}
    if not pred.text_only:
        batch["image"] = np.zeros(
            (B, pred.image_size, pred.image_size, 3), np.uint8)
    return batch


def export_predictor(pred: Predictor, out_dir: str,
                     platforms: tuple[str, ...] = ("cpu", "tpu")) -> None:
    """Write a self-contained serving artifact for ``pred`` to ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    batch = _example_batch(pred)
    args = (pred.params, pred.batch_stats, batch)
    # read shape/dtype attributes directly — np.asarray on a jax.Array leaf
    # would D2H-copy every parameter (hundreds of MB of trunk weights) just
    # to inspect its dtype
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype),
        args)
    exported = jax.export.export(
        pred._fwd, platforms=tuple(platforms))(*abstract)
    with open(os.path.join(out_dir, EXPORT_FILE), "wb") as f:
        f.write(exported.serialize())
    save_weights(out_dir, pred.params, pred.batch_stats)
    label_map = {v: k for k, v in pred.idx2label.items()}
    save_preproc(out_dir, pred.vocab, pred.graph, label_map, pred.graph_cfg)
    with open(os.path.join(out_dir, META_JSON), "w") as f:
        json.dump({
            "format_version": 1,
            "text_only": pred.text_only,
            "image_size": pred.image_size,
            "image_backend": pred.image_backend,
            "max_batch": pred.max_batch,
            "platforms": list(platforms),
            "jax_version": jax.__version__,
            "batch_template": {k: [list(v.shape), str(v.dtype)]
                               for k, v in batch.items()},
        }, f, indent=1)


def load_exported(
    out_dir: str,
    *,
    image_root: str = ".",
    image_backend: str | None = None,
    strict_images: bool = True,
) -> Predictor:
    """Rebuild a :class:`Predictor` from an exported artifact directory.

    Needs no model-construction code and performs no re-trace: the forward
    is the deserialized StableHLO program, compiled by XLA for whatever
    platform this process runs on (it must be one of the artifact's
    ``platforms``).
    """
    with open(os.path.join(out_dir, META_JSON)) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, EXPORT_FILE), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    params, batch_stats = load_weights(out_dir)
    pre = load_preproc(out_dir)
    if pre is None:
        raise FileNotFoundError(f"no preproc artifacts in {out_dir}")
    vocab, graph, label_map, graph_cfg = pre

    pred = Predictor(
        vocab=vocab, graph=graph, graph_cfg=graph_cfg, label_map=label_map,
        # placeholder apply_fn; the jitted probs forward is replaced below
        apply_fn=lambda p, bs, batch: None,
        params=params, batch_stats=batch_stats,
        image_size=meta["image_size"],
        image_backend=image_backend or meta["image_backend"],
        image_root=image_root, max_batch=meta["max_batch"],
        text_only=meta["text_only"], strict_images=strict_images,
        # the artifact holds ONE compiled shape — no smaller buckets
        batch_buckets=[meta["max_batch"]],
    )
    # the exported program IS probs = softmax(logits) (Predictor._fwd was
    # exported); call it directly — dict arg order is pytree(sorted keys),
    # matching the export-time flattening
    pred._fwd = jax.jit(lambda p, bs, batch: exported.call(p, bs, batch))
    return pred

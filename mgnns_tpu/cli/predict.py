"""Prediction CLI: classify raw (text, image) posts with a trained model.

The serving counterpart of the training CLI (the reference has no inference
entry point at all).  Input: a JSONL of records with at least a ``text``
field (``image`` optional); output: one JSON result per line.

Example::

    python -m mgnns_tpu.cli.predict --data_root_path data \
        --checkpoint checkpoint/mgnns_tpu --text_only \
        --input posts.jsonl --output preds.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MGNNS-TPU prediction")
    p.add_argument("--data_root_path", default=None)
    p.add_argument("--checkpoint", default=None, help="engine checkpoint dir")
    p.add_argument("--from_exported", default=None,
                   help="serve a jax.export artifact directory (see "
                        "--export_model); --data_root_path/--checkpoint are "
                        "then not needed")
    p.add_argument("--export_model", default=None,
                   help="write a portable AOT serving artifact (StableHLO + "
                        "weights + preproc) to this directory and exit; "
                        "--input is then not needed")
    p.add_argument("--input", default=None, help="JSONL of {'text', 'image'?}")
    p.add_argument("--output", default=None, help="output JSONL (default stdout)")
    p.add_argument("--text_only", action="store_true")
    p.add_argument("--pmi_phase", default="train")
    p.add_argument("--image_backend", default="pil", choices=["pil", "synthetic"])
    p.add_argument("--image_root", default=".")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--step", type=int, default=None, help="checkpoint step (default latest)")
    p.add_argument("--platform", default=None)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard prediction batches over this many devices")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="shard the gather tables / wide projections over "
                        "this many devices (training's model-parallel rules)")
    return p


def make_mesh(args):
    if args.mesh_data * args.mesh_model <= 1:
        return None
    if args.from_exported:
        raise SystemExit(
            "--mesh_data/--mesh_model need the live model; the exported "
            "StableHLO artifact is a single-logical-device program")
    from mgnns_tpu.parallel.mesh import create_mesh

    return create_mesh(args.mesh_data, args.mesh_model)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from mgnns_tpu.serving import Predictor
    from mgnns_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.from_exported:
        from mgnns_tpu.export import load_exported

        predictor = load_exported(
            args.from_exported, image_root=args.image_root,
            image_backend=args.image_backend)
    else:
        if not (args.data_root_path and args.checkpoint):
            raise SystemExit(
                "--data_root_path and --checkpoint are required "
                "(or pass --from_exported)")
        predictor = Predictor.from_engine_artifacts(
            args.data_root_path, args.checkpoint,
            text_only=args.text_only, pmi_phase=args.pmi_phase,
            image_backend=args.image_backend, image_root=args.image_root,
            max_batch=args.max_batch, step=args.step, mesh=make_mesh(args),
        )
    if args.export_model:
        from mgnns_tpu.export import export_predictor

        export_predictor(predictor, args.export_model)
        print(f"exported serving artifact to {args.export_model}")
        if not args.input:
            return
    if not args.input:
        raise SystemExit("--input is required (or pass --export_model)")
    with open(args.input) as f:
        records = [json.loads(l) for l in f if l.strip()]
    results = predictor.predict(records)
    out = open(args.output, "w") if args.output else sys.stdout
    try:
        for rec, res in zip(records, results):
            res_out = {"id": rec.get("id"), **res}
            out.write(json.dumps(res_out) + "\n")
    finally:
        if args.output:
            out.close()
            print(f"wrote {args.output} ({len(results)} predictions)")


if __name__ == "__main__":
    main()

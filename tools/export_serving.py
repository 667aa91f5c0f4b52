#!/usr/bin/env python3
"""Standalone serving-artifact exporter: checkpoint -> AOT artifact directory.

The serve CLIs can export with --export_artifact, but they also score an
--input_dir; this tool does ONLY the export (tpu_unet/serve_artifact.py) —
the deployment packaging step: build the engine from an Orbax checkpoint
(BN-folded; optional int8 PTQ with calibration images or a saved qparams
.npz), snapshot its compiled-shape program with the params baked in, write
meta.json + program.jaxexport (with --bucket_sizes: a format-v2 artifact —
per-bucket programs + shared params.npz; optionally --heatmap for the anomaly
heatmap program). Reload anywhere with
``tpu_unet.serve_artifact.load_artifact`` or ``--artifact`` on the serve CLIs.

Usage:
  python tools/export_serving.py --engine anomaly \
      --checkpoint outputs/<exp>/checkpoints/best_model --out artifact_dir/
  python tools/export_serving.py --engine seg --num_classes 3 \
      --checkpoint ... --image_height 1024 --image_width 512 --out artifact/ \
      --quantize int8 --calib_dir datasets/KolektorSDD --platforms tpu,cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export an AOT serving artifact "
                                            "from a checkpoint")
    p.add_argument("--engine", type=str, required=True,
                   choices=["anomaly", "seg"])
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="Artifact output directory")
    p.add_argument("--num_classes", type=int, default=4,
                   help="seg only: 4 for Gear, 3 for KolektorSDD")
    p.add_argument("--image_size", type=int, default=256,
                   help="anomaly only (square)")
    p.add_argument("--image_height", type=int, default=512,
                   help="seg only")
    p.add_argument("--image_width", type=int, default=512,
                   help="seg only")
    p.add_argument("--batch_size", type=int, default=None,
                   help="Serving batch baked into the artifact "
                        "(default: 128 anomaly / 16 seg)")
    p.add_argument("--bucket_sizes", type=str, default=None,
                   help="Comma-separated batch-shape ladder (e.g. '1,2,4'): "
                        "exports a format-v2 artifact with one program per "
                        "bucket + shared params.npz — loaded engines pad "
                        "ragged batches to the smallest adequate bucket "
                        "(--batch_size is always the top bucket)")
    p.add_argument("--heatmap", action="store_true",
                   help="anomaly only: also export the heatmap program "
                        "(score + per-pixel anomaly map)")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "f32"])
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8"])
    p.add_argument("--calib_dir", type=str, default=None)
    p.add_argument("--calib_samples", type=int, default=64)
    p.add_argument("--calib_percentile", type=float, default=None)
    p.add_argument("--qparams", type=str, default=None,
                   help="Quantized-params .npz: loaded if it exists (skips "
                        "calibration), else written after calibrating "
                        "(same semantics as the serve CLIs)")
    p.add_argument("--base_features", type=int, default=64)
    p.add_argument("--bilinear", action="store_true")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated lowering platforms (e.g. 'tpu,cpu'); "
                        "default: current backend")
    p.add_argument("--device", type=str, default="auto")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device not in ("auto", "tpu"):
        import jax
        jax.config.update("jax_platforms", args.device)

    from tpu_unet.cli._artifact_common import parse_bucket_sizes
    from tpu_unet.cli._quant_common import (maybe_save_qparams,
                                            resolve_quantization)
    from tpu_unet.serve import AnomalyScorer, SegmentationPredictor
    from tpu_unet.serve_artifact import export_artifact

    if args.heatmap and args.engine != "anomaly":
        raise SystemExit("--heatmap only applies to --engine anomaly")
    size_hw = ((args.image_size, args.image_size) if args.engine == "anomaly"
               else (args.image_height, args.image_width))
    batch_size = args.batch_size or (128 if args.engine == "anomaly" else 16)
    buckets = parse_bucket_sizes(args, batch_size)
    quantize, calib_images, qparams_tree = resolve_quantization(args, size_hw)

    if args.engine == "anomaly":
        engine = AnomalyScorer.from_checkpoint(
            args.checkpoint, image_size=args.image_size,
            batch_size=batch_size, precision=args.precision,
            quantize=quantize, calib_images=calib_images,
            base_features=args.base_features, bilinear=args.bilinear,
            qparams=qparams_tree, calib_percentile=args.calib_percentile,
            with_heatmap=args.heatmap, bucket_sizes=buckets)
    else:
        engine = SegmentationPredictor.from_checkpoint(
            args.checkpoint, num_classes=args.num_classes,
            image_size_hw=size_hw, batch_size=batch_size,
            precision=args.precision, quantize=quantize,
            calib_images=calib_images, base_features=args.base_features,
            bilinear=args.bilinear, qparams=qparams_tree,
            calib_percentile=args.calib_percentile, bucket_sizes=buckets)

    maybe_save_qparams(args, engine, qparams_tree)
    plats = args.platforms.split(",") if args.platforms else None
    meta = export_artifact(engine, args.out, platforms=plats)
    print(f"Artifact written to {args.out}: {meta}")
    return meta


if __name__ == "__main__":
    main()

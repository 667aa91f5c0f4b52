#!/usr/bin/env python3
"""Tiled native-resolution serving benchmark (ops/tiling.py).

Measures SegmentationPredictor throughput when serving NATIVE-resolution
images through the static tile grid versus the reference-style resize path
(the reference downsamples everything to the training shape —
/root/reference/src/dataset.py:91-127 — so its "throughput" silently drops
resolution; the tiled engine keeps every pixel).

Default config mirrors the Gear workload: a 512^2-trained SegmentationUNet
serving 1024^2 native inputs with 512^2 tiles / 64 px overlap (3x3 = 9 tiles
per image, batched through one fixed-shape program). Weights are random —
serving throughput is weight-agnostic (same rationale as bench_serving.py).

Usage: python tools/bench_tiled.py [--image 1024 1024] [--tile 512 512]
                                   [--overlap 64] [--batches 1 2 4] [--int8]
Prints one JSON line per engine config plus a summary comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=int, nargs=2, default=[1024, 1024])
    p.add_argument("--tile", type=int, nargs=2, default=[512, 512])
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4])
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--base_features", type=int, default=64)
    p.add_argument("--precision", type=str, default="bf16")
    p.add_argument("--int8", action="store_true",
                   help="Also bench the int8 PTQ tiled engine")
    p.add_argument("--n_batches", type=int, default=10)
    args = p.parse_args(argv)

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_unet.models import build_model
    from tpu_unet.ops.tiling import tile_offsets
    from tpu_unet.serve import SegmentationPredictor
    from tpu_unet.train import create_train_state, make_optimizer

    ih, iw = args.image
    th, tw = args.tile
    n_tiles = (len(tile_offsets(ih, th, th - args.overlap))
               * len(tile_offsets(iw, tw, tw - args.overlap)))
    model = build_model("seg_unet", n_classes=args.num_classes,
                        base_features=args.base_features)
    state = create_train_state(model, jax.random.key(0), (1, th, tw, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (16, th, tw, 3), dtype=np.uint8)

    results = {"device": str(jax.devices()[0]),
               "image_hw": [ih, iw], "tile_hw": [th, tw],
               "overlap": args.overlap, "tiles_per_image": n_tiles,
               "configs": {}}
    modes = [("bf16", None)] + ([("int8", "int8")] if args.int8 else [])
    for mode_name, quant in modes:
        for b in args.batches:
            pred = SegmentationPredictor.from_variables(
                state.params, state.batch_stats,
                num_classes=args.num_classes, image_size_hw=(ih, iw),
                batch_size=b, precision=args.precision,
                base_features=args.base_features,
                quantize=quant, calib_images=calib if quant else None,
                tile_hw=(th, tw), tile_overlap=args.overlap)
            ips = pred.throughput(args.n_batches)
            key = f"tiled_{mode_name}_b{b}"
            results["configs"][key] = {
                "native_images_per_sec": round(ips, 2),
                "tiles_per_sec": round(ips * n_tiles, 1),
                "mpix_per_sec": round(ips * ih * iw / 1e6, 1),
            }
            print(f"{key}: {ips:.2f} native img/s "
                  f"({ips * n_tiles:.1f} tiles/s)", file=sys.stderr, flush=True)
        # Resize-path context: the same model serving TRAINING-shape inputs
        # (what the reference's resize pipeline feeds it). Same batch count of
        # PIXELS as one tile — images/sec here are resized images.
        pred = SegmentationPredictor.from_variables(
            state.params, state.batch_stats, num_classes=args.num_classes,
            image_size_hw=(th, tw), batch_size=max(args.batches),
            precision=args.precision, base_features=args.base_features,
            quantize=quant, calib_images=calib if quant else None)
        ips = pred.throughput(args.n_batches)
        results["configs"][f"resized_{mode_name}_b{max(args.batches)}"] = {
            "resized_images_per_sec": round(ips, 2),
            "mpix_per_sec": round(ips * th * tw / 1e6, 1),
        }
        print(f"resized_{mode_name}: {ips:.2f} img/s at {th}x{tw}",
              file=sys.stderr, flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()

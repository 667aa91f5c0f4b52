#!/usr/bin/env python3
"""Full MVTec sweep: train + evaluate every category, aggregate a summary.

BASELINE.md config 5 ("Full 15-category MVTec sweep with per-anomaly-type
pixel/image-level eval"). For each category found under --data_root this runs the
train CLI then the test CLI on the best checkpoint, and writes
``sweep_summary.json`` with per-category image/pixel metrics plus mean AUROC/AUPRC.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from tpu_unet.data.mvtec import get_available_categories
from tpu_unet.utils import save_json


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="MVTec all-category sweep")
    parser.add_argument("--data_root", type=str, default="../datasets/mvtec_anomaly_detection")
    parser.add_argument("--categories", type=str, nargs="*", default=None,
                        help="Subset of categories (default: all found)")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "anomaly_unet"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--optimizer", type=str, default="adam")
    parser.add_argument("--scheduler", type=str, default="cosine")
    parser.add_argument("--use_ssim", action="store_true")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_dir", type=str, default="../outputs")
    parser.add_argument("--output_dir", type=str, default="../sweep_results")
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--base_features", type=int, default=64)
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--debug_samples", type=int, default=20)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from tpu_unet.cli.test_mvtec import main as test_main
    from tpu_unet.cli.train_mvtec import main as train_main

    categories = args.categories or get_available_categories(args.data_root)
    if not categories:
        print(f"No categories found under {args.data_root}")
        return None
    print(f"Sweeping {len(categories)} categories: {categories}")

    os.makedirs(args.output_dir, exist_ok=True)
    summary = {"args": vars(args), "categories": {}}

    for category in categories:
        print(f"\n{'=' * 60}\n=== {category} ===\n{'=' * 60}")
        train_argv = [
            "--data_root", args.data_root, "--category", category,
            "--image_size", str(args.image_size), "--model", args.model,
            "--epochs", str(args.epochs), "--batch_size", str(args.batch_size),
            "--learning_rate", str(args.learning_rate),
            "--optimizer", args.optimizer, "--scheduler", args.scheduler,
            "--num_workers", str(args.num_workers), "--seed", str(args.seed),
            "--save_dir", args.save_dir, "--precision", args.precision,
            "--base_features", str(args.base_features),
        ]
        if args.n_devices:
            train_argv += ["--n_devices", str(args.n_devices)]
        if args.use_ssim:
            train_argv.append("--use_ssim")
        if args.debug:
            train_argv += ["--debug", "--debug_samples", str(args.debug_samples)]
        exp_dir = train_main(train_argv)
        if exp_dir is None:
            summary["categories"][category] = {"error": "training failed"}
            continue
        best = os.path.join(exp_dir, "checkpoints", "best_model")

        test_argv = [
            "--data_root", args.data_root, "--category", category,
            "--image_size", str(args.image_size), "--model", args.model,
            "--batch_size", str(args.batch_size),
            "--num_workers", str(args.num_workers),
            "--checkpoint", best,
            "--output_dir", os.path.join(args.output_dir, "per_category"),
            "--precision", args.precision,
            "--base_features", str(args.base_features),
        ]
        if args.n_devices:
            test_argv += ["--n_devices", str(args.n_devices)]
        if args.debug:
            test_argv += ["--debug", "--debug_samples", str(args.debug_samples)]
        evaluation = test_main(test_argv)
        summary["categories"][category] = {
            "experiment_dir": exp_dir,
            "image_metrics": evaluation["image_metrics"],
            "pixel_metrics": evaluation["pixel_metrics"],
            "type_metrics": evaluation["type_metrics"],
        }

    aurocs = [c["image_metrics"]["auroc"] for c in summary["categories"].values()
              if "image_metrics" in c]
    auprcs = [c["image_metrics"]["auprc"] for c in summary["categories"].values()
              if "image_metrics" in c]
    summary["mean_image_auroc"] = float(np.mean(aurocs)) if aurocs else None
    summary["mean_image_auprc"] = float(np.mean(auprcs)) if auprcs else None

    save_json(summary, os.path.join(args.output_dir, "sweep_summary.json"))
    print(f"\nSweep complete. Mean image AUROC: {summary['mean_image_auroc']}")
    print(f"Summary: {os.path.join(args.output_dir, 'sweep_summary.json')}")
    return summary


if __name__ == "__main__":
    main()

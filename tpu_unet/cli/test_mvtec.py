#!/usr/bin/env python3
"""Test UNet/AnomalyUNet on MVTec (TPU-native).

CLI parity with /root/reference/src/test.py:22-63 (same flags/defaults), writing the
same artifacts: test_metrics.json, confusion_matrix.png, detailed_results.json, and
optional visualizations.png — with per-anomaly-type metrics and threshold-sweep
pixel metrics (/root/reference/src/test.py:136-184).
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import jax
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.loader import DataLoader
from tpu_unet.data.mvtec import MVTecDataset, get_available_categories
from tpu_unet.metrics import calculate_metrics, calculate_pixel_metrics, get_optimal_threshold
from tpu_unet.models import build_model
from tpu_unet.parallel import make_mesh, replicate, shard_batch
from tpu_unet.train import (
    create_train_state,
    load_params,
    make_anomaly_eval_step,
    make_optimizer,
)
from tpu_unet.utils import print_metrics, save_json
from tpu_unet.utils.viz import plot_confusion_matrix, visualize_results


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Test UNet for MVTec anomaly detection")
    parser.add_argument("--data_root", type=str, default="../datasets/mvtec_anomaly_detection")
    parser.add_argument("--category", type=str, default="bottle")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "anomaly_unet"])
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--threshold", type=float, default=None,
                        help="Threshold for anomaly detection (if None, will be optimized)")
    parser.add_argument("--pixel_thresholds", type=float, nargs="+", default=[0.3, 0.5, 0.7])
    parser.add_argument("--output_dir", type=str, default="../test_results")
    parser.add_argument("--save_visualizations", action="store_true")
    parser.add_argument("--max_vis_samples", type=int, default=20)
    # TPU-native extras
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--base_features", type=int, default=64)
    parser.add_argument("--fold_bn", action="store_true",
                        help="Fold BatchNorm into conv weights for inference")
    parser.add_argument("--quantize", type=str, default="none", choices=["none", "int8"],
                        help="int8 post-training quantization for inference "
                             "(activation scales calibrated on the train split)")
    parser.add_argument("--calib_samples", type=int, default=64,
                        help="Calibration images for --quantize int8")
    parser.add_argument("--calib_percentile", type=float, default=None,
                        help="Outlier-robust percentile calibration (e.g. 99.9)")
    parser.add_argument("--mask_resize", type=str, default="nearest",
                        choices=["nearest", "bilinear"],
                        help="GT-mask resize: 'nearest' (binarize-then-nearest; "
                             "no invented boundary pixels) or 'bilinear' "
                             "(reference raster parity, "
                             "/root/reference/src/dataset.py:100-106,149-152)")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--debug_samples", type=int, default=20)
    return parser.parse_args(argv)


def test_model(eval_step, state, loader) -> dict:
    """Run inference over the test set and collect host-side results."""
    acc = defaultdict(list)
    for batch in loader:
        out = eval_step(state, batch["image"], batch["mask"])
        valid = np.asarray(batch["valid"]) if "valid" in batch else np.ones(
            np.asarray(batch["label"]).shape[0], bool)
        acc["images"].append(np.asarray(out["image"])[valid])
        acc["reconstructions"].append(np.asarray(out["reconstruction"])[valid])
        acc["anomaly_maps"].append(np.asarray(out["anomaly_map"])[valid])
        acc["masks_true"].append(np.asarray(batch["mask"])[valid, ..., 0])
        acc["labels"].append(np.asarray(batch["label"])[valid])
        acc["anomaly_scores"].append(np.asarray(out["score"])[valid])
        for i, ok in enumerate(valid):
            if ok:
                acc["anomaly_types"].append(batch["anomaly_type"][i])
                acc["image_paths"].append(batch["image_path"][i])
    results = {k: np.concatenate(v) for k, v in acc.items()
               if k not in ("anomaly_types", "image_paths")}
    results["anomaly_types"] = acc["anomaly_types"]
    results["image_paths"] = acc["image_paths"]
    return results


def evaluate_results(results: dict, pixel_thresholds, threshold=None) -> dict:
    labels = results["labels"]
    scores = results["anomaly_scores"]
    if threshold is None:
        threshold, _ = get_optimal_threshold(labels, scores)
        print(f"Optimal threshold: {threshold:.4f}")
    predictions = (scores > threshold).astype(int)
    results["predictions"] = predictions
    results["threshold"] = float(threshold)

    image_metrics = calculate_metrics(labels, predictions, scores)

    type_metrics = {}
    for atype in sorted(set(results["anomaly_types"])):
        idx = np.asarray([i for i, t in enumerate(results["anomaly_types"]) if t == atype])
        t_labels, t_preds, t_scores = labels[idx], predictions[idx], scores[idx]
        if len(np.unique(t_labels)) > 1:
            type_metrics[atype] = calculate_metrics(t_labels, t_preds, t_scores)
        else:
            type_metrics[atype] = {
                "accuracy": 1.0 if t_preds[0] == t_labels[0] else 0.0,
                "count": len(idx),
            }

    pixel_metrics = {}
    anomaly_idx = labels == 1
    if anomaly_idx.sum() > 0:
        masks_true = results["masks_true"][anomaly_idx]
        maps_pred = results["anomaly_maps"][anomaly_idx]
        for thr in pixel_thresholds:
            pixel_metrics[f"threshold_{thr}"] = calculate_pixel_metrics(
                masks_true, maps_pred, thr)

    return {"image_metrics": image_metrics, "type_metrics": type_metrics,
            "pixel_metrics": pixel_metrics}


def save_results(results, evaluation, output_dir, args):
    os.makedirs(output_dir, exist_ok=True)
    payload = dict(evaluation)
    payload["threshold"] = float(results["threshold"])
    payload["args"] = vars(args)
    save_json(payload, os.path.join(output_dir, "test_metrics.json"))
    print(f"Metrics saved to: {os.path.join(output_dir, 'test_metrics.json')}")

    plot_confusion_matrix(results["labels"], results["predictions"],
                          save_path=os.path.join(output_dir, "confusion_matrix.png"))

    detailed = {
        "labels": results["labels"].tolist(),
        "predictions": results["predictions"].tolist(),
        "anomaly_scores": results["anomaly_scores"].tolist(),
        "anomaly_types": results["anomaly_types"],
        "image_paths": results["image_paths"],
        "threshold": float(results["threshold"]),
    }
    save_json(detailed, os.path.join(output_dir, "detailed_results.json"))
    print(f"Detailed results saved to: {os.path.join(output_dir, 'detailed_results.json')}")


def main(argv=None):
    args = parse_args(argv)
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)  # e.g. --device cpu
    print(f"JAX devices: {jax.devices()}")
    print(f"Testing category: {args.category}")

    available = get_available_categories(args.data_root)
    if args.category not in available:
        print(f"Category '{args.category}' not found!")
        print(f"Available categories: {available}")
        return None

    output_dir = os.path.join(args.output_dir, f"{args.category}_test_results")
    os.makedirs(output_dir, exist_ok=True)

    test_ds = MVTecDataset(args.data_root, args.category, "test",
                           args.image_size, is_train=False,
                           mask_resize=args.mask_resize)
    if args.debug:
        from tpu_unet.cli.train_mvtec import _Subset
        test_ds = _Subset(test_ds, args.debug_samples, 0)
    print(f"Test samples: {len(test_ds)}")

    mesh = make_mesh(n_data=args.n_devices)
    to_device = lambda b: {k: (shard_batch(mesh, v) if hasattr(v, "shape") else v)
                           for k, v in b.items()}
    loader = DataLoader(test_ds, args.batch_size, pad_last=True,
                        num_workers=args.num_workers, transform=to_device)

    policy = get_policy(args.precision)
    model = build_model(args.model, n_channels=3, n_classes=1, bilinear=args.bilinear,
                        policy=policy, base_features=args.base_features)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0),
                               (1, args.image_size, args.image_size, 3), tx)
    state = replicate(mesh, state)
    print(f"Loading checkpoint: {args.checkpoint}")
    state = load_params(state, args.checkpoint)
    if args.fold_bn:
        from tpu_unet.ops.fold_bn import fold_batchnorm
        folded, stats = fold_batchnorm(state.params, state.batch_stats)
        state = state.replace(params=folded, batch_stats=stats)
        print("BatchNorm folded into conv weights for inference")

    if args.quantize == "int8":
        if args.model != "anomaly_unet":
            raise SystemExit("--quantize int8 supports anomaly_unet only "
                             "(both decoder modes; bilinear upsamples run as "
                             "float islands — ops/quantize.py)")
        from tpu_unet.ops.quantize import (chunk_calibration,
                                           make_quantized_anomaly_eval_step,
                                           quantize_from_train_state)
        calib_ds = MVTecDataset(args.data_root, args.category, "train",
                                args.image_size, is_train=True)
        n_calib = min(len(calib_ds), args.calib_samples)
        calib_imgs = np.stack([calib_ds.load(i)["image"] for i in range(n_calib)])
        qparams = quantize_from_train_state(
            "anomaly_unet", state.params, state.batch_stats,
            chunk_calibration(calib_imgs, 16), percentile=args.calib_percentile)
        qstep = make_quantized_anomaly_eval_step()
        eval_step = lambda _state, images, masks, valid=None: qstep(
            qparams, images, masks, valid)
        print(f"int8 quantized inference (calibrated on {n_calib} train images)")
    else:
        eval_step = make_anomaly_eval_step(dual_decoder=(args.model == "anomaly_unet"))
    print("Testing model...")
    results = test_model(eval_step, state, loader)
    print("Evaluating results...")
    evaluation = evaluate_results(results, args.pixel_thresholds, args.threshold)

    print("\n" + "=" * 50)
    print("TEST RESULTS")
    print("=" * 50)
    print_metrics(evaluation["image_metrics"], "Image-level")
    if evaluation["pixel_metrics"]:
        print("\nPixel-level Metrics:")
        for thr, metrics in evaluation["pixel_metrics"].items():
            print(f"\n{thr}:")
            print_metrics(metrics, "  ")
    if evaluation["type_metrics"]:
        print("\nPer-anomaly-type Metrics:")
        for atype, metrics in evaluation["type_metrics"].items():
            print(f"\n{atype}:")
            print_metrics(metrics, "  ")

    save_results(results, evaluation, output_dir, args)

    if args.save_visualizations:
        print("Saving visualizations...")
        n = min(args.max_vis_samples, len(results["images"]))
        rng = np.random.default_rng(0)
        idx = rng.choice(len(results["images"]), n, replace=False)
        visualize_results(
            results["images"][idx], results["masks_true"][idx],
            results["anomaly_maps"][idx],
            results["reconstructions"][idx] if args.model == "anomaly_unet" else None,
            os.path.join(output_dir, "visualizations.png"), n)

    print("\nTesting completed!")
    print(f"Results saved to: {output_dir}")
    return evaluation


if __name__ == "__main__":
    main()

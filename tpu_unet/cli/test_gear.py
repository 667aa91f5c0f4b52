#!/usr/bin/env python3
"""Evaluate a Gear segmentation checkpoint (TPU-native).

CLI parity with /root/reference/test.py (Gear): same evaluator outputs —
evaluation_results.json with overall/per-class metrics + confusion matrix, and up to
4 prediction panels for the first 5 batches. (The reference's test.py crashes with
a NameError after saving results, SURVEY.md §2.10; nothing to replicate there.)
"""

from __future__ import annotations

import argparse

from tpu_unet.cli._seg_common import run_seg_evaluation
from tpu_unet.cli.train_gear import make_workload


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate UNet on Gear dataset")
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--model", type=str, default="seg_unet",
                        choices=["unet", "seg_unet", "unetpp", "attn_unet"])
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--deep_supervision", action="store_true",
                        help="UNet++ only: rebuild the deep-supervision heads "
                             "(must match how the checkpoint was trained)")
    parser.add_argument("--heads", type=int, default=4,
                        help="UNet++ deep-supervision inference mode: 4 = "
                             "averaged accurate mode; k<4 = the paper's "
                             "pruned fast mode (single head X[0][k]; "
                             "deeper columns DCE'd) — evaluate each k to "
                             "choose the accuracy/cost point")
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--class_weights", type=str, default=None)
    parser.add_argument("--save_dir", "--output_dir", dest="output_dir",
                        type=str, default="test_results/gear")
    parser.add_argument("--save_confusion_matrix", action="store_true",
                        help="Reference-CLI compatibility; the confusion-matrix "
                             "PNG is always saved here")
    parser.add_argument("--save_predictions", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--debug_samples", type=int, default=50)
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--n_space", type=int, default=1,
                        help="Shard image HEIGHT over this many chips (spatial "
                             "parallelism for elongated inputs)")
    parser.add_argument("--base_features", type=int, default=64)
    parser.add_argument("--fold_bn", action="store_true",
                        help="Fold BatchNorm into conv weights for inference")
    parser.add_argument("--quantize", type=str, default="none", choices=["none", "int8"],
                        help="int8 post-training quantization for inference "
                             "(activation scales calibrated on the train split)")
    parser.add_argument("--calib_samples", type=int, default=32,
                        help="Calibration images for --quantize int8")
    parser.add_argument("--calib_percentile", type=float, default=None,
                        help="Outlier-robust percentile calibration (e.g. 99.9)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    return run_seg_evaluation(args, make_workload(), split=args.split)


if __name__ == "__main__":
    main()

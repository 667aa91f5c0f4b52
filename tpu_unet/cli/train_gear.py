#!/usr/bin/env python3
"""Train SegmentationUNet on the Gear multi-class defect dataset (TPU-native).

CLI parity with /root/reference/train.py:26-93 (flags/defaults preserved: seg_unet,
512px, epochs 50, batch 8, ce/dice/focal 1/1/0, --class_weights CSV, dropout 0.1;
no LR scheduler in this trainer, matching the reference). Experiment dirs are named
``gear_seg_{model}_{timestamp}`` (reference train.py:249).
"""

from __future__ import annotations

import argparse

from tpu_unet.cli._seg_common import Workload, run_seg_training
from tpu_unet.train import AugmentConfig


def add_common_args(parser):
    parser.add_argument("--model", type=str, default="seg_unet",
                        choices=["unet", "seg_unet", "unetpp", "attn_unet"], help="Model architecture")
    parser.add_argument("--bilinear", action="store_true",
                        help="Use bilinear upsampling instead of transposed convolution")
    parser.add_argument("--deep_supervision", action="store_true",
                        help="UNet++ only: a 1x1 head on every nested top-row "
                             "node; training averages per-head losses, "
                             "inference averages head logits (arXiv:1912.05074)")
    parser.add_argument("--dropout", type=float, default=0.1,
                        help="Dropout rate for segmentation UNet")
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "adamw", "sgd"])
    parser.add_argument("--ce_weight", type=float, default=1.0)
    parser.add_argument("--dice_weight", type=float, default=1.0)
    parser.add_argument("--focal_weight", type=float, default=0.0)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_dir", type=str, default="outputs")
    parser.add_argument("--save_freq", type=int, default=10)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--val_freq", type=int, default=5)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--debug_samples", type=int, default=20)
    # TPU-native extras
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--n_space", type=int, default=1,
                        help="Shard image HEIGHT over this many chips (spatial "
                             "parallelism for elongated inputs; XLA inserts the "
                             "conv halo exchanges)")
    parser.add_argument("--base_features", type=int, default=64)
    parser.add_argument("--debug_nans", action="store_true",
                        help="Enable jax debug_nans (fail fast on NaN)")
    parser.add_argument("--rotation_mode", type=str, default="per_batch_shear",
                        choices=["per_sample", "per_sample_shear", "per_batch_shear"],
                        help="Rotation augmentation: per-batch MXU shear matmuls "
                             "(default, fast), per-sample banded shears (reference "
                             "angle distribution, gather-free), or per-sample "
                             "gathers (reference numerics)")
    parser.add_argument("--color_jitter_random_order", action="store_true",
                        help="Randomize the ColorJitter op order per step "
                             "(torchvision semantics; ~35%% step-time cost)")
    parser.add_argument("--progress_every", type=int, default=10,
                        help="Intra-epoch progress line every N steps (0 disables)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Gradient accumulation microbatches per step: "
                             "--batch_size is the EFFECTIVE batch, scanned as "
                             "grad_accum sequential microbatches inside one XLA "
                             "program (peak activation memory of the microbatch)")
    parser.add_argument("--fsdp", action="store_true",
                        help="Shard params + optimizer state over the 'data' mesh "
                             "axis (ZeRO/weight-update sharding): ~Nx lower "
                             "per-device state memory, identical numerics; grads "
                             "reduce-scatter and weights all-gather just-in-time "
                             "via GSPMD")
    parser.add_argument("--n_model", type=int, default=1,
                        help="Tensor (model) parallelism: shard conv CHANNELS over "
                             "this many chips per replica (Megatron column/row "
                             "pattern on each DoubleConv; one all-reduce per "
                             "block). Total devices = n_devices * n_space * "
                             "n_model. For very wide models (--base_features 256+)")
    parser.add_argument("--multihost", action="store_true",
                        help="Multi-host launch: argless jax.distributed.initialize() "
                             "(TPU pod autodetection; run the same command on every host)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="Manual multi-host launch: coordinator host:port")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Manual multi-host launch: total process count")
    parser.add_argument("--process_id", type=int, default=None,
                        help="Manual multi-host launch: this process's index")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train UNet for Gear multi-class segmentation")
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    parser.add_argument("--image_size", type=int, default=512,
                        help="Input image size (both height and width)")
    parser.add_argument("--class_weights", type=str, default=None,
                        help='Class weights as comma-separated values (e.g., "1.0,2.0,1.5")')
    add_common_args(parser)
    return parser.parse_args(argv)


def make_workload() -> Workload:
    def make_datasets(args):
        from tpu_unet.data.gear import get_datasets
        size = (args.image_size, args.image_size)
        train, val, test, num_classes = get_datasets(args.data_root, size)
        class_names = ["background"] + train.class_names
        return train, val, test, num_classes, class_names

    return Workload(
        name="gear_seg",
        make_datasets=make_datasets,
        image_size_hw=lambda args: (args.image_size, args.image_size),
        # Reference Gear augs: rotation 10, jitter 0.2/0.2/0.2/0.1
        # (/root/reference/src/gear_dataset.py:241-247) — applied PAIRED here.
        augment=AugmentConfig(degrees=10.0, brightness=0.2, contrast=0.2,
                              saturation=0.2, hue=0.1),
    )


def main(argv=None):
    return run_seg_training(parse_args(argv), make_workload())


if __name__ == "__main__":
    main()

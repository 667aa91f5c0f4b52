#!/usr/bin/env python3
"""Train UNet/AnomalyUNet for MVTec anomaly detection (TPU-native).

CLI parity with /root/reference/src/train.py:34-99 — every flag name and default is
preserved (data_root/category/image_size; model unet|anomaly_unet, bilinear; epochs/
batch_size/learning_rate/weight_decay/optimizer/scheduler; recon_weight/seg_weight/
use_ssim; num_workers/device/seed; save_dir/save_freq/resume; val_freq; debug/
debug_samples) — plus TPU-first extras: --precision bf16|f32, --n_devices,
--base_features, --profile_dir, --debug_nans.

Differences from the reference, by design (SURVEY.md §2.6): --use_ssim actually
selects the SSIM reconstruction loss; anomaly scores are per-image scalars.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.loader import DataLoader
from tpu_unet.data.mvtec import MVTecDataset, get_available_categories
from tpu_unet.models import build_model
from tpu_unet.parallel import make_mesh, shard_batch, shard_state
from tpu_unet.train import (
    AnomalyLossConfig,
    AugmentConfig,
    LRScheduler,
    create_train_state,
    load_checkpoint,
    make_anomaly_eval_step,
    make_anomaly_train_step,
    make_optimizer,
    num_params,
    CheckpointWriter,
    set_learning_rate,
)
from tpu_unet.train.interrupt import (GracefulInterrupt, INTERRUPT_EXIT_CODE,
                                      interrupt_checkpoint_path)
from tpu_unet.train.loop import train_anomaly_epoch, validate_anomaly_epoch
from tpu_unet.utils import append_jsonl, create_output_dirs, print_metrics, save_json
from tpu_unet.utils.viz import plot_training_curves


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train UNet for MVTec anomaly detection")

    # Dataset arguments
    parser.add_argument("--data_root", type=str, default="../datasets/mvtec_anomaly_detection",
                        help="Path to MVTec dataset root directory")
    parser.add_argument("--category", type=str, default="bottle",
                        help="Object category to train on")
    parser.add_argument("--image_size", type=int, default=256, help="Input image size")

    # Model arguments
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "anomaly_unet"], help="Model architecture")
    parser.add_argument("--bilinear", action="store_true",
                        help="Use bilinear upsampling instead of transposed convolution")

    # Training arguments
    parser.add_argument("--epochs", type=int, default=100, help="Number of training epochs")
    parser.add_argument("--batch_size", type=int, default=16, help="Batch size for training")
    parser.add_argument("--learning_rate", type=float, default=1e-3, help="Learning rate")
    parser.add_argument("--weight_decay", type=float, default=1e-4, help="Weight decay")
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "adamw", "sgd"], help="Optimizer type")
    parser.add_argument("--scheduler", type=str, default="cosine",
                        choices=["cosine", "step", "plateau", "none"],
                        help="Learning rate scheduler")

    # Loss arguments
    parser.add_argument("--recon_weight", type=float, default=1.0,
                        help="Weight for reconstruction loss")
    parser.add_argument("--seg_weight", type=float, default=1.0,
                        help="Weight for segmentation loss")
    parser.add_argument("--use_ssim", action="store_true",
                        help="Use SSIM loss for reconstruction")

    # Training settings
    parser.add_argument("--num_workers", type=int, default=4,
                        help="Number of data loading workers")
    parser.add_argument("--device", type=str, default="auto",
                        help="Device to use (auto, cpu, tpu)")
    parser.add_argument("--seed", type=int, default=42, help="Random seed")

    # Checkpointing
    parser.add_argument("--save_dir", type=str, default="../outputs",
                        help="Directory to save outputs")
    parser.add_argument("--save_freq", type=int, default=10,
                        help="Save checkpoint every N epochs")
    parser.add_argument("--resume", type=str, default=None,
                        help="Path to checkpoint to resume from")

    # Validation
    parser.add_argument("--val_freq", type=int, default=5, help="Validate every N epochs")

    # Debug arguments
    parser.add_argument("--debug", action="store_true",
                        help="Enable debug mode with limited data")
    parser.add_argument("--debug_samples", type=int, default=20,
                        help="Number of samples to use in debug mode")

    # TPU-native extras
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"],
                        help="Compute precision policy (params stay f32)")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="Devices on the data-parallel mesh axis (default: all)")
    parser.add_argument("--base_features", type=int, default=64,
                        help="Width of the first UNet stage (reference: 64)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of epoch 1 into this dir")
    parser.add_argument("--debug_nans", action="store_true",
                        help="Enable jax debug_nans (fail fast on NaN)")
    parser.add_argument("--progress_every", type=int, default=10,
                        help="Intra-epoch progress line every N steps (0 disables)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Gradient accumulation microbatches per step: "
                             "--batch_size is the EFFECTIVE batch, scanned as "
                             "grad_accum sequential microbatches of "
                             "batch_size/grad_accum inside one XLA program "
                             "(peak activation memory of the microbatch; use "
                             "for effective batches past the >16 spill regime)")
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
                             "block). Total devices = n_devices * n_model. For "
                             "very wide models (--base_features 256+)")
    parser.add_argument("--multihost", action="store_true",
                        help="Multi-host launch: argless jax.distributed.initialize() "
                             "(TPU pod autodetection; run the same command on every host)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="Manual multi-host launch: coordinator host:port")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Manual multi-host launch: total process count")
    parser.add_argument("--process_id", type=int, default=None,
                        help="Manual multi-host launch: this process's index")
    parser.add_argument("--rotation_mode", type=str, default="per_batch_shear",
                        choices=["per_sample", "per_sample_shear", "per_batch_shear"],
                        help="Rotation augmentation: per-batch MXU shear matmuls "
                             "(default, fast), per-sample banded shears (reference "
                             "angle distribution, gather-free), or per-sample "
                             "gathers (reference numerics)")
    parser.add_argument("--color_jitter_random_order", action="store_true",
                        help="Randomize the ColorJitter op order per step "
                             "(torchvision semantics; ~35%% step-time cost)")

    return parser.parse_args(argv)


# Random fixed-size subset (the reference's --debug Subset sampling); shared
# with the seg CLIs. Re-exported here because test_mvtec imports it from this
# module.
from tpu_unet.cli._seg_common import _Subset  # noqa: E402


def main(argv=None):
    args = parse_args(argv)
    if args.grad_accum < 1 or args.batch_size % args.grad_accum != 0:
        raise SystemExit(f"--batch_size {args.batch_size} must be a positive "
                         f"multiple of --grad_accum {args.grad_accum}")

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)  # e.g. --device cpu
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    from tpu_unet.parallel.mesh import maybe_initialize
    maybe_initialize(args.coordinator_address, args.num_processes,
                     args.process_id, auto=args.multihost)

    print(f"JAX devices: {jax.devices()}")
    print(f"Training category: {args.category}")

    available = get_available_categories(args.data_root)
    if args.category not in available:
        print(f"Category '{args.category}' not found!")
        print(f"Available categories: {available}")
        return None

    from tpu_unet.parallel.mesh import synced_timestamp
    timestamp = synced_timestamp()  # identical on every host (multi-host ckpt paths)
    experiment_name = f"{args.category}_{args.model}_{timestamp}"
    experiment_dir = os.path.join(args.save_dir, experiment_name)
    output_dirs = create_output_dirs(experiment_dir)
    print(f"Experiment directory: {experiment_dir}")
    with open(os.path.join(experiment_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    # Data
    print("Creating data loaders...")
    train_ds = MVTecDataset(args.data_root, args.category, "train",
                            args.image_size, is_train=True)
    val_ds = MVTecDataset(args.data_root, args.category, "test",
                          args.image_size, is_train=False)
    if args.debug:
        print(f"DEBUG MODE: Limiting dataset to {args.debug_samples} samples")
        train_ds = _Subset(train_ds, args.debug_samples, args.seed)
        val_ds = _Subset(val_ds, args.debug_samples, args.seed + 1)
    print(f"Train samples: {len(train_ds)}")
    print(f"Validation samples: {len(val_ds)}")

    mesh = make_mesh(n_data=args.n_devices, n_model=args.n_model)
    to_device = lambda b: {k: (shard_batch(mesh, v) if hasattr(v, "shape") else v)
                           for k, v in b.items()}

    def to_device_train(b):
        # Train masks are binary by construction (train/good has zero masks;
        # GT masks binarize >0) — ship them uint8: exact, and 4x less tunnel
        # traffic than f32 (the steps cast back on device after the
        # nearest-sampled augment). Val keeps f32: --mask_resize bilinear can
        # produce fractional mask values there.
        b = dict(b)
        if "mask" in b:
            b["mask"] = b["mask"].astype(np.uint8)
        return to_device(b)

    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                              drop_last=len(train_ds) >= args.batch_size,
                              num_workers=args.num_workers, transform=to_device_train)
    val_loader = DataLoader(val_ds, args.batch_size, pad_last=True,
                            num_workers=args.num_workers, transform=to_device)

    # Model / optimizer / schedules
    print("Creating model...")
    policy = get_policy(args.precision)
    model = build_model(args.model, n_channels=3, n_classes=1, bilinear=args.bilinear,
                        policy=policy, base_features=args.base_features)
    tx = make_optimizer(args.optimizer, args.learning_rate, args.weight_decay)
    state = create_train_state(model, jax.random.key(args.seed),
                               (1, args.image_size, args.image_size, 3), tx)
    state = shard_state(mesh, state, fsdp=args.fsdp, tp=args.n_model > 1)
    total_params = num_params(state)
    print(f"Total parameters: {total_params:,}")

    loss_cfg = AnomalyLossConfig(
        recon_weight=args.recon_weight,
        seg_weight=args.seg_weight,
        recon_loss_type="ssim" if args.use_ssim else "mse",
    )
    dual = args.model == "anomaly_unet"
    train_step = make_anomaly_train_step(
        loss_cfg,
        AugmentConfig(rotation_mode=args.rotation_mode,
                      color_jitter_random_order=args.color_jitter_random_order),
        dual_decoder=dual, grad_accum=args.grad_accum)
    eval_step = make_anomaly_eval_step(loss_cfg, dual_decoder=dual)
    scheduler = LRScheduler(args.scheduler, args.learning_rate, args.epochs)

    start_epoch = 0
    if args.resume:
        state, last_epoch, _ = load_checkpoint(state, args.resume)
        start_epoch = last_epoch + 1
        # Align the loader's shuffle-epoch counter so a resumed run sees the
        # same per-epoch sample order as an uninterrupted one.
        train_loader.epoch = start_epoch

    # Training loop
    print("Starting training...")
    base_key = jax.random.key(args.seed)
    train_losses, val_losses = [], []
    best_val_loss = float("inf")
    history_path = os.path.join(output_dirs["results"], "history.jsonl")
    interrupted_at = None  # epoch cut short by SIGTERM (preemption)

    # Profile the second epoch (past compile warm-up) — unless the run only HAS
    # one epoch, in which case profile it rather than silently capturing nothing.
    profile_epoch = (start_epoch + 1 if args.epochs > start_epoch + 1
                     else start_epoch)
    ckpt_writer = CheckpointWriter()  # async: file writes overlap training
    intr = GracefulInterrupt().install()  # SIGTERM -> checkpoint, not death
    try:
        for epoch in range(start_epoch, args.epochs):
            epoch_start = time.time()
            lr = scheduler.lr_for_epoch(epoch)
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

            profiling = args.profile_dir and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(args.profile_dir)
            state, train_metrics = train_anomaly_epoch(
                state, train_step, train_loader, base_key, epoch,
                progress_fn=print, progress_every=args.progress_every,
                should_stop=intr.step_poll())
            if profiling:
                jax.profiler.stop_trace()
                print(f"Profiler trace saved to {args.profile_dir}")
            if intr.poll_global():
                # SIGTERM (preemption/eviction): this epoch may be partial, so
                # checkpoint the state with epoch-1 as "last completed" —
                # --resume replays the interrupted epoch from its start.
                ipath = interrupt_checkpoint_path(output_dirs["checkpoints"])
                ckpt_writer.save(state, epoch - 1,
                                 train_metrics.get("total_loss", 0.0), ipath)
                ckpt_writer.wait()
                interrupted_at = epoch
                print(f"SIGTERM received: training interrupted during epoch "
                      f"{epoch}; resume with --resume {ipath}")
                break
            train_losses.append(train_metrics["total_loss"])
            history = {"epoch": epoch, "lr": lr,
                       "epoch_seconds": round(time.time() - epoch_start, 3),
                       **{k: train_metrics[k] for k in
                          ("total_loss", "recon_loss", "seg_loss")}}

            if epoch % args.val_freq == 0 or epoch == args.epochs - 1:
                val_metrics = validate_anomaly_epoch(state, eval_step, val_loader)
                val_losses.append(val_metrics["total_loss"])
                history["val_loss"] = val_metrics["total_loss"]
                history.update({f"val_{k}": v for k, v in
                                val_metrics["image_metrics"].items()})
                if args.scheduler == "plateau":
                    scheduler.step_plateau(val_metrics["total_loss"])

                print(f"\nEpoch {epoch}/{args.epochs - 1}")
                print(f"Train Loss: {train_metrics['total_loss']:.4f} "
                      f"(Recon: {train_metrics['recon_loss']:.4f}, "
                      f"Seg: {train_metrics['seg_loss']:.4f})")
                print(f"Val Loss: {val_metrics['total_loss']:.4f} "
                      f"(Recon: {val_metrics['recon_loss']:.4f}, "
                      f"Seg: {val_metrics['seg_loss']:.4f})")
                print_metrics(val_metrics["image_metrics"], "Image-level")
                if val_metrics["pixel_metrics"]:
                    print_metrics(val_metrics["pixel_metrics"], "Pixel-level")

                if val_metrics["total_loss"] < best_val_loss:
                    best_val_loss = val_metrics["total_loss"]
                    ckpt_writer.save(state, epoch, val_metrics["total_loss"],
                                     os.path.join(output_dirs["checkpoints"], "best_model"))

            if epoch % args.save_freq == 0 or epoch == args.epochs - 1:
                ckpt_writer.save(state, epoch, train_metrics["total_loss"],
                                 os.path.join(output_dirs["checkpoints"],
                                              f"checkpoint_epoch_{epoch}"))

            append_jsonl(history, history_path)  # live, crash-surviving record
            print(f"Epoch time: {time.time() - epoch_start:.2f}s")

    finally:
        ckpt_writer.close()  # flush in-flight writes even on error
        intr.uninstall()
    if train_losses or val_losses:
        plot_training_curves(train_losses, val_losses,
                             os.path.join(output_dirs["results"], "training_curves.png"))
    results = {
        "train_losses": train_losses,
        "val_losses": val_losses,
        "best_val_loss": best_val_loss if best_val_loss != float("inf") else None,
        "total_epochs": args.epochs,
        "total_params": total_params,
        "interrupted": interrupted_at is not None,
        "args": vars(args),
    }
    save_json(results, os.path.join(output_dirs["results"], "training_results.json"))

    if interrupted_at is not None:
        print(f"\nTraining interrupted (SIGTERM) during epoch {interrupted_at}; "
              f"partial results saved to: {experiment_dir}")
        raise SystemExit(INTERRUPT_EXIT_CODE)  # EX_TEMPFAIL: requeue me
    print("\nTraining completed!")
    print(f"Best validation loss: {best_val_loss:.4f}")
    print(f"Results saved to: {experiment_dir}")
    return experiment_dir


if __name__ == "__main__":
    main()

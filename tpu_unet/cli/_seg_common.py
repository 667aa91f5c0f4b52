"""Shared driver for the two segmentation workloads (Gear, KolektorSDD).

The reference duplicates ~450-line trainers per dataset (train.py,
train_kolektorsdd.py); here one driver is parameterized by a ``Workload``
description. Behavior parity: best-checkpoint selection by val mIoU
(/root/reference/train.py:384-391), training_results.json schema (:421-434),
evaluation_results.json schema (test.py:192-223), args.json dump, logging.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.loader import DataLoader
from tpu_unet.models import build_model
from tpu_unet.parallel import make_mesh, replicate, shard_batch, shard_state
from tpu_unet.train import (
    AugmentConfig,
    SegLossConfig,
    create_train_state,
    load_checkpoint,
    load_params,
    make_optimizer,
    make_seg_eval_step,
    make_seg_train_step,
    num_params,
    CheckpointWriter,
)
from tpu_unet.train.interrupt import (GracefulInterrupt, INTERRUPT_EXIT_CODE,
                                      interrupt_checkpoint_path)
from tpu_unet.train.loop import train_seg_epoch, validate_seg_epoch
from tpu_unet.utils import append_jsonl, create_output_dirs, save_json, setup_logging


@dataclasses.dataclass
class Workload:
    name: str                      # experiment prefix, e.g. 'gear_seg' / 'kolektorsdd'
    make_datasets: Callable        # (args) -> (train, val, test, num_classes, class_names)
    image_size_hw: Callable        # (args) -> (H, W)
    augment: AugmentConfig


def parse_class_weights(s: Optional[str], num_classes: int) -> Optional[Tuple[float, ...]]:
    if not s:
        return None
    weights = tuple(float(x) for x in s.split(","))
    if len(weights) != num_classes:
        raise ValueError(f"Got {len(weights)} class weights for {num_classes} classes")
    return weights


class _Subset:
    """Random fixed-size subset (the reference's --debug Subset sampling).

    The single shared implementation for every CLI's --debug path (the MVTec
    trainer re-exports it)."""

    def __init__(self, dataset, n, seed):
        rng = np.random.default_rng(seed)
        self.indices = rng.choice(len(dataset), size=min(n, len(dataset)), replace=False)
        self.dataset = dataset

    def __len__(self):
        return len(self.indices)

    def load(self, i):
        return self.dataset.load(int(self.indices[i]))


def _to_device(mesh, spatial: bool = False):
    """Batch-to-mesh transform. ``spatial`` H-shards rank>=2 arrays (NHWC images,
    NHW masks) over the 'space' axis; per-row vectors (labels, valid) stay
    data-sharded only."""
    def put(v):
        if not hasattr(v, "shape"):
            return v
        return shard_batch(mesh, v, spatial=spatial and v.ndim >= 2)
    return lambda b: {k: put(v) for k, v in b.items()}


def run_seg_training(args, workload: Workload):
    grad_accum = getattr(args, "grad_accum", 1)
    if grad_accum is None:
        grad_accum = 1
    if grad_accum < 1 or args.batch_size % grad_accum != 0:
        raise SystemExit(f"--batch_size {args.batch_size} must be a positive "
                         f"multiple of --grad_accum {grad_accum}")
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if getattr(args, "device", "auto") not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)  # e.g. --device cpu
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    from tpu_unet.parallel.mesh import maybe_initialize
    maybe_initialize(getattr(args, "coordinator_address", None),
                     getattr(args, "num_processes", None),
                     getattr(args, "process_id", None),
                     auto=getattr(args, "multihost", False))

    print(f"JAX devices: {jax.devices()}")

    from tpu_unet.parallel.mesh import synced_timestamp
    timestamp = synced_timestamp()  # identical on every host (multi-host ckpt paths)
    experiment_name = f"{workload.name}_{args.model}_{timestamp}"
    experiment_dir = os.path.join(args.save_dir, experiment_name)
    output_dirs = create_output_dirs(experiment_dir)
    logger = setup_logging(output_dirs["logs"], experiment_name)
    logger.info(f"Experiment directory: {experiment_dir}")
    with open(os.path.join(experiment_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    train_ds, val_ds, _, num_classes, class_names = workload.make_datasets(args)
    if args.debug:
        logger.info(f"DEBUG MODE: Limiting dataset to {args.debug_samples} samples")
        train_ds = _Subset(train_ds, args.debug_samples, args.seed)
        val_ds = _Subset(val_ds, args.debug_samples, args.seed + 1)
    logger.info(f"Train samples: {len(train_ds)}, Val samples: {len(val_ds)}, "
                f"classes: {num_classes}")

    h, w = workload.image_size_hw(args)
    n_space = getattr(args, "n_space", 1) or 1
    if n_space > 1 and h % n_space:
        raise ValueError(f"--n_space {n_space} must divide the image height {h}")
    n_model = getattr(args, "n_model", 1) or 1
    mesh = make_mesh(n_data=getattr(args, "n_devices", None), n_space=n_space,
                     n_model=n_model)
    to_device = _to_device(mesh, spatial=n_space > 1)
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                              drop_last=len(train_ds) >= args.batch_size,
                              num_workers=args.num_workers, transform=to_device)
    val_loader = DataLoader(val_ds, args.batch_size, pad_last=True,
                            num_workers=args.num_workers, transform=to_device)

    policy = get_policy(getattr(args, "precision", "bf16"))
    model = build_model(args.model if args.model != "unet" else "unet",
                        n_channels=3, n_classes=num_classes, bilinear=args.bilinear,
                        dropout=args.dropout, policy=policy,
                        base_features=getattr(args, "base_features", 64),
                        deep_supervision=getattr(args, "deep_supervision", False))
    tx = make_optimizer(args.optimizer, args.learning_rate, args.weight_decay)
    state = create_train_state(model, jax.random.key(args.seed), (1, h, w, 3), tx)
    state = shard_state(mesh, state, fsdp=getattr(args, "fsdp", False),
                        tp=n_model > 1)
    total_params = num_params(state)
    logger.info(f"Total parameters: {total_params:,}")

    class_weights = parse_class_weights(args.class_weights, num_classes)
    loss_cfg = SegLossConfig(ce_weight=args.ce_weight, dice_weight=args.dice_weight,
                             focal_weight=args.focal_weight, class_weights=class_weights)
    augment = dataclasses.replace(
        workload.augment,
        rotation_mode=getattr(args, "rotation_mode", "per_batch_shear"),
        color_jitter_random_order=getattr(args, "color_jitter_random_order", False))
    train_step = make_seg_train_step(num_classes, loss_cfg, augment,
                                     grad_accum=grad_accum)  # validated on entry
    eval_step = make_seg_eval_step(num_classes, loss_cfg)

    start_epoch = 0
    if args.resume:
        state, last_epoch, _ = load_checkpoint(state, args.resume)
        start_epoch = last_epoch + 1
        # Align the loader's shuffle-epoch counter so a resumed run sees the
        # same per-epoch sample order as an uninterrupted one.
        train_loader.epoch = start_epoch

    logger.info("Starting training...")
    base_key = jax.random.key(args.seed)
    train_losses, val_losses = [], []
    best_val_miou = 0.0
    history_path = os.path.join(output_dirs["results"], "history.jsonl")
    interrupted_at = None  # epoch cut short by SIGTERM (preemption)

    ckpt_writer = CheckpointWriter()  # async: file writes overlap training
    intr = GracefulInterrupt().install()  # SIGTERM -> checkpoint, not death
    try:
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            state, train_metrics, train_cm = train_seg_epoch(
                state, train_step, train_loader, base_key, epoch, num_classes,
                progress_fn=logger.info,
                progress_every=getattr(args, "progress_every", 10),
                should_stop=intr.step_poll())
            if intr.poll_global():
                # SIGTERM (preemption/eviction): this epoch may be partial, so
                # checkpoint the state with epoch-1 as "last completed" —
                # --resume replays the interrupted epoch from its start.
                ipath = interrupt_checkpoint_path(output_dirs["checkpoints"])
                ckpt_writer.save(state, epoch - 1,
                                 train_metrics.get("total_loss", 0.0), ipath)
                ckpt_writer.wait()
                interrupted_at = epoch
                logger.info(f"SIGTERM received: training interrupted during "
                            f"epoch {epoch}; resume with --resume {ipath}")
                break
            train_losses.append(train_metrics.get("total_loss", 0.0))
            train_miou = float(np.nanmean(train_cm.compute_iou()))
            history = {"epoch": epoch, "train_miou": train_miou, **train_metrics}

            val_results = None
            if epoch % args.val_freq == 0 or epoch == args.epochs - 1:
                val_metrics, val_cm = validate_seg_epoch(
                    state, eval_step, val_loader, num_classes,
                    ignore_index=loss_cfg.ignore_index)
                val_losses.append(val_metrics.get("total_loss", 0.0))
                val_all = val_cm.compute_all_metrics()
                val_results = (val_metrics, val_all)
                history.update({
                    "val_loss": val_metrics.get("total_loss", 0.0),
                    "val_miou": float(val_all["mean_iou"]),
                    "val_dice": float(val_all["mean_dice"]),
                    "val_pixel_accuracy": float(val_all["pixel_accuracy"]),
                })
                if val_all["mean_iou"] > best_val_miou:
                    best_val_miou = val_all["mean_iou"]
                    ckpt_writer.save(state, epoch, val_metrics.get("total_loss", 0.0),
                                     os.path.join(output_dirs["checkpoints"], "best_model"))
                    logger.info(f"New best model saved with mIoU: {best_val_miou:.4f}")

            msg = (f"Epoch {epoch}/{args.epochs - 1}: "
                   f"train loss {train_metrics.get('total_loss', 0):.4f} "
                   f"mIoU {train_miou:.4f}")
            if val_results:
                msg += (f" | val loss {val_results[0].get('total_loss', 0):.4f} "
                        f"mIoU {val_results[1]['mean_iou']:.4f} "
                        f"dice {val_results[1]['mean_dice']:.4f}")
            dt = time.time() - t0
            msg += f" ({dt:.1f}s)"
            logger.info(msg)
            history["epoch_seconds"] = round(dt, 3)
            append_jsonl(history, history_path)  # live, crash-surviving record

            if epoch % args.save_freq == 0 or epoch == args.epochs - 1:
                ckpt_writer.save(state, epoch, train_metrics.get("total_loss", 0.0),
                                 os.path.join(output_dirs["checkpoints"],
                                              f"checkpoint_epoch_{epoch}"))

    finally:
        ckpt_writer.close()  # flush in-flight writes even on error
        intr.uninstall()
    results = {
        "train_losses": train_losses,
        "val_losses": val_losses,
        "best_val_miou": best_val_miou,
        "total_epochs": args.epochs,
        "total_params": total_params,
        "num_classes": num_classes,
        "interrupted": interrupted_at is not None,
        "args": vars(args),
    }
    save_json(results, os.path.join(output_dirs["results"], "training_results.json"))
    if interrupted_at is not None:
        logger.info(f"Training interrupted (SIGTERM) during epoch "
                    f"{interrupted_at}; partial results saved to: {experiment_dir}")
        raise SystemExit(INTERRUPT_EXIT_CODE)  # EX_TEMPFAIL: requeue me
    logger.info("Training completed!")
    logger.info(f"Best validation mIoU: {best_val_miou:.4f}")
    logger.info(f"Results saved to: {experiment_dir}")
    return experiment_dir


def run_seg_evaluation(args, workload: Workload, split: str = "test"):
    """Evaluate a checkpoint; writes evaluation_results.json + prediction panels."""
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if getattr(args, "device", "auto") not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)  # e.g. --device cpu
    print(f"JAX devices: {jax.devices()}")
    train_ds, val_ds, test_ds, num_classes, class_names = workload.make_datasets(args)
    ds = {"train": train_ds, "val": val_ds, "test": test_ds}[split]
    if getattr(args, "debug", False):
        ds = _Subset(ds, args.debug_samples, 0)
    print(f"Eval samples ({split}): {len(ds)}")

    h, w = workload.image_size_hw(args)
    n_space = getattr(args, "n_space", 1) or 1
    if n_space > 1 and h % n_space:
        raise ValueError(f"--n_space {n_space} must divide the image height {h}")
    mesh = make_mesh(n_data=getattr(args, "n_devices", None), n_space=n_space)
    loader = DataLoader(ds, args.batch_size, pad_last=True,
                        num_workers=args.num_workers,
                        transform=_to_device(mesh, spatial=n_space > 1))
    policy = get_policy(getattr(args, "precision", "bf16"))
    # --heads k<4 prunes the UNet++ deep-supervision eval to the single head
    # X[0][k]; heads only selects the return value, so init/restore still
    # build the full param tree the checkpoint expects (build_model validates
    # the model/deep_supervision combination; 0 or >4 fails at trace).
    heads = getattr(args, "heads", None)
    heads = 4 if heads is None else heads
    model = build_model(args.model, n_channels=3, n_classes=num_classes,
                        bilinear=args.bilinear, dropout=args.dropout, policy=policy,
                        base_features=getattr(args, "base_features", 64),
                        deep_supervision=getattr(args, "deep_supervision", False),
                        heads=heads)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0), (1, h, w, 3), tx)
    state = replicate(mesh, state)
    print(f"Loading checkpoint: {args.checkpoint}")
    state = load_params(state, args.checkpoint)
    if getattr(args, "fold_bn", False):
        from tpu_unet.ops.fold_bn import fold_batchnorm
        folded, stats = fold_batchnorm(state.params, state.batch_stats)
        state = state.replace(params=folded, batch_stats=stats)
        print("BatchNorm folded into conv weights for inference")

    if heads != 4:
        print(f"Pruned fast mode: evaluating head X[0][{heads}] only")

    class_weights = parse_class_weights(getattr(args, "class_weights", None), num_classes)
    loss_cfg = SegLossConfig(class_weights=class_weights)
    if getattr(args, "quantize", "none") == "int8":
        if args.model in ("unetpp", "unet++", "nested_unet"):
            arch = "unetpp"
        elif args.model in ("attn_unet", "attention_unet", "attunet"):
            arch = "attn_unet"
        else:
            arch = "seg_unet"
        if args.model not in ("seg_unet", "segmentation_unet", "unetpp",
                              "unet++", "nested_unet", "attn_unet",
                              "attention_unet", "attunet"):
            raise SystemExit("--quantize int8 supports seg_unet, attn_unet "
                             "and unetpp (both decoder modes; bilinear "
                             "upsamples run as float islands)")
        from tpu_unet.ops.quantize import (chunk_calibration,
                                           make_quantized_seg_eval_step,
                                           quantize_from_train_state)
        ds_flag = getattr(args, "deep_supervision", False)
        n_calib = min(len(train_ds), getattr(args, "calib_samples", 32))
        calib_imgs = np.stack([train_ds.load(i)["image"] for i in range(n_calib)])
        qparams = quantize_from_train_state(
            arch, state.params, state.batch_stats,
            chunk_calibration(calib_imgs, 8),
            percentile=getattr(args, "calib_percentile", None),
            deep_supervision=ds_flag)
        qstep = make_quantized_seg_eval_step(num_classes, loss_cfg, arch=arch,
                                             deep_supervision=ds_flag,
                                             heads=heads)
        eval_step = lambda _state, images, labels, valid=None: qstep(
            qparams, images, labels, valid)
        print(f"int8 quantized inference (calibrated on {n_calib} train images)")
    else:
        eval_step = make_seg_eval_step(num_classes, loss_cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    losses, cm = validate_seg_epoch(state, eval_step, loader, num_classes,
                                    ignore_index=loss_cfg.ignore_index)
    metrics = cm.compute_all_metrics()
    cm.print_metrics(class_names)

    summary = {
        "evaluation_args": vars(args),
        "overall_metrics": {
            "pixel_accuracy": float(metrics["pixel_accuracy"]),
            "mean_accuracy": float(metrics["mean_accuracy"]),
            "mean_iou": float(metrics["mean_iou"]),
            "mean_dice": float(metrics["mean_dice"]),
            "mean_precision": float(metrics["mean_precision"]),
            "mean_recall": float(metrics["mean_recall"]),
            "mean_f1": float(metrics["mean_f1"]),
        },
        "per_class_metrics": {
            "iou": metrics["iou_per_class"].tolist(),
            "dice": metrics["dice_per_class"].tolist(),
            "precision": metrics["precision_per_class"].tolist(),
            "recall": metrics["recall_per_class"].tolist(),
            "f1": metrics["f1_per_class"].tolist(),
        },
        "confusion_matrix": metrics["confusion_matrix"].tolist(),
        "loss": losses,
    }
    save_json(summary, os.path.join(args.output_dir, "evaluation_results.json"))
    print(f"Results summary saved to: "
          f"{os.path.join(args.output_dir, 'evaluation_results.json')}")
    cm.plot_confusion_matrix(class_names,
                             os.path.join(args.output_dir, "confusion_matrix.png"))

    if getattr(args, "save_predictions", False):
        _save_prediction_panels(state, eval_step, loader, class_names, args.output_dir)
    return summary


def _save_prediction_panels(state, eval_step, loader, class_names, output_dir,
                            max_batches: int = 5, per_batch: int = 4):
    """Up to 4 panels for the first 5 batches (reference test.py:67-145)."""
    from tpu_unet.utils.viz import _plt, denormalize_image
    from tpu_unet.ops.augment import eval_transform

    plt = _plt()
    for batch_idx, batch in enumerate(loader):
        if batch_idx >= max_batches:
            break
        _, preds, _ = eval_step(state, batch["image"], batch["mask"])
        preds = np.asarray(preds)
        images = np.asarray(eval_transform(batch["image"]))
        masks = np.asarray(batch["mask"])
        n = min(per_batch, images.shape[0])
        for i in range(n):
            if "valid" in batch and not batch["valid"][i]:
                continue
            fig, axes = plt.subplots(1, 3, figsize=(15, 5))
            axes[0].imshow(denormalize_image(images[i]))
            axes[0].set_title("Original Image")
            axes[0].axis("off")
            axes[1].imshow(masks[i], cmap="tab10", vmin=0, vmax=len(class_names) - 1)
            axes[1].set_title("Ground Truth")
            axes[1].axis("off")
            axes[2].imshow(preds[i], cmap="tab10", vmin=0, vmax=len(class_names) - 1)
            axes[2].set_title("Prediction")
            axes[2].axis("off")
            fig.tight_layout()
            stem = os.path.basename(batch["image_path"][i]).split(".")[0]
            fig.savefig(os.path.join(output_dir,
                                     f"prediction_batch{batch_idx}_img{i}_{stem}.png"),
                        dpi=150, bbox_inches="tight")
            plt.close(fig)

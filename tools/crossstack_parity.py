#!/usr/bin/env python3
"""Cross-stack end-to-end TRAINING parity: reference torch vs tpu_unet.

VERDICT r2 #4: weight-import parity (bitwise forward) and int8-vs-float eval
parity were already proven; this closes the remaining link — train BOTH stacks
from scratch on the same data/config and assert the final image-AUROC agrees.

Method
- A separable synthetic anomaly task at 32px: normals are a smooth radial
  pattern with mild per-image jitter; anomalies add a bright square (GT mask =
  the square). Identical uint8 arrays feed both stacks in identical batch
  order, no augmentation on either side (the reference's augs live in
  torchvision transforms, which is not installed — and removing them from both
  sides makes the comparison apples-to-apples).
- Reference side: the ACTUAL reference modules are imported from
  /root/reference/src (read-only) and trained with their own train_epoch /
  CombinedLoss / get_optimizer / get_scheduler
  (/root/reference/src/train_utils.py:107-152,263-284; src/model.py:156-210).
- tpu_unet side: AnomalyUNet (base_features=64 — the same 64..1024 ladder),
  make_anomaly_train_step with a no-op AugmentConfig, same Adam/cosine/epochs.
- Both final weight sets are evaluated through the SAME tpu_unet f32 eval step
  (the torch weights via utils/torch_import, whose forward parity is bitwise-
  tested), and image AUROC is computed by the same metrics code.

Run:  python tools/crossstack_parity.py [--epochs 8] [--assert]
Takes ~5-15 min on the 1-core host (the torch side dominates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def make_separable_data(size=32, n_train=16, n_test_good=8, n_test_bad=8, seed=0):
    """Smooth normals vs bright-square anomalies (learnable by reconstruction)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    def normal():
        base = 90 + 70 * np.sin(3 * yy) * np.cos(2 * xx)
        img = np.stack([base + 10 * c for c in range(3)], axis=-1)
        img = img + rng.normal(0, 3, img.shape) + rng.uniform(-12, 12)
        return np.clip(img, 0, 255).astype(np.uint8)

    def anomalous():
        img = normal().astype(np.int32)
        s = int(rng.integers(6, 11))
        y0 = int(rng.integers(2, size - s - 2))
        x0 = int(rng.integers(2, size - s - 2))
        img[y0:y0 + s, x0:x0 + s] = 250
        mask = np.zeros((size, size), np.float32)
        mask[y0:y0 + s, x0:x0 + s] = 1.0
        return np.clip(img, 0, 255).astype(np.uint8), mask

    train = np.stack([normal() for _ in range(n_train)])
    test_imgs, test_masks, test_labels = [], [], []
    for _ in range(n_test_good):
        test_imgs.append(normal())
        test_masks.append(np.zeros((size, size), np.float32))
        test_labels.append(0)
    for _ in range(n_test_bad):
        im, m = anomalous()
        test_imgs.append(im)
        test_masks.append(m)
        test_labels.append(1)
    return (train, np.stack(test_imgs), np.stack(test_masks),
            np.asarray(test_labels, np.int32))


def normalize_nchw(u8):
    x = u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (0, 3, 1, 2))


def train_reference(train_u8, epochs, batch_size, lr, wd, seed):
    """Train the reference stack with ITS OWN modules and loop."""
    import torch

    ref_src = "/root/reference/src"
    sys.path.insert(0, ref_src)
    try:
        import model as ref_model
        import train_utils as ref_tu
    finally:
        sys.path.remove(ref_src)

    torch.manual_seed(seed)
    net = ref_model.AnomalyUNet(n_channels=3)
    criterion = ref_tu.CombinedLoss(recon_weight=1.0, seg_weight=1.0)
    optimizer = ref_tu.get_optimizer(net, "adam", lr, wd)
    scheduler = ref_tu.get_scheduler(optimizer, "cosine", epochs)

    imgs = torch.from_numpy(normalize_nchw(train_u8))
    masks = torch.zeros((len(train_u8), 1) + train_u8.shape[1:3])
    batches = [{"image": imgs[lo:lo + batch_size],
                "mask": masks[lo:lo + batch_size]}
               for lo in range(0, len(imgs), batch_size)]

    history = []
    for epoch in range(epochs):
        out = ref_tu.train_epoch(net, batches, criterion, optimizer,
                                 torch.device("cpu"), epoch)
        scheduler.step()
        history.append(out["total_loss"])
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return sd, history


def train_ours(train_u8, epochs, batch_size, lr, wd, seed):
    """Train tpu_unet with the same config (no augmentation, f32)."""
    import jax

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_unet.core.precision import get_policy
    from tpu_unet.models import AnomalyUNet
    from tpu_unet.train import (AugmentConfig, create_train_state,
                                make_anomaly_train_step, make_optimizer)
    from tpu_unet.train.optim import LRScheduler, set_learning_rate

    size = train_u8.shape[1]
    model = AnomalyUNet(policy=get_policy("f32"))
    tx = make_optimizer("adam", lr, wd)
    state = create_train_state(model, jax.random.key(seed), (1, size, size, 3), tx)
    no_aug = AugmentConfig(degrees=0.0, p_flip=0.0, brightness=0.0,
                           contrast=0.0, saturation=0.0, hue=0.0)
    step = make_anomaly_train_step(aug_cfg=no_aug, donate_state=True)
    sched = LRScheduler("cosine", lr, epochs)

    masks = np.zeros(train_u8.shape[:3] + (1,), np.float32)
    history = []
    key = jax.random.key(seed + 1)
    for epoch in range(epochs):
        state = state.replace(opt_state=set_learning_rate(
            state.opt_state, sched.lr_for_epoch(epoch)))
        losses_acc = []
        for i, lo in enumerate(range(0, len(train_u8), batch_size)):
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
            state, losses = step(state, train_u8[lo:lo + batch_size],
                                 masks[lo:lo + batch_size], k)
            losses_acc.append(losses)
        history.append(float(np.mean([float(d["total_loss"]) for d in losses_acc])))
    return state, history


def eval_image_auroc(params, batch_stats, test_u8, test_labels):
    """Image AUROC through the shared tpu_unet f32 eval path."""
    import jax

    from tpu_unet.core.precision import get_policy
    from tpu_unet.metrics.binary import calculate_metrics
    from tpu_unet.models import AnomalyUNet
    from tpu_unet.train import make_anomaly_eval_step
    from tpu_unet.train.optim import make_optimizer
    from tpu_unet.train.state import create_train_state

    size = test_u8.shape[1]
    model = AnomalyUNet(policy=get_policy("f32"))
    state = create_train_state(model, jax.random.key(0), (1, size, size, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    state = state.replace(params=params, batch_stats=batch_stats)
    eval_step = make_anomaly_eval_step()
    out = eval_step(state, test_u8,
                    np.zeros(test_u8.shape[:3] + (1,), np.float32))
    scores = np.asarray(out["score"])
    thr = np.percentile(scores, 95)
    m = calculate_metrics(test_labels, (scores > thr).astype(int), scores)
    return float(m["auroc"]), scores


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=16)
    ap.add_argument("--json_out", type=str, default=None)
    ap.add_argument("--assert", dest="check", action="store_true",
                    help="exit nonzero unless both AUROCs >= 0.95 and agree "
                         "within 0.05")
    args = ap.parse_args(argv)

    train_u8, test_u8, _, test_labels = make_separable_data(
        args.size, args.n_train, seed=args.seed)

    t0 = time.time()
    print(f"[1/3] training reference torch stack ({args.epochs} epochs, CPU)...")
    sd, ref_hist = train_reference(train_u8, args.epochs, args.batch_size,
                                   args.lr, args.weight_decay, args.seed)
    t_ref = time.time() - t0

    print(f"[2/3] training tpu_unet ({args.epochs} epochs)...")
    t0 = time.time()
    state, our_hist = train_ours(train_u8, args.epochs, args.batch_size,
                                 args.lr, args.weight_decay, args.seed)
    t_ours = time.time() - t0

    print("[3/3] evaluating both through the shared tpu_unet eval path...")
    from tpu_unet.utils.torch_import import convert_state_dict
    ref_params, ref_stats = convert_state_dict(sd, model="anomaly_unet")
    ref_auroc, _ = eval_image_auroc(ref_params, ref_stats, test_u8, test_labels)
    our_auroc, _ = eval_image_auroc(state.params, state.batch_stats,
                                    test_u8, test_labels)

    result = {
        "config": {"epochs": args.epochs, "batch_size": args.batch_size,
                   "lr": args.lr, "weight_decay": args.weight_decay,
                   "size": args.size, "n_train": args.n_train,
                   "seed": args.seed, "optimizer": "adam",
                   "scheduler": "cosine", "augmentation": "none (both sides)"},
        "reference_torch": {"image_auroc": ref_auroc,
                            "final_train_loss": ref_hist[-1],
                            "loss_history": [round(v, 4) for v in ref_hist],
                            "train_seconds": round(t_ref, 1)},
        "tpu_unet": {"image_auroc": our_auroc,
                     "final_train_loss": our_hist[-1],
                     "loss_history": [round(v, 4) for v in our_hist],
                     "train_seconds": round(t_ours, 1)},
        "auroc_diff": round(abs(ref_auroc - our_auroc), 4),
    }
    print(json.dumps(result, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)
    if args.check:
        ok = ref_auroc >= 0.95 and our_auroc >= 0.95 and \
            abs(ref_auroc - our_auroc) <= 0.05
        if not ok:
            raise SystemExit(f"parity check FAILED: {result['auroc_diff']=} "
                             f"{ref_auroc=} {our_auroc=}")
        print("parity check PASSED")
    return result


if __name__ == "__main__":
    main()

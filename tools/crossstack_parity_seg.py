#!/usr/bin/env python3
"""Cross-stack end-to-end TRAINING parity for the SEGMENTATION family.

The anomaly-family counterpart (tools/crossstack_parity.py, r3) proved
trained-from-scratch loop parity for AnomalyUNet; this closes the same link
for the seg stack: the ACTUAL reference Gear trainer (its inlined
train_epoch + CombinedSegmentationLoss + get_optimizer,
/root/reference/train.py:118-161,106-115; src/metrics.py:285) and tpu_unet's
make_seg_train_step train a SegmentationUNet from scratch on identical
synthetic 4-class data in identical batch order, and BOTH final weight sets
are evaluated through the same tpu_unet f32 seg eval step (torch weights via
the bitwise-tested utils/torch_import seg_unet mapping). Parity claim: both
stacks learn the task (val mIoU >> chance) and agree within tolerance.

Method notes (mirrors the anomaly harness):
- Separable task: smooth background + three color-coded defect blobs
  (class 1 red square / class 2 green disc / class 3 blue stripe) — learnable
  by color alone in a few epochs.
- No augmentation on either side (the reference's augs are torchvision, not
  installed; removing both keeps it apples-to-apples); dropout 0 (the
  reference's bottleneck Dropout2d is stochastic and would decouple the runs).
- Independent inits (flax vs torch initializers differ by design), so the
  assertion is task-level agreement, not parameter equality.

Run:  python tools/crossstack_parity_seg.py [--epochs 12] [--assert]
Writes tools/crossstack_parity_seg_result.json when run from the repo.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
NUM_CLASSES = 4


def make_seg_data(size=32, n_train=16, n_val=8, seed=0):
    """Smooth background + color-coded class blobs; returns u8 images, masks."""
    rng = np.random.default_rng(seed)

    def sample():
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        base = 100 + 40 * np.sin(2.5 * yy) * np.cos(1.5 * xx)
        img = np.stack([base, base, base], axis=-1)
        img += rng.normal(0, 3, img.shape)
        mask = np.zeros((size, size), np.uint8)
        # class 1: red square
        s = int(rng.integers(6, 10))
        y0, x0 = (int(rng.integers(1, size - s - 1)) for _ in range(2))
        img[y0:y0 + s, x0:x0 + s] = [200, 40, 40]
        mask[y0:y0 + s, x0:x0 + s] = 1
        # class 2: green disc
        cy, cx = (int(rng.integers(6, size - 6)) for _ in range(2))
        r = int(rng.integers(3, 6))
        yy2, xx2 = np.mgrid[0:size, 0:size]
        disc = (yy2 - cy) ** 2 + (xx2 - cx) ** 2 <= r * r
        img[disc] = [40, 200, 40]
        mask[disc] = 2
        # class 3: blue horizontal stripe
        y1 = int(rng.integers(0, size - 3))
        img[y1:y1 + 3, :] = [40, 40, 200]
        mask[y1:y1 + 3, :] = 3
        return np.clip(img, 0, 255).astype(np.uint8), mask

    tr = [sample() for _ in range(n_train)]
    va = [sample() for _ in range(n_val)]
    return (np.stack([x for x, _ in tr]), np.stack([m for _, m in tr]),
            np.stack([x for x, _ in va]), np.stack([m for _, m in va]))


def normalize_nchw(u8):
    x = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (0, 3, 1, 2))


def _load_ref_trainer():
    """Import /root/reference/train.py (the Gear trainer) as a module.

    torchvision is not installed on this box; the trainer only reaches it
    through src.gear_dataset's module-level import (transforms are used
    inside dataloader paths this harness never calls), so a module stub
    satisfies the import without changing any executed code.
    """
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    spec = importlib.util.spec_from_file_location(
        "ref_gear_train", os.path.join(ref_root, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def train_reference(train_u8, train_masks, epochs, batch_size, lr, wd, seed):
    import torch

    ref = _load_ref_trainer()  # puts /root/reference on sys.path first
    from src.metrics import CombinedSegmentationLoss  # noqa: E402 (ref path)
    from src.model import SegmentationUNet  # noqa: E402
    torch.manual_seed(seed)
    np.random.seed(seed)
    device = torch.device("cpu")
    net = SegmentationUNet(n_channels=3, n_classes=NUM_CLASSES,
                           dropout=0.0).to(device)
    criterion = CombinedSegmentationLoss(ce_weight=1.0, dice_weight=1.0,
                                         focal_weight=0.0)
    optimizer = ref.get_optimizer(net, "adam", lr, wd)

    imgs = torch.from_numpy(normalize_nchw(train_u8))
    msks = torch.from_numpy(train_masks.astype(np.int64))
    n = len(imgs)
    batches = [(imgs[lo:lo + batch_size], msks[lo:lo + batch_size], None)
               for lo in range(0, n, batch_size)]
    losses = []
    t0 = time.time()
    for epoch in range(epochs):
        out = ref.train_epoch(net, batches, criterion, optimizer, device,
                              epoch, NUM_CLASSES)
        losses.append(float(out["loss"]))
    secs = time.time() - t0
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return sd, losses, secs


def train_ours(train_u8, train_masks, epochs, batch_size, lr, wd, seed):
    import jax

    from tpu_unet.core.precision import get_policy
    from tpu_unet.models import SegmentationUNet
    from tpu_unet.train import (AugmentConfig, SegLossConfig,
                                create_train_state, make_optimizer,
                                make_seg_train_step)

    model = SegmentationUNet(n_classes=NUM_CLASSES, dropout=0.0,
                             policy=get_policy("f32"))
    tx = make_optimizer("adam", lr, wd)
    state = create_train_state(model, jax.random.key(seed), (1, 32, 32, 3), tx)
    no_aug = AugmentConfig(degrees=0.0, p_flip=0.0, brightness=0.0,
                           contrast=0.0, saturation=0.0, hue=0.0)
    step = make_seg_train_step(NUM_CLASSES,
                               SegLossConfig(ce_weight=1.0, dice_weight=1.0,
                                             focal_weight=0.0),
                               no_aug, donate_state=False)
    n = len(train_u8)
    losses = []
    t0 = time.time()
    for epoch in range(epochs):
        acc = []
        for lo in range(0, n, batch_size):
            state, ld, _cm = step(state, train_u8[lo:lo + batch_size],
                                  train_masks[lo:lo + batch_size],
                                  jax.random.key(1000 * epoch + lo))
            acc.append(ld["total_loss"])
        losses.append(float(np.mean([float(v) for v in acc])))
    secs = time.time() - t0
    return state.params, state.batch_stats, losses, secs


def eval_miou(params, batch_stats, val_u8, val_masks):
    """Both weight sets ride the SAME tpu_unet f32 seg eval path."""
    import jax

    from tpu_unet.core.precision import get_policy
    from tpu_unet.metrics.confusion import SegmentationMetrics
    from tpu_unet.models import SegmentationUNet
    from tpu_unet.train import create_train_state, make_optimizer
    from tpu_unet.train.steps import make_seg_eval_step

    model = SegmentationUNet(n_classes=NUM_CLASSES, dropout=0.0,
                             policy=get_policy("f32"))
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    state = state.replace(params=params, batch_stats=batch_stats)
    step = make_seg_eval_step(NUM_CLASSES)
    _, _, cm = step(state, val_u8, val_masks)
    metrics = SegmentationMetrics(NUM_CLASSES)
    metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm)
    return float(metrics.compute_iou(per_class=False))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--assert", dest="do_assert", action="store_true",
                   help="Exit nonzero unless both stacks learn and agree")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    tr_u8, tr_m, va_u8, va_m = make_seg_data(seed=args.seed)

    print("training reference torch stack (its own train_epoch/loss)...",
          flush=True)
    sd, ref_losses, ref_secs = train_reference(
        tr_u8, tr_m, args.epochs, args.batch_size, args.lr,
        args.weight_decay, args.seed)

    print("training tpu_unet stack...", flush=True)
    params, stats, our_losses, our_secs = train_ours(
        tr_u8, tr_m, args.epochs, args.batch_size, args.lr,
        args.weight_decay, args.seed)

    from tpu_unet.utils.torch_import import convert_state_dict
    ref_params, ref_stats = convert_state_dict(sd, model="seg_unet")

    ref_miou = eval_miou(ref_params, ref_stats, va_u8, va_m)
    our_miou = eval_miou(params, stats, va_u8, va_m)

    result = {
        "metric": "crossstack_seg_train_parity_val_miou",
        "epochs": args.epochs,
        "reference": {"val_miou": round(ref_miou, 4),
                      "loss_history": [round(v, 4) for v in ref_losses],
                      "train_seconds": round(ref_secs, 1)},
        "tpu_unet": {"val_miou": round(our_miou, 4),
                     "loss_history": [round(v, 4) for v in our_losses],
                     "train_seconds": round(our_secs, 1)},
        "miou_diff": round(abs(ref_miou - our_miou), 4),
    }
    print(json.dumps(result))
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "crossstack_parity_seg_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    if args.do_assert:
        chance = 1.0 / NUM_CLASSES
        assert ref_miou > 2 * chance and our_miou > 2 * chance, result
        assert abs(ref_miou - our_miou) < 0.15, result
    return result


if __name__ == "__main__":
    main()

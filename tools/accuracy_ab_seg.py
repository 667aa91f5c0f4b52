#!/usr/bin/env python3
"""Accuracy A/B across the segmentation model family (VERDICT r4 #2).

Through round 4 the beyond-reference architectures (attn_unet, unetpp) were
throughput- and parity-characterized but never QUALITY-compared against the
baseline SegmentationUNet. This harness trains every family member from
scratch on the same synthetic 4-class task with identical budgets (same data,
batch order, optimizer, epochs) and reports val mIoU per model, so the gates /
nested grid either show a quality win or the honest negative goes on record
(docs/ARCHITECTURE.md, next to each model's measured throughput cost).

Task design — shape discrimination, not color lookup: the crossstack-parity
task (tools/crossstack_parity_seg.py) is color-separable and saturates every
architecture; here class 1 (square) and class 2 (disc) share the SAME color,
so telling them apart needs spatial context — the kind of signal attention
gates (arXiv:1804.03999 §4) and nested dense skips (arXiv:1912.05074) claim
to help with. Class 3 stays a thin stripe (boundary quality). A small train
set stresses generalization.

Models (identical budget each):
  seg_unet          — the reference architecture (baseline)
  attn_unet         — gated skips (coarse gate, models/attention.py)
  unetpp            — UNet++ nested grid, plain output X[0][4]
  unetpp_ds         — UNet++ with deep supervision (train: averaged head
                      losses; eval: heads=4 averaged logits)

Run (real chip or CPU; ~minutes on chip, dominated by 4 step compiles):
  python tools/accuracy_ab_seg.py [--epochs 30] [--assert]
Writes tools/accuracy_ab_seg_result.json (committed artifact, pinned by
tests/test_tools.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_CLASSES = 4
SIZE = 64


def make_shape_data(size=SIZE, n_train=64, n_val=32, seed=0):
    """Same-color square (class 1) vs disc (class 2) + thin stripe (class 3)
    on a smooth textured background. Returns (train_u8, train_m, val_u8, val_m)."""
    rng = np.random.default_rng(seed)

    def sample():
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        phase = rng.uniform(0, 6.28)
        base = 110 + 35 * np.sin(3.0 * yy + phase) * np.cos(2.0 * xx)
        img = np.stack([base, base, base], axis=-1)
        img += rng.normal(0, 4, img.shape)
        mask = np.zeros((size, size), np.uint8)
        color = [190, 60, 60]  # classes 1 and 2 share this color
        # class 1: square
        s = int(rng.integers(8, 14))
        y0, x0 = (int(rng.integers(1, size - s - 1)) for _ in range(2))
        img[y0:y0 + s, x0:x0 + s] = color + rng.normal(0, 4, (s, s, 3))
        mask[y0:y0 + s, x0:x0 + s] = 1
        # class 2: disc, same color — separable only by shape
        r = int(rng.integers(5, 8))
        cy, cx = (int(rng.integers(r + 1, size - r - 1)) for _ in range(2))
        yy2, xx2 = np.mgrid[0:size, 0:size]
        disc = (yy2 - cy) ** 2 + (xx2 - cx) ** 2 <= r * r
        img[disc] = color + rng.normal(0, 4, (int(disc.sum()), 3))
        mask[disc] = 2
        # class 3: thin blue stripe (boundary sharpness)
        y1 = int(rng.integers(0, size - 2))
        img[y1:y1 + 2, :] = [50, 50, 200]
        mask[y1:y1 + 2, :] = 3
        return np.clip(img, 0, 255).astype(np.uint8), mask

    tr = [sample() for _ in range(n_train)]
    va = [sample() for _ in range(n_val)]
    return (np.stack([x for x, _ in tr]), np.stack([m for _, m in tr]),
            np.stack([x for x, _ in va]), np.stack([m for _, m in va]))


def _build(name, base_features):
    from tpu_unet.core.precision import get_policy
    from tpu_unet.models import build_model

    policy = get_policy("f32")  # identical numerics across devices/backends
    if name == "unetpp_ds":
        return build_model("unetpp", n_classes=NUM_CLASSES, dropout=0.0,
                           deep_supervision=True, policy=policy,
                           base_features=base_features)
    return build_model(name, n_classes=NUM_CLASSES, dropout=0.0,
                       policy=policy, base_features=base_features)


def train_and_eval(name, data, epochs, batch_size, lr, wd, seed,
                   base_features):
    """Train one model from scratch; returns (val_miou, per_class_iou,
    loss_history, seconds). Identical budget: the data/batch order and keys
    depend only on (epochs, batch, seed), never on the model."""
    import jax

    from tpu_unet.metrics.confusion import SegmentationMetrics
    from tpu_unet.train import (AugmentConfig, SegLossConfig,
                                create_train_state, make_optimizer,
                                make_seg_train_step)
    from tpu_unet.train.steps import make_seg_eval_step

    tr_u8, tr_m, va_u8, va_m = data
    model = _build(name, base_features)
    tx = make_optimizer("adam", lr, wd)
    state = create_train_state(model, jax.random.key(seed),
                               (1, SIZE, SIZE, 3), tx)
    aug = AugmentConfig(degrees=0.0, p_flip=0.5, brightness=0.0, contrast=0.0,
                        saturation=0.0, hue=0.0)  # flips only: cheap + fair
    step = make_seg_train_step(NUM_CLASSES, SegLossConfig(), aug,
                               donate_state=False)
    n = len(tr_u8)
    losses = []
    t0 = time.time()
    for epoch in range(epochs):
        order = np.random.default_rng(seed + epoch).permutation(n)
        acc = []
        for lo in range(0, n, batch_size):
            idx = order[lo:lo + batch_size]
            state, ld, _cm = step(state, tr_u8[idx], tr_m[idx],
                                  jax.random.key(10_000 * epoch + lo))
            acc.append(ld["total_loss"])
        losses.append(float(np.mean([float(v) for v in acc])))
    secs = time.time() - t0

    estep = make_seg_eval_step(NUM_CLASSES)
    _, _, cm = estep(state, va_u8, va_m)
    metrics = SegmentationMetrics(NUM_CLASSES)
    metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm)
    miou = float(metrics.compute_iou(per_class=False))
    per_class = [round(float(v), 4) for v in metrics.compute_iou(per_class=True)]
    return miou, per_class, losses, secs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seeds", type=int, nargs="*", default=[42, 7, 13],
                   help="One data+init seed per repetition; models are PAIRED "
                        "within a seed (identical data/batch order), and the "
                        "reported val_miou is the mean over seeds")
    p.add_argument("--base_features", type=int, default=32,
                   help="Channel ladder base (32 halves compile/step cost; "
                        "the RANKING question is architecture-relative)")
    p.add_argument("--models", nargs="*",
                   default=["seg_unet", "attn_unet", "unetpp", "unetpp_ds"])
    p.add_argument("--assert", dest="do_assert", action="store_true")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    results = {}
    for seed in args.seeds:
        data = make_shape_data(seed=seed)
        for name in args.models:
            print(f"training {name} (seed {seed}, {args.epochs} epochs, "
                  "identical budget)...", flush=True)
            miou, per_class, losses, secs = train_and_eval(
                name, data, args.epochs, args.batch_size, args.lr,
                args.weight_decay, seed, args.base_features)
            r = results.setdefault(name, {"per_seed_miou": [],
                                          "per_seed_per_class_iou": [],
                                          "per_seed_final_train_loss": [],
                                          "train_seconds": 0.0})
            r["per_seed_miou"].append(round(miou, 4))
            r["per_seed_per_class_iou"].append([round(float(c), 4)
                                                for c in per_class])
            r["per_seed_final_train_loss"].append(round(losses[-1], 4))
            r["train_seconds"] = round(r["train_seconds"] + secs, 1)
            print(f"  {name} seed {seed}: val mIoU {miou:.4f} "
                  f"(per-class {per_class})", flush=True)
    for r in results.values():
        # Headline fields are MEANS over seeds — all of them, so per_class_iou
        # read next to val_miou is the same population (advisor r5: the first
        # cut froze per-class/loss at seed 0 while val_miou averaged 3 seeds).
        r["val_miou"] = round(float(np.mean(r["per_seed_miou"])), 4)
        r["per_class_iou"] = [round(float(c), 4) for c in
                              np.mean(r["per_seed_per_class_iou"], axis=0)]
        r["final_train_loss"] = round(
            float(np.mean(r["per_seed_final_train_loss"])), 4)

    base = results.get("seg_unet", {}).get("val_miou")
    out = {
        "metric": "seg_family_accuracy_ab_val_miou",
        "task": "same-color square-vs-disc shape discrimination + thin stripe "
                f"(4 classes, {SIZE}^2, 64 train / 32 val)",
        "budget": {"epochs": args.epochs, "batch_size": args.batch_size,
                   "lr": args.lr, "weight_decay": args.weight_decay,
                   "seeds": args.seeds, "base_features": args.base_features},
        "models": results,
    }
    if base is not None:  # `is not None`: mIoU 0.0 must not hide the field
        for name, r in results.items():
            r["vs_seg_unet"] = round(r["val_miou"] - base, 4)
    print(json.dumps(out))
    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "accuracy_ab_seg_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    if args.do_assert:
        chance = 1.0 / NUM_CLASSES
        for name, r in results.items():
            assert r["val_miou"] > 2 * chance, (name, r)
    return out


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""A/B benchmark for the segmentation train-step loss head on the real chip.

Measures the full jitted seg train step (augment + fwd + loss + bwd + Adam + CM)
at the two BASELINE seg shapes with:

  - ``sliced``    — the channel-sliced loss head (losses/segmentation.py::
                    _combined_sliced, the default for C<=8): every elementwise
                    tensor is a full-lane (N,H,W) plane.
  - ``unsliced``  — the straightforward (N,H,W,C) composition (the r2 path):
                    C-minor tensors occupy C of 128 vector lanes, so elementwise
                    passes cost ~128/C-fold their logical bytes.
  - ``sliced_nocm`` — sliced loss with the on-device confusion matrix dropped,
                    to size the CM contraction's share of the step.

Usage: python tools/bench_seg_loss.py [--steps 10]
Prints one JSON object with img/s per variant per shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def force_loss(which: str):
    """A combined_segmentation_loss replacement pinned to one implementation."""
    from tpu_unet.losses import segmentation as segmod

    impl = {"sliced": segmod._combined_sliced,
            "unsliced": segmod._combined_unsliced}[which]

    def f(logits, labels, **kw):
        full = dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.0,
                    class_weights=None, ignore_index=None, sample_weight=None)
        full.update(kw)
        return impl(logits, labels, **full)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import SegmentationUNet
    from tpu_unet.parallel import make_mesh, replicate, shard_batch
    from tpu_unet.train import (AugmentConfig, SegLossConfig, create_train_state,
                                make_optimizer, make_seg_train_step)
    from tpu_unet.train import steps as steps_mod

    mesh = make_mesh()
    n_chips = int(np.prod(mesh.devices.shape))
    tx = make_optimizer("adam", 1e-3, 1e-4)
    rng = np.random.default_rng(0)

    shapes = {
        "ksdd_1024x512_b8": dict(n_classes=3, hw=(1024, 512), batch=8,
                                 loss=SegLossConfig(class_weights=(1.0, 50.0, 50.0)),
                                 aug=AugmentConfig(degrees=5.0)),
        "gear_512_b8": dict(n_classes=4, hw=(512, 512), batch=8,
                            loss=SegLossConfig(),
                            aug=AugmentConfig(degrees=10.0, brightness=0.2,
                                              contrast=0.2, saturation=0.2, hue=0.1)),
    }

    orig = steps_mod.combined_segmentation_loss
    report = {}
    for name, cfg in shapes.items():
        h, w = cfg["hw"]
        model = SegmentationUNet(n_classes=cfg["n_classes"], policy=BF16_POLICY)
        b = cfg["batch"] * n_chips
        imgs = shard_batch(mesh, rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
        lbls = shard_batch(mesh, rng.integers(0, cfg["n_classes"], (b, h, w))
                           .astype(np.int32))

        def fresh_state():
            return replicate(mesh, create_train_state(
                model, jax.random.key(3), (1, h, w, 3), tx))

        out = {}
        for variant in ("sliced", "unsliced", "sliced_nocm"):
            steps_mod.combined_segmentation_loss = force_loss(
                "unsliced" if variant == "unsliced" else "sliced")
            try:
                step = make_seg_train_step(
                    cfg["n_classes"], cfg["loss"], cfg["aug"],
                    with_confusion=(variant != "sliced_nocm"), donate_state=True)
                st = fresh_state()
                compiled = step.lower(st, imgs, lbls, jax.random.key(0)).compile()
                r = None
                for i in range(args.warmup):
                    r = compiled(st, imgs, lbls, jax.random.key(i))
                    st = r[0]
                float(r[1]["total_loss"])
                t0 = time.perf_counter()
                acc = []
                for i in range(args.steps):
                    r = compiled(st, imgs, lbls, jax.random.key(500 + i))
                    st = r[0]
                    acc.append(r[1]["total_loss"])
                assert all(np.isfinite(float(v)) for v in acc)
                dt = time.perf_counter() - t0
                out[variant] = {
                    "images_per_sec_per_chip": round(b * args.steps / dt / n_chips, 2),
                    "ms_per_step": round(dt / args.steps * 1e3, 1),
                }
                del st, r
            finally:
                steps_mod.combined_segmentation_loss = orig
        report[name] = out

    print(json.dumps(report))


if __name__ == "__main__":
    main()

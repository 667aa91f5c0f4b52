#!/usr/bin/env python3
"""Gradient-accumulation A/B: throughput + peak temp memory per (batch, accum).

The measured per-image throughput knee at batch>16 (docs/ARCHITECTURE.md: the
spill regime — activation working set outgrows VMEM/HBM-friendly tiling) is
exactly what grad_accum is for: --batch_size 32 --grad_accum 2 runs two
batch-16 microbatches inside ONE XLA program (lax.scan) with a single optimizer
update, so the effective batch grows while peak activation memory stays at the
microbatch. This tool measures both sides of that trade: images/sec and the
compiled program's temp-allocation size (XLA memory_analysis) for each
(effective batch, accum) pair.

Usage:
  python tools/bench_accum.py                      # anomaly b16@256 defaults
  python tools/bench_accum.py --pairs 16x1,32x1,32x2,64x4
  python tools/bench_accum.py --task seg --height 1024 --width 512 \
      --pairs 8x1,16x1,16x2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_pairs(spec: str):
    out = []
    for tok in spec.split(","):
        b, g = tok.lower().split("x")
        out.append((int(b), int(g)))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["anomaly", "seg"], default="anomaly")
    p.add_argument("--image_size", type=int, default=256, help="anomaly only")
    p.add_argument("--height", type=int, default=1024, help="seg only")
    p.add_argument("--width", type=int, default=512, help="seg only")
    p.add_argument("--num_classes", type=int, default=3, help="seg only")
    p.add_argument("--pairs", type=str, default="16x1,32x1,32x2,64x4",
                   help="comma list of <effective_batch>x<grad_accum>")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--base_features", type=int, default=64,
                   help="UNet width (shrink for quick smoke runs)")
    args = p.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import AnomalyUNet, SegmentationUNet
    from tpu_unet.train import (AugmentConfig, SegLossConfig, create_train_state,
                                make_anomaly_train_step, make_optimizer,
                                make_seg_train_step)

    if args.task == "anomaly":
        h = w = args.image_size
        model = AnomalyUNet(policy=BF16_POLICY,
                            base_features=args.base_features)
    else:
        h, w = args.height, args.width
        model = SegmentationUNet(n_classes=args.num_classes, policy=BF16_POLICY,
                                 base_features=args.base_features)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    rng = np.random.default_rng(0)
    print(f"{args.task} @ {h}x{w} on {jax.devices()[0].platform}, "
          f"{args.steps} timed steps per config")

    for batch, accum in parse_pairs(args.pairs):
        state = create_train_state(model, jax.random.key(0), (1, h, w, 3), tx)
        images = rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
        if args.task == "anomaly":
            target = np.zeros((batch, h, w, 1), np.float32)
            step = make_anomaly_train_step(aug_cfg=AugmentConfig(),
                                           donate_state=True, grad_accum=accum)
        else:
            target = rng.integers(0, args.num_classes, (batch, h, w)).astype(np.uint8)
            step = make_seg_train_step(args.num_classes, SegLossConfig(),
                                       AugmentConfig(), donate_state=True,
                                       grad_accum=accum)
        compiled = step.lower(state, images, target, jax.random.key(0)).compile()
        try:
            mem = compiled.memory_analysis()
            temp_gb = mem.temp_size_in_bytes / 1e9
        except Exception:
            temp_gb = float("nan")

        def fetch(out):
            losses = out[1]
            return float(losses["total_loss"])

        for i in range(max(1, args.warmup)):  # >=1: first call must precede t0
            out = compiled(state, images, target, jax.random.key(i))
            state = out[0]
        fetch(out)
        t0 = time.perf_counter()
        acc = []
        for i in range(args.steps):
            out = compiled(state, images, target, jax.random.key(100 + i))
            state = out[0]
            acc.append(out[1]["total_loss"])
        vals = jax.device_get(acc)  # forces the whole donated-state chain
        dt = time.perf_counter() - t0
        assert all(np.isfinite(v) for v in vals)
        ips = batch * args.steps / dt
        print(f"  b{batch:<3} x accum {accum:<2} (micro {batch // accum:>3}): "
              f"{ips:7.1f} img/s  {dt / args.steps * 1e3:7.1f} ms/step  "
              f"temp {temp_gb:6.2f} GB")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""A/B the targeted-remat policy on the real chip (VERDICT r4 #3).

The headline AnomalyUNet b16@256 step sits 40% above its bandwidth-roofline
lower bound (72.5 ms device vs 51.8 ms; docs/ARCHITECTURE.md "Roofline / MFU"),
and the only remat experiment recorded through r4 was FULL-forward remat (a
measured loser at every batch). This tool measures the targeted form: recompute
only the full-/half-resolution DoubleConv rows (inc, down1, up3, up4 — where
the activation bytes live), leaving the cheap deep rows materialized.

Variants (make_*_train_step's ``remat`` + the models' ``remat_full_res`` tags):
  none      — the shipped step (baseline)
  full_res  — jax.checkpoint(policy=save_anything_except_these_names('full_res'))
  full      — whole-forward remat (the known loser, kept to anchor the A/B)

Usage:
  python tools/bench_remat.py                     # anomaly 256^2 b16 (headline)
  python tools/bench_remat.py --config attn       # attn_unet 512^2 b8 (gear)
  python tools/bench_remat.py --batch 32          # probe the spill regime

Bench methodology = bench.py: AOT-compile once, cost-analyze that executable,
3 timed windows of 20 steps, best + per-trial figures; scalars fetched to force
the chain over the axon tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(make_state, make_step, imgs, lbls_or_masks, *, warmup=3,
                  steps=20, trials=3):
    import jax

    st = make_state()
    step = make_step()
    compiled = step.lower(st, imgs, lbls_or_masks, jax.random.key(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    r = None
    for i in range(warmup):
        r = compiled(st, imgs, lbls_or_masks, jax.random.key(i))
        st = r[0]
    float(r[1]["total_loss"])
    n = imgs.shape[0]
    trial_ips = []
    for _t in range(trials):
        t0 = time.perf_counter()
        acc = []
        for i in range(steps):
            r = compiled(st, imgs, lbls_or_masks, jax.random.key(100 + i))
            st = r[0]
            acc.append(r[1]["total_loss"])
        assert all(np.isfinite(float(v)) for v in acc)
        trial_ips.append(round(n * steps / (time.perf_counter() - t0), 2))
    return {
        "images_per_sec": max(trial_ips),
        "median_images_per_sec": round(float(np.median(trial_ips)), 2),
        "trial_images_per_sec": trial_ips,
        "step_flops": flops,
        "step_hbm_bytes": byts,
        "step_hbm_gb": round(byts / 1e9, 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", choices=["anomaly", "attn", "seg"],
                    default="anomaly")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--image_size", type=int, default=None)
    ap.add_argument("--variants", nargs="*",
                    default=["none", "full_res", "full"])
    args = ap.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.parallel import make_mesh, replicate, shard_batch
    from tpu_unet.train import (AugmentConfig, SegLossConfig,
                                create_train_state, make_anomaly_train_step,
                                make_optimizer, make_seg_train_step)

    mesh = make_mesh()
    tx = make_optimizer("adam", 1e-3, 1e-4)
    rng = np.random.default_rng(0)

    if args.config == "anomaly":
        hw, batch = args.image_size or 256, args.batch or 16
        from tpu_unet.models import AnomalyUNet
        model_fn = lambda tag: AnomalyUNet(policy=BF16_POLICY,
                                           remat_full_res=tag)
        aug = AugmentConfig()
        step_fn = lambda r: make_anomaly_train_step(
            aug_cfg=aug, donate_state=True, remat=r)
        lbls = shard_batch(mesh, np.zeros((batch, hw, hw, 1), np.float32))
    else:
        hw, batch = args.image_size or 512, args.batch or 8
        from tpu_unet.models import SegmentationUNet
        from tpu_unet.models.attention import AttentionUNet
        cls = AttentionUNet if args.config == "attn" else SegmentationUNet
        model_fn = lambda tag: cls(n_classes=4, policy=BF16_POLICY,
                                   remat_full_res=tag)
        aug = AugmentConfig(degrees=10.0, brightness=0.2, contrast=0.2,
                            saturation=0.2, hue=0.1)
        step_fn = lambda r: make_seg_train_step(
            4, SegLossConfig(), aug, donate_state=True, remat=r)
        lbls = shard_batch(mesh, rng.integers(0, 4, (batch, hw, hw)
                                              ).astype(np.int32))
    imgs = shard_batch(mesh, rng.integers(0, 256, (batch, hw, hw, 3),
                                          dtype=np.uint8))

    out = {"config": args.config, "batch": batch, "image_size": hw}
    for variant in args.variants:
        tag = variant != "none"
        model = model_fn(tag)

        def make_state(model=model):
            return replicate(mesh, create_train_state(
                model, jax.random.key(0), (1, hw, hw, 3), tx))

        res = bench_variant(make_state, lambda v=variant: step_fn(v),
                            imgs, lbls)
        out[variant] = res
        print(f"{variant:10s}: {res['images_per_sec']:7.2f} img/s best "
              f"(median {res['median_images_per_sec']:7.2f}), "
              f"{res['step_hbm_gb']:6.2f} GB/step, "
              f"{res['step_flops'] / 1e12:.2f} TFLOP/step", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Seg-family (UNet++ / Attention U-Net / SegmentationUNet) train throughput
on the real chip.

Same methodology as bench.py's BASELINE configs (lower+compile the donated-state
jitted seg train step on device-resident synthetic data, warmup, timed steps,
XLA cost analysis for MFU/HFU/HBM fractions) applied to the `--model unetpp`
extension, so the new family gets measured figures next to the reference ladder
instead of just a parity claim.

Usage (runs on whatever JAX platform is live; on this box the axon TPU):
  python tools/bench_unetpp.py                       # 512² b8, unetpp b32 vs seg_unet b64
  python tools/bench_unetpp.py --deep_supervision    # + the 4-head variant
  python tools/bench_unetpp.py --models unetpp --base_features 64
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

PEAK_FLOPS_BF16 = float(os.environ.get("TPU_UNET_PEAK_FLOPS", 197e12))
PEAK_HBM_BPS = float(os.environ.get("TPU_UNET_PEAK_HBM_BPS", 819e9))


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_classes", type=int, default=4)
    ap.add_argument("--models", nargs="+", default=["unetpp", "seg_unet"],
                    choices=["unetpp", "seg_unet", "attn_unet"])
    ap.add_argument("--base_features", type=int, default=None,
                    help="Override width (default: 32 for unetpp = paper, "
                         "64 for seg_unet = reference)")
    ap.add_argument("--deep_supervision", action="store_true",
                    help="Also bench the 4-head unetpp variant")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import build_model
    from tpu_unet.train import (AugmentConfig, SegLossConfig,
                                create_train_state, make_optimizer,
                                make_seg_train_step)
    from tpu_unet.train.state import num_params

    print(f"devices: {jax.devices()}", file=sys.stderr)
    s = args.image_size
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 256, (args.batch, s, s, 3), dtype=np.uint8))
    labels = jax.device_put(
        rng.integers(0, args.num_classes, (args.batch, s, s), dtype=np.uint8))

    step = make_seg_train_step(
        args.num_classes, SegLossConfig(),
        AugmentConfig(degrees=10.0, brightness=0.2, contrast=0.2,
                      saturation=0.2, hue=0.1),  # the Gear augment config
        donate_state=True)

    variants = []
    for name in args.models:
        bf = args.base_features or (32 if name == "unetpp" else 64)
        variants.append((f"{name}_b{bf}", name, bf, False))
        if args.deep_supervision and name == "unetpp":
            variants.append((f"{name}_b{bf}_ds", name, bf, True))

    results = {}
    for tag, name, bf, ds in variants:
        model = build_model(name, n_classes=args.num_classes, policy=BF16_POLICY,
                            base_features=bf, deep_supervision=ds)
        tx = make_optimizer("adam", 1e-3, 1e-4)
        st = create_train_state(model, jax.random.key(0), (1, s, s, 3), tx)
        nparams = num_params(st)
        compiled = step.lower(st, images, labels, jax.random.key(0)).compile()
        fl, by = _cost(compiled)
        # >=1 warmup step: the scalar fetch below must have a step to force
        # (and --warmup 0 would otherwise dereference r=None), bench_accum rule.
        for i in range(max(1, args.warmup)):
            r = compiled(st, images, labels, jax.random.key(i))
            st = r[0]
        float(r[1]["total_loss"])  # fetch a scalar: forces the chain (CLAUDE.md)
        t0 = time.perf_counter()
        vals = []
        for i in range(args.steps):
            r = compiled(st, images, labels, jax.random.key(500 + i))
            st = r[0]
            vals.append(r[1]["total_loss"])
        assert all(np.isfinite(float(v)) for v in vals)
        dt = time.perf_counter() - t0
        sps = args.steps / dt
        out = {
            "params": nparams,
            "images_per_sec_per_chip": round(args.batch * sps, 2),
            "step_ms": round(1000.0 / sps, 1),
        }
        if fl:
            out["hfu"] = round(fl * sps / PEAK_FLOPS_BF16, 3)
        if by:
            out["hbm_bw_fraction"] = round(by * sps / PEAK_HBM_BPS, 3)
        results[tag] = out
        print(f"{tag}: {out}", file=sys.stderr)
        del st, compiled

    print(json.dumps({
        "metric": "unetpp_seg_train",
        "image_size": s, "batch": args.batch,
        "results": results,
    }))


if __name__ == "__main__":
    main()

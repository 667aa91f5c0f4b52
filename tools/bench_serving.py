#!/usr/bin/env python3
"""Serving-throughput benchmark: every engine x precision on the current device.

Reproduces the serving figures in docs/ARCHITECTURE.md:
- AnomalyScorer (score-only program, seg decoder DCE'd), bf16 + int8, b128 @256
- SegmentationPredictor, bf16 + int8, Gear (512x512 b16) and KolektorSDD
  (1024x512 b8) shapes

Methodology (CLAUDE.md gotchas): batches are enqueued back-to-back on
device-resident inputs and only the (N,) per-image scalars are fetched — that
forces each step's completion while keeping the axon tunnel's MB-scale
mask/image transfers out of the figure (production hosts fetch over local
PCIe). Models are randomly initialized: serving throughput is weight-agnostic.

Usage: python tools/bench_serving.py [--quick]
Prints one JSON line with img/s per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="fewer timed batches (5 instead of 10)")
    p.add_argument("--skip_seg", action="store_true")
    p.add_argument("--unetpp", action="store_true",
                   help="also bench the UNet++ deep-supervision heads ladder "
                        "(accurate heads=4 vs pruned 3/2/1) at 512² b16 bf16")
    p.add_argument("--attn", action="store_true",
                   help="also bench Attention U-Net serving (bf16 + int8) "
                        "at 512² b16 next to the seg_unet figures")
    p.add_argument("--latency", action="store_true",
                   help="also measure batch-1 online-serving latency "
                        "(p50/p95 ms per request) for every config")
    args = p.parse_args(argv)
    n_batches = 5 if args.quick else 10
    n_lat = 20 if args.quick else 50

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import AnomalyUNet, SegmentationUNet
    from tpu_unet.serve import AnomalyScorer, SegmentationPredictor

    rng = np.random.default_rng(0)
    out = {}

    model = AnomalyUNet(policy=BF16_POLICY)
    v = model.init(jax.random.key(0), np.zeros((1, 256, 256, 3), np.float32),
                   train=False)
    calib = rng.integers(0, 256, (16, 256, 256, 3), dtype=np.uint8)
    for mode, kw in [("bf16", {}),
                     ("int8", {"quantize": "int8", "calib_images": calib})]:
        scorer = AnomalyScorer.from_variables(v["params"], v["batch_stats"],
                                              image_size=256, batch_size=128, **kw)
        out[f"anomaly_score_only_b128_{mode}"] = round(
            scorer.throughput(n_batches), 1)
        print(f"anomaly score-only b128 {mode}: "
              f"{out[f'anomaly_score_only_b128_{mode}']} img/s", flush=True)
        if args.latency:
            # int8: the batch-N engine's stored tree IS the qparams — reuse it
            # instead of re-running calibration (a second compile + forwards).
            kw1 = dict(kw, qparams=scorer._params) if mode == "int8" else kw
            s1 = AnomalyScorer.from_variables(v["params"], v["batch_stats"],
                                              image_size=256, batch_size=1, **kw1)
            out[f"anomaly_b1_{mode}_latency"] = s1.latency_ms(n_lat)
            print(f"anomaly b1 {mode} latency: "
                  f"{out[f'anomaly_b1_{mode}_latency']}", flush=True)

    if not args.skip_seg:
        for name, nc, hw, batch in [("gear_512", 4, (512, 512), 16),
                                    ("ksdd_1024x512", 3, (1024, 512), 8)]:
            smodel = SegmentationUNet(n_classes=nc, policy=BF16_POLICY)
            h, w = hw
            sv = smodel.init(jax.random.key(0), np.zeros((1, h, w, 3), np.float32),
                             train=False)
            scalib = rng.integers(0, 256, (8, h, w, 3), dtype=np.uint8)
            for mode, kw in [("bf16", {}),
                             ("int8", {"quantize": "int8", "calib_images": scalib})]:
                pred = SegmentationPredictor.from_variables(
                    sv["params"], sv["batch_stats"], num_classes=nc,
                    image_size_hw=hw, batch_size=batch, **kw)
                out[f"seg_{name}_b{batch}_{mode}"] = round(
                    pred.throughput(n_batches), 1)
                print(f"seg {name} b{batch} {mode}: "
                      f"{out[f'seg_{name}_b{batch}_{mode}']} img/s", flush=True)
                if args.latency:
                    kw1 = dict(kw, qparams=pred._params) if mode == "int8" else kw
                    p1 = SegmentationPredictor.from_variables(
                        sv["params"], sv["batch_stats"], num_classes=nc,
                        image_size_hw=hw, batch_size=1, **kw1)
                    out[f"seg_{name}_b1_{mode}_latency"] = p1.latency_ms(n_lat)
                    print(f"seg {name} b1 {mode} latency: "
                          f"{out[f'seg_{name}_b1_{mode}_latency']}", flush=True)

    if args.attn:
        # Attention U-Net serving (models/attention.py): the gated skips add
        # three 1x1+BN layers per decoder stage; int8 runs the gate in float
        # (ops/quantize.py _gate_float) so this measures the mixed-precision
        # engine against plain bf16 at the Gear serving geometry.
        from tpu_unet.models import build_model

        amodel = build_model("attn_unet", n_classes=4, policy=BF16_POLICY)
        av = amodel.init(jax.random.key(0),
                         np.zeros((1, 512, 512, 3), np.float32), train=False)
        acalib = rng.integers(0, 256, (8, 512, 512, 3), dtype=np.uint8)
        for mode, kw in [("bf16", {}),
                         ("int8", {"quantize": "int8", "calib_images": acalib})]:
            pred = SegmentationPredictor.from_variables(
                av["params"], av["batch_stats"], num_classes=4,
                image_size_hw=(512, 512), batch_size=16,
                model_name="attn_unet", **kw)
            out[f"attn_unet_512_b16_{mode}"] = round(
                pred.throughput(n_batches), 1)
            print(f"attn_unet 512 b16 {mode}: "
                  f"{out[f'attn_unet_512_b16_{mode}']} img/s", flush=True)
            del pred

    if args.unetpp:
        # UNet++ deep-supervision serving ladder: accurate mode (heads=4) vs
        # the paper's pruned fast modes (heads k<4 = single head X[0][k]; XLA
        # DCEs the deeper columns). Measured r4 (v5e-1, b32 512² b16 bf16):
        # heads=4 111 img/s, 3: 126, 2: 184, 1: 485.
        from tpu_unet.models import build_model

        umodel = build_model("unetpp", n_classes=4, base_features=32,
                             deep_supervision=True, policy=BF16_POLICY)
        uv = umodel.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            np.zeros((1, 512, 512, 3), np.float32), train=False)
        for k in (4, 3, 2, 1):
            pred = SegmentationPredictor.from_variables(
                uv["params"], uv["batch_stats"], num_classes=4,
                image_size_hw=(512, 512), batch_size=16, base_features=32,
                model_name="unetpp", deep_supervision=True, heads=k)
            out[f"unetpp_ds_512_b16_bf16_heads{k}"] = round(
                pred.throughput(n_batches), 1)
            print(f"unetpp ds 512 b16 heads={k}: "
                  f"{out[f'unetpp_ds_512_b16_bf16_heads{k}']} img/s", flush=True)
            del pred

    out["unit"] = "images/sec (single device)"
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Attention-gate cost attribution experiment (Attention U-Net train step).

Measured question (r4): where does the attention gate's train-throughput cost
come from, and is the paper's coarse-resolution gate the right form on TPU?
Result — shipped: coarse gate 72.8 img/s vs full-resolution gate 62.1 at 512²
b8 (75.1 -> 62.5 GB/step; the step is bandwidth-bound and full-res gate
tensors are pure extra traffic); bf16 gate norms recover nothing (62.5).
models/attention.py is the coarse form since commit b47cd84.

Variants benched on the real chip with bench.py's methodology (donated-state
jitted seg train step, lower+compile, warmup, scalar-fetch forcing, XLA cost
analysis):
  - full      : the PRE-switch gate, inlined here so the recorded dead end
                stays reproducible — stride-1 1x1 projections on the
                upsampled decoder tensor, gate math at the skip's resolution,
                f32 BNs.
  - bf16norm  : the same full-resolution gate with its BNs computing in bf16
                (isolates the f32 full-res norm traffic; diagnostic only).
  - coarse    : the SHIPPED model (build_model('attn_unet') —
                arXiv:1804.03999 §3.1 as published: W_g on the pre-upsample
                decoder tensor, W_x stride-2, psi at the coarse grid, alpha
                bilinearly resized up. 1/4 the gate pixels).
  - none      : plain SegmentationUNet (the 81.9 img/s control).

The legacy variant modules live here, not in the package — the package ships
only the measured winner; this file is the reproduction harness for the
dead-end entry in docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
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


def _make_variant_model(variant: str, num_classes: int):
    """Build the attn_unet variant (or the seg_unet / shipped-model controls)."""
    from tpu_unet.core.precision import BF16_POLICY, Policy
    from tpu_unet.models import build_model

    if variant == "none":
        return build_model("seg_unet", n_classes=num_classes, policy=BF16_POLICY)
    if variant == "coarse":
        # The shipped model IS the coarse gate (models/attention.py).
        return build_model("attn_unet", n_classes=num_classes, policy=BF16_POLICY)
    if variant in ("full", "bf16norm"):
        gate_policy = (Policy(compute_dtype=jnp.bfloat16, norm_dtype=jnp.bfloat16)
                       if variant == "bf16norm" else BF16_POLICY)
        return _VariantUNet(num_classes, _full_res_gate_up(gate_policy))
    raise ValueError(variant)


def _full_res_gate_up(gate_policy):
    """The pre-switch Up block: gate at the SKIP's (full) resolution.

    Reproduces the original models/attention.py form (before commit b47cd84
    shipped the coarse gate): the gating signal is the already-upsampled
    decoder tensor, all three gate projections are stride-1 1x1s at full res,
    no alpha resize. ``gate_policy`` sets the gate BNs' compute dtype (the
    bf16norm diagnostic).
    """
    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models.attention import _GateProj
    from tpu_unet.models.blocks import DoubleConv

    class _FullGateUp(nn.Module):
        in_features: int
        features: int
        policy: object = BF16_POLICY

        @nn.compact
        def __call__(self, x1, x2, *, train):
            p = self.policy
            x1 = nn.ConvTranspose(self.in_features // 2, kernel_size=(2, 2),
                                  strides=(2, 2), padding="VALID",
                                  dtype=p.compute_dtype,
                                  param_dtype=p.param_dtype, name="up")(x1)
            gp = gate_policy
            f_int = max(1, x2.shape[-1] // 2)
            g1 = _GateProj(f_int, policy=gp, name="att_g")(x1, train=train)
            xs = _GateProj(f_int, policy=gp, name="att_x")(x2, train=train)
            a = nn.relu(g1 + xs).astype(gp.compute_dtype)
            a = nn.Conv(1, kernel_size=(1, 1), use_bias=False,
                        dtype=gp.compute_dtype, param_dtype=gp.param_dtype,
                        name="att_psi")(a)
            a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=gp.norm_dtype,
                             param_dtype=gp.param_dtype, name="att_psi_bn")(a)
            x2g = (x2 * nn.sigmoid(a)).astype(p.compute_dtype)
            x = jnp.concatenate([x2g.astype(x1.dtype), x1], axis=-1)
            return DoubleConv(self.features, policy=p, name="conv")(x, train=train)

    return _FullGateUp


class _VariantUNet(nn.Module):
    """SegmentationUNet ladder with a pluggable Up block (experiment only)."""

    num_classes: int
    up_cls: type

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tpu_unet.core.precision import BF16_POLICY
        from tpu_unet.models.blocks import OutConv
        from tpu_unet.models.unet import _Encoder

        p = BF16_POLICY
        x = p.cast_to_compute(x)
        x1, x2, x3, x4, x5 = _Encoder(policy=p, name="encoder")(x, train=train)
        x5 = nn.Dropout(rate=0.1, broadcast_dims=(1, 2),
                        deterministic=not train, name="bottleneck_dropout")(x5)
        y = self.up_cls(1024, 512, name="up1")(x5, x4, train=train)
        y = self.up_cls(512, 256, name="up2")(y, x3, train=train)
        y = self.up_cls(256, 128, name="up3")(y, x2, train=train)
        y = self.up_cls(128, 64, name="up4")(y, x1, train=train)
        return OutConv(self.num_classes, policy=p, name="outc")(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_classes", type=int, default=4)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "bf16norm", "coarse"],
                    choices=["full", "bf16norm", "coarse", "none"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
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
                      saturation=0.2, hue=0.1),
        donate_state=True)

    results = {}
    for variant in args.variants:
        model = _make_variant_model(variant, args.num_classes)
        tx = make_optimizer("adam", 1e-3, 1e-4)
        st = create_train_state(model, jax.random.key(0), (1, s, s, 3), tx)
        nparams = num_params(st)
        compiled = step.lower(st, images, labels, jax.random.key(0)).compile()
        fl, by = _cost(compiled)
        for i in range(max(1, args.warmup)):
            r = compiled(st, images, labels, jax.random.key(i))
            st = r[0]
        float(r[1]["total_loss"])
        best = 0.0
        for t in range(args.trials):
            t0 = time.perf_counter()
            vals = []
            for i in range(args.steps):
                r = compiled(st, images, labels, jax.random.key(500 + i))
                st = r[0]
                vals.append(r[1]["total_loss"])
            assert all(np.isfinite(float(v)) for v in vals)
            best = max(best, args.steps / (time.perf_counter() - t0))
        out = {"params": nparams,
               "images_per_sec_per_chip": round(args.batch * best, 2),
               "step_ms": round(1000.0 / best, 1)}
        if fl:
            out["hfu"] = round(fl * best / PEAK_FLOPS_BF16, 3)
            out["gflops_per_step"] = round(fl / 1e9, 1)
        if by:
            out["hbm_bw_fraction"] = round(by * best / PEAK_HBM_BPS, 3)
            out["gbytes_per_step"] = round(by / 1e9, 2)
        results[variant] = out
        print(f"{variant}: {out}", file=sys.stderr)
        del st, compiled

    print(json.dumps({"metric": "attn_gate_variants",
                      "image_size": s, "batch": args.batch,
                      "results": results}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: MVTec-bottle AnomalyUNet training throughput on one TPU chip.

The BASELINE.json north-star config: AnomalyUNet dual-decoder, 256px, batch 16,
Adam + combined MSE-recon/focal-seg loss, bf16 compute. Measures the full jitted
training step (device-side augmentation + fwd + loss + bwd + Adam update) on
device-resident synthetic data, so it isolates chip throughput (the input pipeline
is benchmarked separately by the data-layer tests).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": ratio}

vs_baseline compares against the reference PyTorch implementation's single-CPU
training throughput, measured once by tools/measure_reference_baseline.py into
BASELINE_MEASURED.json (the reference publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

BATCH = 16
IMAGE_SIZE = 256
WARMUP = 3
STEPS = 20

# TPU v5e (v5 litepod) public peak: 197 TFLOP/s bf16, 819 GB/s HBM BW per chip.
PEAK_FLOPS_BF16 = float(os.environ.get("TPU_UNET_PEAK_FLOPS", 197e12))
PEAK_HBM_BPS = float(os.environ.get("TPU_UNET_PEAK_HBM_BPS", 819e9))


def _cost(compiled):
    """(flops, bytes_accessed) from an XLA compiled executable, or (None, None)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        return None, None


def main():
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import AnomalyUNet
    from tpu_unet.parallel import make_mesh, replicate, shard_batch
    from tpu_unet.train import (
        AugmentConfig,
        create_train_state,
        make_anomaly_train_step,
        make_optimizer,
    )

    mesh = make_mesh()
    n_chips = int(np.prod(mesh.devices.shape))

    model = AnomalyUNet(policy=BF16_POLICY)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0),
                               (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx)
    state = replicate(mesh, state)

    step = make_anomaly_train_step(aug_cfg=AugmentConfig(), donate_state=True)  # default: per_batch_shear rotation

    rng = np.random.default_rng(0)
    batch = BATCH * n_chips
    images = shard_batch(mesh, rng.integers(0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3),
                                            dtype=np.uint8))
    masks = shard_batch(mesh, np.zeros((batch, IMAGE_SIZE, IMAGE_SIZE, 1), np.float32))

    # FLOPs/bytes accounting (XLA cost analysis of the exact compiled programs).
    # step_flops covers the FULL training step (augment+fwd+loss+bwd+Adam): the
    # basis for HFU (hardware FLOP utilization). fwd_flops is the model forward
    # alone; MFU uses the conventional 3x-forward model-FLOPs estimate.
    # The timed step is AOT-compiled ONCE and that same executable is both
    # cost-analyzed and run — no second full-step compile on a cold cache.
    step_compiled = step.lower(state, images, masks, jax.random.key(0)).compile()
    step_flops, step_bytes = _cost(step_compiled)
    step = step_compiled
    fwd = jax.jit(lambda p, s, x: state.apply_fn({"params": p, "batch_stats": s}, x,
                                                 train=False))
    x_f32 = shard_batch(mesh, np.zeros((batch, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32))
    fwd_flops, _ = _cost(fwd.lower(state.params, state.batch_stats, x_f32).compile())

    for i in range(WARMUP):
        state, losses = step(state, images, masks, jax.random.key(i))
    float(losses["total_loss"])

    # Epoch-realistic timing: losses stay on device during the loop (exactly what
    # train_anomaly_epoch does) and are ALL fetched at the end — the fetches force
    # the full chain (block_until_ready alone has been observed not to force the
    # donated-state chain under the axon runtime).
    t0 = time.perf_counter()
    acc = []
    for i in range(STEPS):
        state, losses = step(state, images, masks, jax.random.key(100 + i))
        acc.append(losses["total_loss"])
    assert all(np.isfinite(float(v)) for v in acc)
    dt = time.perf_counter() - t0

    images_per_sec = batch * STEPS / dt
    per_chip = images_per_sec / n_chips

    # Secondary: inference throughput (BN-folded eval step) at the BASELINE batch
    # (16, per-batch loss fetch — the eval-loop pattern) and serving-style
    # (batch 128, steps enqueued back-to-back, only the tiny (N,) scores fetched —
    # how a deployment would drive the chip; 3.2x the b16 number, which is
    # host-roundtrip-bound over the tunnel).
    from tpu_unet.ops.fold_bn import fold_batchnorm
    from tpu_unet.train import make_anomaly_eval_step
    folded, stats = fold_batchnorm(state.params, state.batch_stats)
    istate = state.replace(params=folded, batch_stats=stats)
    eval_step = make_anomaly_eval_step()
    out = eval_step(istate, images, masks)
    float(out["losses"]["total_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = eval_step(istate, images, masks)
        float(out["losses"]["total_loss"])
    infer_per_chip = batch * STEPS / (time.perf_counter() - t0) / n_chips

    serve_batch = 128 * n_chips
    imgs_s = shard_batch(mesh, rng.integers(0, 256, (serve_batch, IMAGE_SIZE,
                                                     IMAGE_SIZE, 3), dtype=np.uint8))
    msks_s = shard_batch(mesh, np.zeros((serve_batch, IMAGE_SIZE, IMAGE_SIZE, 1),
                                        np.float32))
    out = eval_step(istate, imgs_s, msks_s)
    float(out["losses"]["total_loss"])
    t0 = time.perf_counter()
    scores = []
    for _ in range(STEPS):
        out = eval_step(istate, imgs_s, msks_s)
        scores.append(out["score"])
    s = np.concatenate([np.asarray(x) for x in scores])
    assert np.isfinite(s).all()
    serve_per_chip = serve_batch * STEPS / (time.perf_counter() - t0) / n_chips

    # Serving path (tpu_unet/serve.py): score-only program (seg decoder DCE'd)
    # in bf16 and int8-quantized. Single-chip jit (serving is per-chip replicas).
    from tpu_unet.serve import AnomalyScorer
    serve_bf16 = AnomalyScorer.from_variables(
        state.params, state.batch_stats, image_size=IMAGE_SIZE,
        batch_size=128).throughput(STEPS)
    calib = rng.integers(0, 256, (32, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8)
    serve_int8 = AnomalyScorer.from_variables(
        state.params, state.batch_stats, image_size=IMAGE_SIZE,
        batch_size=128, quantize="int8", calib_images=calib).throughput(STEPS)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = ref.get("train_images_per_sec_cpu")
        if ref_ips:
            vs_baseline = per_chip / ref_ips

    # Also measure the strict reference-semantics augmentation (per-sample rotation).
    state2 = create_train_state(model, jax.random.key(1),
                                (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx)
    state2 = replicate(mesh, state2)
    step_ps = make_anomaly_train_step(
        aug_cfg=AugmentConfig(rotation_mode="per_sample"), donate_state=True)
    for i in range(WARMUP):
        state2, losses2 = step_ps(state2, images, masks, jax.random.key(i))
    float(losses2["total_loss"])
    t0 = time.perf_counter()
    acc2 = []
    for i in range(STEPS):
        state2, losses2 = step_ps(state2, images, masks, jax.random.key(300 + i))
        acc2.append(losses2["total_loss"])
    assert all(np.isfinite(float(v)) for v in acc2)
    per_sample_per_chip = batch * STEPS / (time.perf_counter() - t0) / n_chips

    steps_per_sec = per_chip / BATCH
    mfu = hfu = hbm_frac = None
    if fwd_flops:
        mfu = 3.0 * fwd_flops * steps_per_sec / (PEAK_FLOPS_BF16 * n_chips)
    if step_flops:
        hfu = step_flops * steps_per_sec / (PEAK_FLOPS_BF16 * n_chips)
    if step_bytes:
        hbm_frac = step_bytes * steps_per_sec / (PEAK_HBM_BPS * n_chips)

    print(json.dumps({
        "metric": "mvtec_bottle_anomaly_unet_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        "infer_images_per_sec_per_chip": round(infer_per_chip, 2),
        "infer_serving_b128_images_per_sec_per_chip": round(serve_per_chip, 2),
        # tpu_unet/serve.py: score-only program (seg decoder DCE'd) + int8 PTQ
        "serve_score_only_b128_images_per_sec_per_chip": round(serve_bf16, 2),
        "serve_int8_b128_images_per_sec_per_chip": round(serve_int8, 2),
        "train_per_sample_rotation_images_per_sec_per_chip": round(per_sample_per_chip, 2),
        "batch": BATCH,
        "image_size": IMAGE_SIZE,
        # Roofline accounting (XLA cost analysis; peaks: v5e 197 TFLOP/s bf16,
        # 819 GB/s HBM). MFU = 3*fwd model FLOPs; HFU = full-step FLOPs.
        "mfu": round(mfu, 3) if mfu is not None else None,
        "hfu": round(hfu, 3) if hfu is not None else None,
        "hbm_bw_fraction": round(hbm_frac, 3) if hbm_frac is not None else None,
        "step_flops": step_flops,
        "fwd_flops": fwd_flops,
        "step_hbm_bytes": step_bytes,
        "peak_flops_bf16": PEAK_FLOPS_BF16,
    }))


if __name__ == "__main__":
    main()

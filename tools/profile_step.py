#!/usr/bin/env python3
"""Per-op device-time breakdown of the AnomalyUNet training step.

Runs N jitted train steps under jax.profiler.trace and parses the emitted Chrome
trace for TPU-device op durations — the "where does the step time go" view the
reference never had (its only timing is wall-clock epochs, /root/reference/src/
train.py:229). Works over the axon tunnel (verified: device events are recorded
at XLA-fusion granularity).

Usage: python tools/profile_step.py [--steps 10] [--top 25] [--eval] [--keep]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_profile(trace_dir: str, steps: int, batch: int, size: int,
                    eval_mode: bool, serve_mode: str = "",
                    task: str = "anomaly", n_classes: int = 3,
                    height: int = 0, seg_model: str = "seg_unet") -> None:
    import jax
    import numpy as np

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import AnomalyUNet, build_model
    from tpu_unet.train import (AugmentConfig, SegLossConfig, create_train_state,
                                make_anomaly_eval_step, make_anomaly_train_step,
                                make_optimizer, make_seg_train_step)

    if task == "seg":
        # Seg train step at an HxW shape (default KolektorSDD 1024x512 b8).
        # --model attn_unet profiles the gated architecture on the same
        # harness (the per-op attn-gate attribution, VERDICT r4 #7).
        h, w = (height or size), size
        model = build_model(seg_model, n_classes=n_classes, policy=BF16_POLICY)
        tx = make_optimizer("adam", 1e-3, 1e-4)
        state = create_train_state(model, jax.random.key(0), (1, h, w, 3), tx)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
        labels = rng.integers(0, n_classes, (batch, h, w)).astype(np.int32)
        cw = (1.0, 50.0, 50.0) if n_classes == 3 else None
        step = make_seg_train_step(n_classes, SegLossConfig(class_weights=cw),
                                   AugmentConfig(degrees=5.0), donate_state=True)
        r = None
        for i in range(3):
            r = step(state, images, labels, jax.random.key(i))
            state = r[0]
        float(r[1]["total_loss"])  # warm compile + force chain
        with jax.profiler.trace(trace_dir):
            for i in range(steps):
                r = step(state, images, labels, jax.random.key(100 + i))
                state = r[0]
            float(r[1]["total_loss"])
        return

    model = AnomalyUNet(policy=BF16_POLICY)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0), (1, size, size, 3), tx)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    masks = np.zeros((batch, size, size, 1), np.float32)

    if serve_mode:
        # Score-only serving forward (tpu_unet/serve.py), bf16 or int8.
        from tpu_unet.serve import AnomalyScorer
        calib = (rng.integers(0, 256, (16, size, size, 3), dtype=np.uint8)
                 if serve_mode == "int8" else None)
        scorer = AnomalyScorer.from_variables(
            state.params, state.batch_stats, image_size=size, batch_size=batch,
            quantize=None if serve_mode == "bf16" else serve_mode,
            calib_images=calib)
        dev_imgs = scorer._put(images)
        np.asarray(scorer._score_fn(scorer._params, dev_imgs))  # warm compile
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                out = scorer._score_fn(scorer._params, dev_imgs)
            np.asarray(out)
    elif eval_mode:
        step = make_anomaly_eval_step()
        out = step(state, images, masks)
        float(out["losses"]["total_loss"])  # warm compile
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                out = step(state, images, masks)
                float(out["losses"]["total_loss"])
    else:
        step = make_anomaly_train_step(aug_cfg=AugmentConfig(), donate_state=True)
        for i in range(3):
            state, losses = step(state, images, masks, jax.random.key(i))
        float(losses["total_loss"])  # warm compile + force chain
        with jax.profiler.trace(trace_dir):
            for i in range(steps):
                state, losses = step(state, images, masks, jax.random.key(100 + i))
            float(losses["total_loss"])


def summarize(trace_dir: str, top: int) -> dict:
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no trace written under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    # Device rows are nested (Steps ⊃ XLA Modules ⊃ XLA Ops); only the leaf
    # "XLA Ops" thread gives a non-double-counted per-op breakdown.
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in device_pids
               and e.get("args", {}).get("name") == "XLA Ops"}
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            dur[e.get("name", "?")] += e.get("dur", 0.0)
    total = sum(dur.values())
    rows = dur.most_common(top)
    print(f"\nTPU device time: {total/1e3:.2f} ms total across "
          f"{sum(1 for _ in dur)} distinct ops")
    print(f"{'us':>12} {'%':>6}  op")
    for name, us in rows:
        print(f"{us:12.1f} {100.0*us/max(total,1e-9):6.2f}  {name[:100]}")
    return {"total_us": total,
            "ops": [{"name": n, "us": u, "pct": 100.0 * u / max(total, 1e-9)}
                    for n, u in rows]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--eval", action="store_true", help="profile the eval step")
    p.add_argument("--serve", choices=["bf16", "int8"], default="",
                   help="profile the score-only serving forward instead "
                        "(use with --batch 128 for the serving regime)")
    p.add_argument("--trace_dir", default=None,
                   help="keep the raw trace here (default: temp dir, deleted)")
    p.add_argument("--json_out", default=None, help="write the summary as JSON")
    p.add_argument("--task", choices=["anomaly", "seg"], default="anomaly",
                   help="seg profiles the SegmentationUNet train step "
                        "(use --height for non-square, e.g. KSDD "
                        "--task seg --height 1024 --image_size 512 --batch 8)")
    p.add_argument("--n_classes", type=int, default=3)
    p.add_argument("--height", type=int, default=0,
                   help="image height when it differs from --image_size (seg)")
    p.add_argument("--model", default="seg_unet",
                   help="seg-task model (seg_unet | attn_unet | unetpp)")
    args = p.parse_args(argv)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="tpu_unet_prof_")
    try:
        run_and_profile(trace_dir, args.steps, args.batch, args.image_size,
                        args.eval, serve_mode=args.serve, task=args.task,
                        n_classes=args.n_classes, height=args.height,
                        seg_model=args.model)
        summary = summarize(trace_dir, args.top)
        summary["steps"] = args.steps
        summary["per_step_ms"] = summary["total_us"] / 1e3 / max(args.steps, 1)
        print(f"\nper-step device time: {summary['per_step_ms']:.2f} ms")
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(summary, f, indent=1)
    finally:
        if args.trace_dir is None:
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

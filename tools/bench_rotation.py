#!/usr/bin/env python3
"""Rotation-mode A/B microbench: isolate the paired-augment op cost per mode.

Whole-step A/Bs (bench.py's train_* keys) see the rotation through ~70 ms of
conv work; this tool times JUST the paired geometric augment (image bilinear +
mask nearest), looped IN-PROGRAM via lax.fori_loop — single-op microbenches
over the axon tunnel are dispatch-bound, so the op must be repeated inside one
XLA program (see docs/ARCHITECTURE.md "Measured dead ends").

Prints per-mode: ms per augment call, effective GB/s over the logical
image+mask bytes, and the XLA cost analysis (flops / HBM bytes) of one program.

Usage: python tools/bench_rotation.py [--batch 16] [--height 256] [--width 256]
           [--degrees 10] [--reps 50] [--modes per_batch_shear,per_sample_shear,per_sample]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(mode: str, reps: int, degrees: float):
    from tpu_unet.ops.augment import paired_geometric_augment

    def body(i, carry):
        img, msk, key = carry
        k = jax.random.fold_in(key, i)
        img2, msk2 = paired_geometric_augment(img, msk, k, degrees=degrees,
                                              rotation_mode=mode)
        # Feed outputs back in so the loop can't be collapsed; dtypes/shapes
        # are preserved by the augment (mask stays integral under order=0).
        return img2, msk2, key

    @jax.jit
    def run(img, msk, key):
        img, msk, _ = jax.lax.fori_loop(0, reps, body, (img, msk, key))
        return img.sum() + msk.astype(jnp.float32).sum()

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--degrees", type=float, default=10.0)
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--modes", type=str,
                   default="per_batch_shear,per_sample_shear,per_sample")
    args = p.parse_args()

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((args.batch, args.height, args.width, 3),
                                 np.float32))
    msk = jnp.asarray((rng.random((args.batch, args.height, args.width, 1))
                       > 0.9).astype(np.float32))
    logical_bytes = img.size * 4 + msk.size * 4
    key = jax.random.key(0)

    print(f"batch {args.batch} @ {args.height}x{args.width}, degrees "
          f"{args.degrees}, {args.reps} in-program reps on "
          f"{jax.devices()[0].platform}")
    for mode in args.modes.split(","):
        run = build(mode, args.reps, args.degrees)
        compiled = run.lower(img, msk, key).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = (cost or {}).get("flops")
        bts = (cost or {}).get("bytes accessed")
        float(compiled(img, msk, key))  # warm + force
        t0 = time.perf_counter()
        float(compiled(img, msk, key))
        dt = time.perf_counter() - t0
        ms = dt / args.reps * 1e3
        gbps = logical_bytes / (dt / args.reps) / 1e9
        extra = ""
        if flops and bts:
            extra = (f"  [program: {flops / 1e9:.1f} GFLOP, "
                     f"{bts / 1e9:.2f} GB -> {bts / args.reps / 1e9:.3f} GB/rep]")
        print(f"  {mode:>18}: {ms:7.3f} ms/call  "
              f"({gbps:6.1f} GB/s over logical img+mask bytes){extra}")


if __name__ == "__main__":
    main()

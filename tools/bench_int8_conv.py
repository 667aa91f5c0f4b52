#!/usr/bin/env python3
"""Go/no-go benchmark for the fused int8 Pallas conv (VERDICT r2 next-step #2).

Compares, per AnomalyUNet serving layer shape (256px, batch 128), the chained
cost of:
  A) XLA unfused: int8 conv -> int32 HBM -> separate requant clamp_convert pass
     (ops/quantize.py::_QuantExec path — the measured ~85%-requant cost structure)
  B) Pallas fused: ops/pallas/int8_conv.py::conv3x3_int8_fused (int32 acc stays
     in VMEM; int8 written directly)

Method: K iterations chained IN-PROGRAM (carry = conv(carry)) so the timing is
not dispatch-bound over the axon tunnel; completion forced by fetching a small
slice. Cin==Cout layers only (they chain; the expansion convs share the same
cost structure). Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.ops.pallas.int8_conv import (conv3x3_int8_fused,
                                           conv3x3_int8_reference)

# (H, W, C): AnomalyUNet chain-able serving layers at 256px.
SHAPES = [
    (256, 256, 64),
    (128, 128, 128),
    (64, 64, 256),
    (32, 32, 512),
    (16, 16, 1024),
]


def bench_shape(h, w, c, batch, iters, reps=3):
    rng = np.random.default_rng(0)
    # Generate the activation tensor ON DEVICE (a b128 256x256x64 int8 batch is
    # 512 MB — uploading that through the axon tunnel takes minutes).
    x = jax.jit(lambda k: jax.random.randint(
        k, (batch, h, w, c), -127, 128, jnp.int8))(jax.random.key(0))
    x.block_until_ready()
    wk = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)).astype(np.int8))
    scale = jnp.asarray(rng.random(c).astype(np.float32) * 1e-4 + 1e-5)
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    s_out = jnp.float32(0.05)

    @jax.jit
    def run_xla(x0):
        def body(_, carry):
            return conv3x3_int8_reference(carry, wk, scale, bias, s_out)
        return jax.lax.fori_loop(0, iters, body, x0)

    @jax.jit
    def run_pallas(x0):
        def body(_, carry):
            return conv3x3_int8_fused(carry, wk, scale, bias, s_out)
        return jax.lax.fori_loop(0, iters, body, x0)

    # Diagnostics: int8 conv WITHOUT the requant pass (int32 chain broken by a
    # cheap shift-to-int8 so the loop still chains), and the bf16 conv.
    dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def run_conv_only(x0):
        def body(_, carry):
            acc = jax.lax.conv_general_dilated(
                carry, wk, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jax.lax.shift_right_arithmetic(acc, 13).astype(jnp.int8)
        return jax.lax.fori_loop(0, iters, body, x0)

    wk_bf = wk.astype(jnp.bfloat16)

    @jax.jit
    def run_bf16(x0):
        def body(_, carry):
            return jax.lax.conv_general_dilated(
                carry, wk_bf, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, x0.astype(jnp.bfloat16))

    out = {}
    for name, fn in (("xla", run_xla), ("pallas", run_pallas),
                     ("conv_only", run_conv_only), ("bf16", run_bf16)):
        try:
            y = fn(x)
            np.asarray(y[0, 0, 0, :8])  # force
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                y = fn(x)
                np.asarray(y[0, 0, 0, :8])
                best = min(best, time.perf_counter() - t0)
            out[name] = best / iters * 1e3  # ms per conv
        except Exception as e:  # noqa: BLE001 — report per-shape failures
            out[name] = None
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
    if out.get("xla") and out.get("pallas"):
        out["speedup"] = round(out["xla"] / out["pallas"], 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true",
                    help="also verify bit-exactness on-chip per shape")
    ap.add_argument("--shapes", type=str, default=None,
                    help="comma list like 64x64x256 to restrict")
    args = ap.parse_args()

    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]

    for (h, w, c) in shapes:
        if args.check:
            rng = np.random.default_rng(1)
            xb = jnp.asarray(rng.integers(-127, 128, (2, h, w, c)).astype(np.int8))
            wk = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)).astype(np.int8))
            sc = jnp.asarray(rng.random(c).astype(np.float32) * 1e-4 + 1e-5)
            bi = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
            so = jnp.float32(0.05)
            got = np.asarray(conv3x3_int8_fused(xb, wk, sc, bi, so))
            ref = np.asarray(conv3x3_int8_reference(xb, wk, sc, bi, so))
            mism = int((got != ref).sum())
            print(json.dumps({"shape": f"{h}x{w}x{c}", "check_mismatches": mism,
                              "check_total": int(got.size)}))
            if mism:
                continue
        r = bench_shape(h, w, c, args.batch, args.iters)
        r["shape"] = f"{h}x{w}x{c}"
        r["batch"] = args.batch
        print(json.dumps(r))


if __name__ == "__main__":
    main()

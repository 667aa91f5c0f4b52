"""Pallas TPU kernel: fused uint8 decode-normalize for the input path.

The first device-side op of every step converts the host-shipped uint8 NHWC batch
to normalized float: ``(x/255 - mean)/std``. Algebraically that is one fused
multiply-add ``x * scale + bias`` with per-channel constants — a purely
bandwidth-bound op. This kernel performs it in one HBM read + one HBM write with
the row-block resident in VMEM, emitting the compute dtype (bf16) directly so the
f32 intermediate never touches HBM.

**Status: validated but intentionally NOT on the production path.** Measured on
v5e (r2, 2026-08-16, device-resident 16x256x256x3 batch, 20-op jitted chains):
XLA's fusion of ``to_float + normalize`` costs 1.318 ms vs 1.315 ms for this
kernel — XLA already emits the same single-pass fused multiply-add, so wiring the
kernel in buys nothing. It is kept as the repo's tested Pallas exemplar (the
Mosaic gotchas in CLAUDE.md were learned here) and as the template for any future
op XLA does NOT fuse well.

A jnp reference path (`normalize_u8_reference`) provides the numeric oracle and the
fallback for non-TPU backends; `normalize_u8` dispatches between them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.ops.augment import IMAGENET_MEAN, IMAGENET_STD


def _scale_bias(mean: Tuple[float, ...], std: Tuple[float, ...]):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = 1.0 / (255.0 * std)
    bias = -mean / std
    return scale, bias


def normalize_u8_reference(images_u8: jnp.ndarray,
                           mean: Tuple[float, ...] = IMAGENET_MEAN,
                           std: Tuple[float, ...] = IMAGENET_STD,
                           out_dtype=jnp.float32) -> jnp.ndarray:
    scale, bias = _scale_bias(mean, std)
    x = images_u8.astype(jnp.float32)
    return (x * jnp.asarray(scale) + jnp.asarray(bias)).astype(out_dtype)


def _normalize_kernel(img_ref, scale_ref, bias_ref, out_ref):
    # Mosaic has no direct u8->f32 cast; hop through int32.
    x = img_ref[:].astype(jnp.int32).astype(jnp.float32)
    # scale/bias arrive as (1, 1, W*C) VMEM inputs (Pallas kernels may not capture
    # array constants), pre-tiled so the lane axis is W*C (multiples of 128) —
    # keeping C=3 in the lane dimension would pad 3 -> 128 and blow VMEM 42x.
    out_ref[:] = (x * scale_ref[0, 0, :] + bias_ref[0, 0, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mean", "std", "out_dtype"))
def normalize_u8_pallas(images_u8: jnp.ndarray,
                        mean: Tuple[float, ...] = IMAGENET_MEAN,
                        std: Tuple[float, ...] = IMAGENET_STD,
                        out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused uint8 -> normalized float NHWC, one pass through HBM."""
    from jax.experimental import pallas as pl

    n, h, w, c = images_u8.shape
    scale_np, bias_np = _scale_bias(mean, std)
    # Flatten (W, C) into the lane axis and tile the per-channel constants across W
    # so the minor dimension is a multiple of 128 instead of C=3.
    wc = w * c
    x = images_u8.reshape(n, h, wc)
    scale = jnp.asarray(np.tile(scale_np, w)).reshape(1, 1, wc)
    bias = jnp.asarray(np.tile(bias_np, w)).reshape(1, 1, wc)

    # ~0.5 MB of f32 tile per buffer.
    rows_per_block = max(1, min(h, 128 * 1024 // max(wc, 1) * 8))
    grid = (n, pl.cdiv(h, rows_per_block))

    out = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wc), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows_per_block, wc), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, wc), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 1, wc), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_per_block, wc), lambda i, j: (i, j, 0)),
    )(x, scale, bias)
    return out.reshape(n, h, w, c)


def normalize_u8(images_u8: jnp.ndarray,
                 mean: Tuple[float, ...] = IMAGENET_MEAN,
                 std: Tuple[float, ...] = IMAGENET_STD,
                 out_dtype=jnp.float32) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return normalize_u8_pallas(images_u8, mean, std, out_dtype=out_dtype)
    return normalize_u8_reference(images_u8, mean, std, out_dtype=out_dtype)

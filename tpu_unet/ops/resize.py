"""Bilinear resize with align_corners=True semantics, NHWC.

The reference uses ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
in its bilinear decoder path (/root/reference/src/model.py:48). ``jax.image.resize``
implements half-pixel-centers sampling only, so we implement align-corners sampling
directly. The op decomposes into two one-dimensional gathers + lerps, which XLA fuses
into a single bandwidth-bound pass — there is no matmul here, so no MXU concern.
"""

from __future__ import annotations

import jax.numpy as jnp


def _align_corners_coords(in_size: int, out_size: int):
    """Source (fractional) coordinates for each output index, align_corners=True."""
    if out_size == 1 or in_size == 1:
        return jnp.zeros((out_size,), dtype=jnp.float32)
    scale = (in_size - 1) / (out_size - 1)
    return jnp.arange(out_size, dtype=jnp.float32) * scale


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    coords = _align_corners_coords(in_size, out_size)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo.astype(jnp.float32)).astype(x.dtype)
    # Broadcast the 1-D weight along the interpolation axis.
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    return x_lo * (1 - w) + x_hi * w


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize an NHWC tensor to (out_h, out_w) with align_corners=True bilinear."""
    x = _interp_axis(x, out_h, axis=1)
    x = _interp_axis(x, out_w, axis=2)
    return x


def upsample2x_bilinear_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x spatial upsampling (NHWC), matching torch Upsample(align_corners=True)."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)

"""Bilinear resize with align_corners=True semantics, NHWC — as MATMULS.

The reference uses ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
in its bilinear decoder path (/root/reference/src/model.py:48). ``jax.image.resize``
implements half-pixel-centers sampling only, so we implement align-corners sampling
directly.

TPU-first formulation (r5): each 1-D interpolation is a small DENSE matmul with a
precomputed (out_size, in_size) weight matrix holding the two lerp coefficients per
output row. The first implementation used two ``jnp.take`` gathers + a lerp — fine
forward (XLA fuses it), but the gather's BACKWARD is a scatter-add, and the r5
per-op attribution of the Attention U-Net train step showed those
``transpose(jvp)/.../att/jit(_take)`` scatters contaminating multi-ms backward
fusions (docs/ARCHITECTURE.md, attention-gate cost attribution). A matmul's
backward is just the transposed matmul: MXU work, no scatter, and the interp
matrix is a trace-time constant (numpy) so XLA constant-folds and reuses it.
Numerics: the two nonzero weights per row are the same lerp coefficients; the MXU
accumulates in f32, so the result is at least as accurate as the fused lerp
(torch-parity pinned in tests/test_augment.py::TestResize).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners lerp weights; <=2 nonzeros per row.

    Built in float64 numpy at trace time (shapes are static), cast at use.
    """
    m = np.zeros((out_size, in_size), np.float64)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = coords - lo
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - w
    m[rows, hi] += w
    return m


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x  # the interp matrix would be the identity
    m = jnp.asarray(_interp_matrix(in_size, out_size).astype(np.float32),
                    dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = x @ m.T
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize an NHWC tensor to (out_h, out_w) with align_corners=True bilinear."""
    x = _interp_axis(x, out_h, axis=1)
    x = _interp_axis(x, out_w, axis=2)
    return x


def upsample2x_bilinear_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x spatial upsampling (NHWC), matching torch Upsample(align_corners=True)."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)

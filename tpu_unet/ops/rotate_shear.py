"""Rotation as three shear matmuls — the MXU-native alternative to gathers.

Per-element gathers are the TPU's weak spot: the 4-corner bilinear gather of a
(16,256,256,3) batch costs ~20 ms of device time (~2.4 GB/s effective), while the
MXU sits idle. The classic 3-shear decomposition

    R(theta) = Shear_x(-tan(theta/2)) . Shear_y(sin(theta)) . Shear_x(-tan(theta/2))

turns rotation into axis-aligned resampling, and a 1-D subpixel shear of row y is a
banded matrix multiply: out[y] = M_y @ in[y] where M_y has two diagonals (1-f, f) at
offset floor(shift_y). With ONE angle shared by the whole batch the three banded
operator stacks are (H, W', W')-shaped, built once per step by elementwise iota
comparisons, and each shear is a batched matmul — pure MXU work, ~5 GFLOP per
batch at 256px (sub-millisecond) instead of 20 ms of gathers.

Trade-off (documented; selected via AugmentConfig.rotation_mode): the shared angle
correlates the rotation within a batch. The marginal per-image angle distribution
across training steps is unchanged (uniform in [-degrees, degrees]), so the
augmentation strength is practically equivalent to the reference's per-sample
torchvision RandomRotation. **'per_batch_shear' is the framework default** (41%
faster training); pass ``--rotation_mode per_sample`` for the reference-parity
mode (gather-based, independent per-image angles). See README "Deviations".

Boundary semantics: zero fill, like the gather path; the shear composition smears
the zero border slightly differently than direct sampling (interior agrees to
bilinear-interpolation tolerance; tested in tests/test_rotate_shear.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _shear_operator(shifts: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, size, size) banded lerp matrices: out[h, o] = in[h, o + shifts[h]]."""
    lo = jnp.floor(shifts)
    frac = (shifts - lo)[:, None, None].astype(jnp.float32)
    lo = lo.astype(jnp.int32)[:, None, None]
    o = jnp.arange(size, dtype=jnp.int32)[None, :, None]
    i = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    d = i - o - lo
    return jnp.where(d == 0, 1.0 - frac, jnp.where(d == 1, frac, 0.0))


def rotate_batch_shear(images: jnp.ndarray, angle_deg: jnp.ndarray,
                       max_degrees: float, order: int = 1) -> jnp.ndarray:
    """Rotate an NHWC batch CCW by ONE shared angle via three shear matmuls.

    angle_deg: scalar (traced ok). max_degrees: static bound used to size the
    zero padding; callers pass the augmentation's degree limit. order=1 lerps each
    shear (bilinear-like); order=0 rounds each shear to integer shifts (mask-safe:
    values are permuted, never blended).
    """
    n, h, w, c = images.shape
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)

    tmax = math.tan(math.radians(max_degrees) / 2.0)
    smax = math.sin(math.radians(max_degrees))
    pad_x = int(math.ceil(tmax * (h / 2.0))) + 2
    pad_y = int(math.ceil(smax * (w / 2.0 + pad_x))) + 2

    x = images
    # Shear 1: horizontal.
    x = _pad_shear_crop_x(x, a, pad_x, order)
    # Shear 2: vertical == transpose, horizontal shear, transpose back.
    x = jnp.swapaxes(x, 1, 2)
    x = _pad_shear_crop_x(x, b, pad_y, order)
    x = jnp.swapaxes(x, 1, 2)
    # Shear 3: horizontal.
    x = _pad_shear_crop_x(x, a, pad_x, order)
    return x.astype(images.dtype)


def _pad_shear_crop_x(x: jnp.ndarray, shear: jnp.ndarray, pad: int,
                      order: int = 1) -> jnp.ndarray:
    n, h, w, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (pad, pad), (0, 0)))
    cy = (h - 1) / 2.0
    shifts = shear * (jnp.arange(h, dtype=jnp.float32) - cy)
    if order == 0:
        shifts = jnp.round(shifts)  # integer shifts: pure permutation, mask-safe
    m = _shear_operator(shifts, w + 2 * pad)
    out = jnp.einsum("hoi,nhic->nhoc", m, xp, preferred_element_type=jnp.float32)
    return out[:, :, pad:pad + w, :]

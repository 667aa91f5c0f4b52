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
faster training); ``--rotation_mode per_sample_shear`` keeps INDEPENDENT
per-image angles gather-free (K-tap banded shears, below); ``per_sample`` is the
reference-numerics mode (gather-based). See README "Deviations".

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
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    return _rotate_3shear_planes(images, -jnp.tan(theta / 2.0), jnp.sin(theta),
                                 max_degrees, order, _pad_shear_crop_x)


def _rotate_3shear_planes(images: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                          max_degrees: float, order: int, shear_rows) -> jnp.ndarray:
    """Shared 3-shear scaffolding: pad sizing + the plane/transpose sandwich.

    Runs on full-lane (N*C, H, W) planes: with NHWC operands each shear would
    put C=3 in the contraction's free/minor position (3 of 128 MXU columns /
    vector lanes); folding C into the batch axis keeps every pass full-lane.
    ``shear_rows(x, shear, pad, order)`` supplies the per-row shear primitive
    (shared banded operator or per-plane K-tap bands); ``a``/``b`` are the
    x-/y-shear coefficients (scalar, or per-plane (N*C,)).
    """
    n, h, w, c = images.shape
    tmax = math.tan(math.radians(max_degrees) / 2.0)
    smax = math.sin(math.radians(max_degrees))
    pad_x = int(math.ceil(tmax * (h / 2.0))) + 2
    pad_y = int(math.ceil(smax * (w / 2.0 + pad_x))) + 2

    x = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2)).reshape(n * c, h, w)
    # Shear 1: horizontal.
    x = shear_rows(x, a, pad_x, order)
    # Shear 2: vertical == transpose, horizontal shear, transpose back.
    x = jnp.swapaxes(x, 1, 2)
    x = shear_rows(x, b, pad_y, order)
    x = jnp.swapaxes(x, 1, 2)
    # Shear 3: horizontal.
    x = shear_rows(x, a, pad_x, order)
    out = jnp.transpose(x.reshape(n, c, h, w), (0, 2, 3, 1))
    return out.astype(images.dtype)


def _pad_shear_crop_x(x: jnp.ndarray, shear: jnp.ndarray, pad: int,
                      order: int = 1) -> jnp.ndarray:
    bsz, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    cy = (h - 1) / 2.0
    shifts = shear * (jnp.arange(h, dtype=jnp.float32) - cy)
    if order == 0:
        shifts = jnp.round(shifts)  # integer shifts: pure permutation, mask-safe
    m = _shear_operator(shifts, w + 2 * pad)
    out = jnp.einsum("hoi,bhi->bho", m, xp, preferred_element_type=jnp.float32)
    return out[:, :, pad:pad + w]


# ---------------------------------------------------------------------------
# Per-sample angles, still gather-free
# ---------------------------------------------------------------------------
#
# With INDEPENDENT per-sample angles the shared (H, W', W') banded operator
# would become (N, H, W', W') — gigabytes. But each output row still only
# mixes two adjacent taps inside a statically-bounded band of K = 2*pad+1
# shifts, so each shear is a K-tap contraction over statically-shifted SLICES
# of the padded input: out[n,h,o] = sum_k wgt[n,h,k] * xp[n,h,o+k], with
# wgt 2-sparse per (n,h) (the lerp pair at k = lo+pad). Dense-but-sparse is
# the TPU trade: ~K*NHWC of streaming traffic on the VPU/MXU instead of the
# 4-corner gather's pointer chasing (measured ~20 ms device time at b16@256 —
# see ops/augment.py::rotate_batch).

_PATCH_CHUNK_BYTES = 256 * 1024 * 1024  # cap materialized patch stacks
# Minimum rows per static tap band (sublane-aligned). Effective block size is
# max(this, ~h/8): a CPU cost-analysis sweep at b16@256 put the knee at 32
# (9.03 GB single-block -> 6.11 GB; 16 ties at 6.07 but block 8 REGRESSES to
# 6.63 GB and compiles 10x slower), and capping at ~8 blocks per pass bounds
# HLO size at KSDD heights.
_SHEAR_ROW_BLOCK = 32


def rotate_batch_shear_per_sample(images: jnp.ndarray, angles_deg: jnp.ndarray,
                                  max_degrees: float, order: int = 1) -> jnp.ndarray:
    """Rotate an NHWC batch CCW with INDEPENDENT per-sample angles, gather-free.

    Same three-shear decomposition (and therefore the same boundary-smearing
    numerics) as :func:`rotate_batch_shear`, but every sample gets its own
    angle — the reference's torchvision RandomRotation distribution
    (/root/reference/src/dataset.py:137-141) without the TPU gather penalty of
    ops/augment.py::rotate_batch. angles_deg: (N,); max_degrees: static bound
    sizing the pad/taps.

    """
    c = images.shape[3]
    theta = jnp.deg2rad(angles_deg.astype(jnp.float32))  # (N,)
    # Shear coefficients replicated per channel-plane: (N,) -> (N*C,) matching
    # the scaffolding's (N, C, H, W) -> (N*C, H, W) reshape order.
    a = jnp.repeat(-jnp.tan(theta / 2.0), c)
    b = jnp.repeat(jnp.sin(theta), c)
    return _rotate_3shear_planes(images, a, b, max_degrees, order,
                                 _shear_rows_per_sample)


def _shear_rows_per_sample(x: jnp.ndarray, shear: jnp.ndarray, pad: int,
                           order: int = 1) -> jnp.ndarray:
    """Shear (B, H, W) plane rows along W by per-(plane, row) subpixel shifts.

    K-tap banded contraction: out[b,h,o] = sum_k wgt[b,h,k] * xp[b,h,o+k] with
    wgt 2-sparse per (b,h) — the lerp pair at k = floor(shift)+pad.

    Row-blocked band narrowing (exact): |shift(row)| <= max|shear| * |row - cy|,
    a STATIC per-row bound, so rows near the shear center can only ever touch a
    narrow tap band — taps outside it have weight 0 for every angle within
    max_degrees. Looping over contiguous row blocks with per-block static bands
    skips those statically-zero taps: the streamed patch traffic drops from
    K*H*W to ~(K/2)*H*W (triangle integral), bit-identical output.
    """
    bsz, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    cy = (h - 1) / 2.0
    shifts = shear[:, None] * (jnp.arange(h, dtype=jnp.float32) - cy)  # (B, H)
    if order == 0:
        shifts = jnp.round(shifts)  # integer shifts: pure permutation, mask-safe
    lo = jnp.floor(shifts).astype(jnp.int32)
    frac = (shifts - lo).astype(jnp.float32)[:, :, None]  # (B, H, 1)

    k_total = 2 * pad + 1  # |shifts| <= pad-2, so lo+pad and lo+pad+1 fit
    kidx = jnp.arange(k_total, dtype=jnp.int32)[None, None, :]
    kk = lo[:, :, None] + pad
    wgt = jnp.where(kidx == kk, 1.0 - frac,
                    jnp.where(kidx == kk + 1, frac, 0.0))  # (B, H, K)

    # The pads are sized as ceil(max|shear| * extent) + 2 with extent >= cy, so
    # this recovered bound dominates the true max|shear| in every pass.
    shear_max = (pad - 2) / max(cy, 1.0)

    blk = max(_SHEAR_ROW_BLOCK, ((h + 7) // 8 + 7) // 8 * 8)  # <= ~8 blocks
    out_blocks = []
    for r0 in range(0, h, blk):
        r1 = min(r0 + blk, h)
        bound = shear_max * max(abs(r0 - cy), abs(r1 - 1 - cy))
        # floor(+-bound)+1 covers both the lerp pair and order-0 rounding.
        k_lo = max(pad - (int(math.floor(bound)) + 1), 0)
        k_hi = min(pad + int(math.floor(bound)) + 1, k_total - 1)
        out_blocks.append(_banded_contract(
            xp[:, r0:r1], wgt[:, r0:r1], k_lo, k_hi, w))
    return jnp.concatenate(out_blocks, axis=1)


def _banded_contract(xp: jnp.ndarray, wgt: jnp.ndarray, k_lo: int, k_hi: int,
                     w: int) -> jnp.ndarray:
    """sum_k wgt[b,h,k] * xp[b,h,k:k+w] over taps k in [k_lo, k_hi], chunked so
    the materialized patch stack stays bounded (K * B*H*W f32 reaches GBs at
    KSDD shapes)."""
    bsz, rows = xp.shape[0], xp.shape[1]
    chunk = max(1, min(k_hi - k_lo + 1,
                       _PATCH_CHUNK_BYTES // (bsz * rows * w * 4)))
    out = jnp.zeros((bsz, rows, w), jnp.float32)
    for k0 in range(k_lo, k_hi + 1, chunk):
        ks = range(k0, min(k0 + chunk, k_hi + 1))
        patches = jnp.stack([xp[:, :, k:k + w] for k in ks], axis=2)  # (B,r,k,W)
        out = out + jnp.einsum("bhk,bhkw->bhw", wgt[:, :, k0:k0 + len(ks)],
                               patches, preferred_element_type=jnp.float32)
    return out

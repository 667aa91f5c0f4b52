"""On-device input transforms: normalize + paired geometric & photometric augs.

The reference runs PIL transforms in DataLoader worker processes
(/root/reference/src/dataset.py:130-154) and — defectively — applies geometric augs
to images only, desynchronizing masks (SURVEY.md §2.3). Here the host only decodes
and resizes; everything random runs on device inside the jitted train step, with
**paired** geometry: one flip decision and one rotation angle per sample applied to
both image (bilinear) and mask (nearest).

All functions take NHWC float32 images in [0, 1] (masks (N,H,W,1) float or int) and
are jit-safe with static shapes. Randomness comes from explicit jax.random keys, so
runs are reproducible under --seed.

Deviation from torchvision noted for the record: ColorJitter applies its four ops in
random order; we use the fixed order brightness->contrast->saturation->hue (a fixed
permutation keeps the compiled program static; the augmentation distribution is
practically equivalent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jnp.ndarray,
              mean: Tuple[float, ...] = IMAGENET_MEAN,
              std: Tuple[float, ...] = IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def denormalize(images: jnp.ndarray,
                mean: Tuple[float, ...] = IMAGENET_MEAN,
                std: Tuple[float, ...] = IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return images * std + mean


def to_float(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (host ships uint8; 4x less PCIe/ICI traffic)."""
    return images_u8.astype(jnp.float32) / 255.0


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def rotate_batch(images: jnp.ndarray, angles_deg: jnp.ndarray, order: int = 1) -> jnp.ndarray:
    """Per-sample rotation of an NHWC batch (angles: (N,) degrees, CCW).

    Implemented as ONE flattened gather per bilinear corner across the whole batch
    (global indices ``b*H*W + y*W + x``) rather than a vmapped per-sample gather —
    batched gathers lower to a slow generic path when fused into large TPU
    programs, while a plain 1-D take stays on the fast path.
    """
    n, h, w, c = images.shape
    theta = jnp.deg2rad(angles_deg).astype(jnp.float32)  # (N,)
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = (jnp.arange(h, dtype=jnp.float32) - cy)[None, :, None]
    xx = (jnp.arange(w, dtype=jnp.float32) - cx)[None, None, :]
    # Inverse map (CCW like scipy/torchvision), per sample: (N, H, W).
    src_y = (cos * yy + sin * xx + cy).reshape(n, -1)
    src_x = (-sin * yy + cos * xx + cx).reshape(n, -1)

    flat = images.reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]

    def corner(yi, xi, weight):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = base + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        sample = jnp.take(flat, idx.reshape(-1), axis=0)
        wgt = (weight * valid.astype(images.dtype)).reshape(-1)
        return sample * wgt[:, None]

    if order == 0:
        yi = jnp.round(src_y).astype(jnp.int32)
        xi = jnp.round(src_x).astype(jnp.int32)
        out = corner(yi, xi, jnp.ones_like(src_y, images.dtype))
    else:
        y0 = jnp.floor(src_y).astype(jnp.int32)
        x0 = jnp.floor(src_x).astype(jnp.int32)
        fy = (src_y - y0).astype(images.dtype)
        fx = (src_x - x0).astype(images.dtype)
        out = (corner(y0, x0, (1 - fy) * (1 - fx))
               + corner(y0, x0 + 1, (1 - fy) * fx)
               + corner(y0 + 1, x0, fy * (1 - fx))
               + corner(y0 + 1, x0 + 1, fy * fx))
    return out.reshape(n, h, w, c)


def paired_geometric_augment(
    images: jnp.ndarray,
    masks: Optional[jnp.ndarray],
    key: jax.Array,
    *,
    degrees: float = 10.0,
    p_flip: float = 0.5,
    rotation_mode: str = "per_sample",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Random horizontal flip + random rotation, identical geometry for image & mask.

    Image samples bilinearly; mask nearest (labels must stay integral).

    rotation_mode:
      'per_sample'       — independent angle per image via the 4-corner gather
                           (reference torchvision semantics; ~20 ms device time
                           at b16 @256 — TPU gathers are slow).
      'per_sample_shear' — independent angle per image via three K-tap banded
                           shears (ops/rotate_shear.py) — the reference's angle
                           DISTRIBUTION without the gather penalty; boundary
                           numerics are shear-composed (triple-resample) rather
                           than direct bilinear.
      'per_batch_shear'  — ONE angle shared by the batch, applied as three
                           banded shear MATMULS — MXU work, ~free. Marginal
                           angle distribution across steps is unchanged.
    """
    n = images.shape[0]
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.uniform(k_flip, (n,)) < p_flip
    out_img = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)

    out_mask = None
    if masks is not None:
        mdtype = masks.dtype
        m = masks.astype(jnp.float32)
        m = jnp.where(flip[:, None, None, None], m[:, :, ::-1, :], m)
    else:
        m = None

    if degrees > 0:
        if rotation_mode == "per_batch_shear":
            from tpu_unet.ops.rotate_shear import rotate_batch_shear
            angle = jax.random.uniform(k_rot, (), minval=-degrees, maxval=degrees)
            out_img = rotate_batch_shear(out_img, angle, degrees, order=1)
            if m is not None:
                m = rotate_batch_shear(m, angle, degrees, order=0)
        elif rotation_mode == "per_sample_shear":
            from tpu_unet.ops.rotate_shear import rotate_batch_shear_per_sample
            angles = jax.random.uniform(k_rot, (n,), minval=-degrees, maxval=degrees)
            out_img = rotate_batch_shear_per_sample(out_img, angles, degrees, order=1)
            if m is not None:
                m = rotate_batch_shear_per_sample(m, angles, degrees, order=0)
        elif rotation_mode == "per_sample":
            angles = jax.random.uniform(k_rot, (n,), minval=-degrees, maxval=degrees)
            out_img = rotate_batch(out_img, angles, order=1)
            if m is not None:
                m = rotate_batch(m, angles, order=0)
        else:
            raise ValueError(f"Unknown rotation_mode: {rotation_mode!r}")

    if m is not None:
        out_mask = m.astype(mdtype)
    return out_img, out_mask


# ---------------------------------------------------------------------------
# Photometry (image only)
# ---------------------------------------------------------------------------

def _rgb_to_gray(images: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], images.dtype)
    return jnp.sum(images * w, axis=-1, keepdims=True)


def _rgb_to_hsv(images: jnp.ndarray):
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    maxc = jnp.max(images, axis=-1)
    minc = jnp.min(images, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(images: jnp.ndarray, key: jax.Array, *,
                 brightness: float = 0.1, contrast: float = 0.1,
                 saturation: float = 0.1, hue: float = 0.05,
                 random_order: bool = False) -> jnp.ndarray:
    """Per-sample brightness/contrast/saturation/hue jitter, torch factor ranges.

    torchvision's ColorJitter applies the enabled ops in a RANDOM order per call;
    ``random_order=True`` reproduces that with one permutation shared by the batch
    per step, as ONE ``lax.switch`` over the 24 statically-composed op orders
    (each branch a fully-fused fixed pipeline — per-op dynamic control flow
    measured far worse). Even so, the switch boundary costs ~35% of train-step
    throughput on v5e (measured r2, same-session A/B), so the DEFAULT is the
    fixed brightness→contrast→saturation→hue order (documented deviation,
    README "Deviations"); pass ``--color_jitter_random_order`` for torchvision
    order semantics.
    """
    import itertools
    n = images.shape[0]
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)

    # Factors are drawn up front (independent of op order, like torchvision).
    fb = jax.random.uniform(kb, (n, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (n, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (n, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (n, 1, 1), minval=-hue, maxval=hue)

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0) if brightness > 0 else x

    def op_contrast(x):
        if contrast <= 0:
            return x
        mean = jnp.mean(_rgb_to_gray(x), axis=(1, 2), keepdims=True)
        return jnp.clip(fc * x + (1 - fc) * mean, 0.0, 1.0)

    def op_saturation(x):
        if saturation <= 0:
            return x
        gray = _rgb_to_gray(x)
        return jnp.clip(fs * x + (1 - fs) * gray, 0.0, 1.0)

    def op_hue(x):
        if hue <= 0:
            return x
        h, s, v = _rgb_to_hsv(x)
        return _hsv_to_rgb((h + fh) % 1.0, s, v)

    ops = (op_brightness, op_contrast, op_saturation, op_hue)
    if not random_order:
        x = images
        for op in ops:
            x = op(x)
        return x

    def compose(order):
        def run(x):
            for j in order:
                x = ops[j](x)
            return x
        return run

    branches = [compose(order) for order in itertools.permutations(range(4))]
    perm_idx = jax.random.randint(kperm, (), 0, len(branches))
    return jax.lax.switch(perm_idx, branches, images)


# ---------------------------------------------------------------------------
# Full train/eval transforms (the device half of the input pipeline)
# ---------------------------------------------------------------------------

def train_transform(images_u8: jnp.ndarray, masks: Optional[jnp.ndarray],
                    key: jax.Array, *, degrees: float = 10.0, p_flip: float = 0.5,
                    brightness: float = 0.1, contrast: float = 0.1,
                    saturation: float = 0.1, hue: float = 0.05,
                    rotation_mode: str = "per_sample",
                    color_jitter_random_order: bool = False):
    """uint8 NHWC -> augmented, normalized float32 (+ paired mask)."""
    k_geo, k_col = jax.random.split(key)
    img = to_float(images_u8)
    img, masks = paired_geometric_augment(img, masks, k_geo, degrees=degrees,
                                          p_flip=p_flip, rotation_mode=rotation_mode)
    img = color_jitter(img, k_col, brightness=brightness, contrast=contrast,
                       saturation=saturation, hue=hue,
                       random_order=color_jitter_random_order)
    return normalize(img), masks


def eval_transform(images_u8: jnp.ndarray):
    """uint8 NHWC -> normalized float32 (no augmentation)."""
    return normalize(to_float(images_u8))

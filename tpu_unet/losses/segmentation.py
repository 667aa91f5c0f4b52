"""Multi-class segmentation losses: weighted CE + Dice + focal, all on-device.

Behavior parity with the reference (/root/reference/src/metrics.py:233-335):
- cross-entropy with per-class weights uses torch's weighted-mean semantics
  (sum(w[y_i] * ce_i) / sum(w[y_i])), which matters for KolektorSDD's 1:50:50 weights;
- dice loss operates on softmax probabilities vs one-hot targets with smooth=1e-8;
- multi-class focal loss is CE-based with alpha=1, gamma=2;
- CombinedSegmentationLoss gates each term on weight > 0.

All functions take NHWC logits (N,H,W,C) and integer labels (N,H,W) — channels-last
is the TPU-native layout (the reference is NCHW).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tpu_unet.losses.reduction import weighted_mean


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel cross entropy (N,H,W) plus validity mask (1 where counted)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels_safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    ce = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        valid = (labels != ignore_index).astype(jnp.float32)
    else:
        valid = jnp.ones_like(ce)
    return ce * valid, valid


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       class_weights: Optional[Sequence[float]] = None,
                       ignore_index: Optional[int] = None,
                       sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weighted softmax cross entropy with torch F.cross_entropy mean semantics."""
    ce, valid = _per_pixel_ce(logits, labels, ignore_index)
    if sample_weight is not None:
        sw = sample_weight.astype(jnp.float32).reshape(-1, *([1] * (ce.ndim - 1)))
        valid = valid * sw
        ce = ce * sw
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=jnp.float32)
        pixel_w = w[jnp.clip(labels, 0, len(class_weights) - 1)] * valid
        return jnp.sum(ce * w[jnp.clip(labels, 0, len(class_weights) - 1)]) / jnp.maximum(
            jnp.sum(pixel_w), 1e-12)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1e-12)


def dice_loss(probs: jnp.ndarray, labels: jnp.ndarray, smooth: float = 1e-8,
              sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dice loss on softmax probabilities (N,H,W,C) vs integer labels (N,H,W)."""
    num_classes = probs.shape[-1]
    probs = probs.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    # Flatten spatial dims -> (N, C)
    intersection = jnp.sum(probs * one_hot, axis=(1, 2))
    union = jnp.sum(probs, axis=(1, 2)) + jnp.sum(one_hot, axis=(1, 2))
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - weighted_mean(dice, sample_weight)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, alpha: float = 1.0,
               gamma: float = 2.0, ignore_index: Optional[int] = None,
               sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-class focal loss (CE-based). Mean over all pixels, zeros at ignored
    positions — matching torch's reduction='none' + .mean() in the reference."""
    ce, _ = _per_pixel_ce(logits, labels, ignore_index)
    pt = jnp.exp(-ce)
    return weighted_mean(alpha * (1.0 - pt) ** gamma * ce, sample_weight)


def _combined_unsliced(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    focal_weight: float = 0.0,
    class_weights: Optional[Sequence[float]] = None,
    ignore_index: Optional[int] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Straightforward composition of the per-term losses (reference oracle).

    Every term materializes (N,H,W,C) intermediates (log_softmax, softmax,
    one_hot). With the tiny class counts of these workloads (C=3/4) the C-minor
    tensors occupy 3-4 of 128 vector lanes, so on TPU each elementwise pass costs
    ~C/128-fold its logical bytes. Kept as the numerics oracle for the sliced
    fast path below and for any future C large enough to make slicing silly.
    """
    total = jnp.float32(0.0)
    out: Dict[str, jnp.ndarray] = {}
    if ce_weight > 0:
        ce = cross_entropy_loss(logits, labels, class_weights, ignore_index,
                                sample_weight=sample_weight)
        out["ce_loss"] = ce
        total = total + ce_weight * ce
    if dice_weight > 0:
        d = dice_loss(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), labels,
                      sample_weight=sample_weight)
        out["dice_loss"] = d
        total = total + dice_weight * d
    if focal_weight > 0:
        f = focal_loss(logits, labels, ignore_index=ignore_index,
                       sample_weight=sample_weight)
        out["focal_loss"] = f
        total = total + focal_weight * f
    out["total_loss"] = total
    return out


def _combined_sliced(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    ce_weight: float,
    dice_weight: float,
    focal_weight: float,
    class_weights: Optional[Sequence[float]],
    ignore_index: Optional[int],
    sample_weight: Optional[jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """CE + Dice + focal computed from C static channel slices of the logits.

    Lane-occupancy rewrite of ``_combined_unsliced``: every working tensor is a
    full-lane (N,H,W) plane instead of a (N,H,W,C) C-minor tensor, so the loss
    head (and its backward, which XLA derives in the same sliced shapes) stops
    paying the ~128/C padded-lane tax. The math is the same shifted-logsumexp
    softmax/CE the unsliced path uses; an equivalence test pins both paths
    together (tests/test_losses.py).
    """
    num_classes = logits.shape[-1]
    ls = [logits[..., c].astype(jnp.float32) for c in range(num_classes)]
    m = ls[0]
    for c in range(1, num_classes):
        m = jnp.maximum(m, ls[c])
    shifted = [l - m for l in ls]
    es = [jnp.exp(s) for s in shifted]
    se = es[0]
    for c in range(1, num_classes):
        se = se + es[c]

    # Selection masks. CE follows the unsliced path's clip-then-select semantics
    # (out-of-range labels read the last class's logit before being masked);
    # dice follows one_hot semantics (out-of-range rows are all-zero). The two
    # mask sets only differ on out-of-range labels; XLA fuses the int compares
    # into their consumers either way.
    labels_safe = jnp.clip(labels, 0, num_classes - 1)
    ce_masks = [(labels_safe == c).astype(jnp.float32) for c in range(num_classes)]
    dice_masks = [(labels == c).astype(jnp.float32) for c in range(num_classes)]

    out: Dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)

    ce_pp = None
    if ce_weight > 0 or focal_weight > 0:
        shifted_y = ce_masks[0] * shifted[0]
        for c in range(1, num_classes):
            shifted_y = shifted_y + ce_masks[c] * shifted[c]
        ce_pp = jnp.log(se) - shifted_y                      # (N,H,W)
        if ignore_index is not None:
            valid = (labels != ignore_index).astype(jnp.float32)
        else:
            valid = jnp.ones_like(ce_pp)
        ce_pp = ce_pp * valid

    if ce_weight > 0:
        ce_v, val = ce_pp, valid
        if sample_weight is not None:
            sw = sample_weight.astype(jnp.float32).reshape(-1, 1, 1)
            val = val * sw
            ce_v = ce_v * sw
        if class_weights is not None:
            w = [float(x) for x in class_weights]
            w_y = w[0] * ce_masks[0]
            for c in range(1, num_classes):
                w_y = w_y + w[c] * ce_masks[c]
            ce = jnp.sum(ce_v * w_y) / jnp.maximum(jnp.sum(w_y * val), 1e-12)
        else:
            ce = jnp.sum(ce_v) / jnp.maximum(jnp.sum(val), 1e-12)
        out["ce_loss"] = ce
        total = total + ce_weight * ce

    if dice_weight > 0:
        smooth = 1e-8
        dice_cols = []
        for c in range(num_classes):
            p_c = es[c] / se
            inter = jnp.sum(p_c * dice_masks[c], axis=(1, 2))
            union = jnp.sum(p_c, axis=(1, 2)) + jnp.sum(dice_masks[c], axis=(1, 2))
            dice_cols.append((2.0 * inter + smooth) / (union + smooth))
        dice = jnp.stack(dice_cols, axis=-1)                 # (N, C)
        d = 1.0 - weighted_mean(dice, sample_weight)
        out["dice_loss"] = d
        total = total + dice_weight * d

    if focal_weight > 0:
        pt = jnp.exp(-ce_pp)
        f = weighted_mean(1.0 * (1.0 - pt) ** 2.0 * ce_pp, sample_weight)
        out["focal_loss"] = f
        total = total + focal_weight * f

    out["total_loss"] = total
    return out


def combined_segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    focal_weight: float = 0.0,
    class_weights: Optional[Sequence[float]] = None,
    ignore_index: Optional[int] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Weighted CE + Dice + focal, each term gated on its weight being > 0.

    sample_weight: optional (N,) weights — binary weights exclude padded rows so a
    padded eval batch yields the exact loss of its valid rows.

    Dispatch: for the small class counts these workloads use (C <= 8) the loss is
    computed from per-class channel slices so every elementwise tensor is a
    full-lane (N,H,W) plane — see ``_combined_sliced``. Larger C (or class-weight
    vectors that disagree with C) falls back to the straightforward
    (N,H,W,C)-tensor composition.
    """
    kw = dict(ce_weight=ce_weight, dice_weight=dice_weight,
              focal_weight=focal_weight, class_weights=class_weights,
              ignore_index=ignore_index, sample_weight=sample_weight)
    from tpu_unet.ops.seg_head import SMALL_C_MAX
    num_classes = logits.shape[-1]
    if (2 <= num_classes <= SMALL_C_MAX and logits.ndim == 4
            and (class_weights is None or len(class_weights) == num_classes)):
        return _combined_sliced(logits, labels, **kw)
    return _combined_unsliced(logits, labels, **kw)

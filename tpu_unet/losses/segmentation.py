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

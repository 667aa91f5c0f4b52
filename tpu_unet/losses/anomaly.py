"""Anomaly-detection losses: combined reconstruction + binary-focal segmentation.

Behavior parity with the reference's CombinedLoss
(/root/reference/src/train_utils.py:10-44): total = w_r * recon + w_s * focal where
focal = mean(alpha * (1 - pt)^gamma * BCE(prob, target)), pt = exp(-BCE). Unlike the
reference, the SSIM reconstruction option is actually wired in (SURVEY.md §2.6
defect 2: the reference builds SSIMLoss under --use_ssim but always trains with MSE).

All functions are pure and jit-safe; they take probabilities (the models already
apply sigmoid) and return a dict of scalars.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from tpu_unet.losses.reduction import weighted_mean
from tpu_unet.ops.ssim import ssim
from tpu_unet.ops.ssim import ssim_loss  # noqa: F401  (re-export, public API)

_EPS = 1e-7  # must be representable next to 1.0 in f32 (1 - 1e-12 rounds to 1.0)


def binary_focal_loss(probs: jnp.ndarray, targets: jnp.ndarray,
                      alpha: float = 0.25, gamma: float = 2.0,
                      sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Focal loss on probabilities (post-sigmoid), matching torch BCE semantics.

    The probability clip eps must be f32-representable: the previous 1e-12 made
    ``1.0 - eps`` round back to exactly 1.0, so a saturated sigmoid (p == 1.0,
    reachable from logit ~17) slipped through and produced an inf loss with NaN
    gradients — one such pixel poisoned the training state irreversibly. (torch
    survives the same input because F.binary_cross_entropy clamps its log terms
    at -100; a log-clamp in JAX still NaNs the backward at p in {0, 1} — the
    log VJP divides a zero cotangent by zero — so the clip is the right fix
    here. In the clipped region the loss is ~16.1 per pixel and the gradient 0.)
    """
    p = jnp.clip(probs.astype(jnp.float32), _EPS, 1.0 - _EPS)
    t = targets.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    pt = jnp.exp(-bce)
    return weighted_mean(alpha * (1.0 - pt) ** gamma * bce, sample_weight)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return weighted_mean((pred - target) ** 2, sample_weight)


def combined_anomaly_loss(
    reconstruction: jnp.ndarray,
    anomaly_map: jnp.ndarray,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    recon_weight: float = 1.0,
    seg_weight: float = 1.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    recon_loss_type: str = "mse",
    sample_weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Combined anomaly loss; all inputs NHWC (mask (N,H,W,1) binary).

    recon_loss_type: 'mse' (reference default) or 'ssim' (--use_ssim, properly wired).
    sample_weight: optional (N,) weights — binary weights exclude padded rows so a
    padded eval batch yields the exact loss of its valid rows.
    Returns {'total_loss', 'recon_loss', 'seg_loss'} like the reference's dict.
    """
    if recon_loss_type == "mse":
        recon_loss = mse_loss(reconstruction, image, sample_weight=sample_weight)
    elif recon_loss_type == "ssim":
        per_image = 1.0 - ssim(reconstruction.astype(jnp.float32),
                               image.astype(jnp.float32), size_average=False)
        recon_loss = weighted_mean(per_image, sample_weight)
    else:
        raise ValueError(f"Unknown recon_loss_type: {recon_loss_type!r}")

    seg_loss = binary_focal_loss(anomaly_map, mask, alpha=focal_alpha,
                                 gamma=focal_gamma, sample_weight=sample_weight)
    total = recon_weight * recon_loss + seg_weight * seg_loss
    return {"total_loss": total, "recon_loss": recon_loss, "seg_loss": seg_loss}

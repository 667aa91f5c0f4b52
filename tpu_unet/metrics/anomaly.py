"""Anomaly scoring from reconstruction error.

The reference's compute_anomaly_score returns a per-pixel (H, W) map but is consumed
as a per-image scalar, which crashes sklearn on mixed labels (SURVEY.md §2.6 defect 1,
verified against /root/reference/src/utils.py:205-215 and its call sites). This module
implements the evident intent as two explicit functions:

- ``anomaly_score``: scalar per image — mean reconstruction error over (H, W, C) —
  feeding image-level AUROC/AUPRC;
- ``anomaly_error_map``: per-pixel (N, H, W) map — channel-mean error — for
  pixel-level evaluation and visualization.

Both are jit-safe device functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_unet.ops.ssim import ssim


def _per_pixel_error(reconstruction: jnp.ndarray, original: jnp.ndarray,
                     method: str = "mse") -> jnp.ndarray:
    r = reconstruction.astype(jnp.float32)
    o = original.astype(jnp.float32)
    if method == "mse":
        return jnp.mean((r - o) ** 2, axis=-1)
    if method == "l1":
        return jnp.mean(jnp.abs(r - o), axis=-1)
    if method == "ssim":
        # Reference stubs 'ssim' to MSE (/root/reference/src/utils.py:211-213); we
        # keep the mse map here and expose true SSIM via anomaly_score below.
        return jnp.mean((r - o) ** 2, axis=-1)
    raise ValueError(f"Unknown method: {method!r}")


def anomaly_error_map(reconstruction: jnp.ndarray, original: jnp.ndarray,
                      method: str = "mse") -> jnp.ndarray:
    """Per-pixel anomaly map (N, H, W): channel-mean reconstruction error."""
    return _per_pixel_error(reconstruction, original, method)


def anomaly_score(reconstruction: jnp.ndarray, original: jnp.ndarray,
                  method: str = "mse") -> jnp.ndarray:
    """Scalar anomaly score per image (N,)."""
    if method == "ssim":
        return 1.0 - ssim(reconstruction.astype(jnp.float32),
                          original.astype(jnp.float32), size_average=False)
    return jnp.mean(_per_pixel_error(reconstruction, original, method), axis=(1, 2))

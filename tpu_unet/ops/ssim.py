"""Gaussian-window SSIM, NHWC, as a pure XLA function.

Behavior parity with the reference's SSIMLoss (/root/reference/src/train_utils.py:47-104):
11-tap Gaussian window (sigma=1.5), per-channel (depthwise) convolutions with
window//2 zero padding, C1=0.01^2, C2=0.03^2. The five window convolutions are
depthwise convs that XLA fuses into a small number of bandwidth-bound passes; they
are tiny next to the UNet convs so no Pallas kernel is warranted here.

Unlike the reference (which constructs SSIMLoss under --use_ssim but silently never
uses it, SURVEY.md §2.6 defect 2), this framework actually wires SSIM into the
combined anomaly loss when selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """Normalized 2-D Gaussian window, shape (window, window)."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_window_conv(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D convolution of NHWC x with a (k,k) window, zero pad k//2."""
    channels = x.shape[-1]
    k = window.shape[0]
    # HWIO kernel with feature_group_count=C: (k, k, 1, C)
    kernel = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, channels)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """Structural similarity between two NHWC images.

    Returns a scalar (size_average=True) or per-image (N,) means of the SSIM map.
    """
    window = jnp.asarray(_gaussian_window(window_size, sigma))

    mu1 = _depthwise_window_conv(img1, window)
    mu2 = _depthwise_window_conv(img2, window)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = _depthwise_window_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_window_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_window_conv(img1 * img2, window) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )

    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_loss(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5) -> jnp.ndarray:
    """1 - SSIM, the reconstruction loss form used under --use_ssim."""
    return 1.0 - ssim(img1, img2, window_size=window_size, sigma=sigma)

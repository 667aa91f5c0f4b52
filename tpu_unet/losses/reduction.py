"""Sample-weighted reductions for loss functions.

Used to exclude zero-padded rows of a fixed-shape eval batch from loss scalars
(the loader pads the final partial batch to the static batch size; metrics were
always masked, and with these reductions the loss scalars are too). A binary
``sample_weight`` of shape (N,) makes every reduction exactly equal to the same
loss computed over only the valid rows.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def weighted_mean(x: jnp.ndarray, sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of per-sample-elementwise values x (N, ...) under (N,) sample weights.

    With sample_weight=None this is jnp.mean(x). With binary weights it equals
    jnp.mean(x[valid]) exactly (each sample contributes its per-sample mean,
    weighted, normalized by the weight sum).
    """
    x = x.astype(jnp.float32)
    if sample_weight is None:
        return jnp.mean(x)
    w = sample_weight.astype(jnp.float32)
    per_sample = jnp.mean(x, axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)

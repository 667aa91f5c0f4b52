"""Fused normalize kernel: reference-path numerics (the Pallas path itself needs a
TPU; it is exercised by bench.py and the interpret-mode check here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.ops.augment import eval_transform
from tpu_unet.ops.pallas.preprocess import (
    normalize_u8,
    normalize_u8_reference,
)


def test_reference_matches_eval_transform():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8))
    np.testing.assert_allclose(np.asarray(normalize_u8_reference(img)),
                               np.asarray(eval_transform(img)), atol=1e-5)


def test_dispatch_on_cpu_uses_reference():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (1, 8, 8, 3), dtype=np.uint8))
    out = normalize_u8(img)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(normalize_u8_reference(img)), atol=1e-6)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode for numeric parity."""
    import functools
    from jax.experimental import pallas as pl
    from tpu_unet.ops.pallas import preprocess as pp

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 256, (2, 8, 128, 3), dtype=np.uint8))
    scale_np, bias_np = pp._scale_bias(pp.IMAGENET_MEAN, pp.IMAGENET_STD)
    n, h, w, c = img.shape
    wc = w * c
    x = img.reshape(n, h, wc)
    scale = jnp.asarray(np.tile(scale_np, w)).reshape(1, 1, wc)
    bias = jnp.asarray(np.tile(bias_np, w)).reshape(1, 1, wc)
    out = pl.pallas_call(
        pp._normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.float32),
        grid=(n, 1),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, wc), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 1, wc), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i, j: (i, j, 0)),
        interpret=True,
    )(x, scale, bias).reshape(n, h, w, c)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(normalize_u8_reference(img)), atol=1e-5)

"""3-shear matmul rotation: geometry, numerics vs gather rotation, mask safety."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.ops.augment import paired_geometric_augment, rotate_batch
from tpu_unet.ops.rotate_shear import rotate_batch_shear


def test_direction_matches_gather_rotation():
    img = np.zeros((32, 32, 1), np.float32)
    img[4, 16] = 1.0
    s = np.asarray(rotate_batch_shear(jnp.asarray(img[None]), jnp.float32(90.0), 90.0))
    g = np.asarray(rotate_batch(jnp.asarray(img[None]), jnp.asarray([90.0])))
    assert np.unravel_index(s.argmax(), s.shape) == np.unravel_index(g.argmax(), g.shape)


def test_smooth_image_close_to_direct_rotation():
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = (np.sin(yy / 6.0) + np.cos(xx / 9.0)).astype(np.float32)[..., None]
    a = np.asarray(rotate_batch_shear(jnp.asarray(smooth[None]), jnp.float32(8.0), 10.0))
    b = np.asarray(rotate_batch(jnp.asarray(smooth[None]), jnp.asarray([8.0])))
    d = np.abs(a - b)[0, 8:-8, 8:-8, 0]
    assert d.max() < 0.02  # triple-resample vs single-resample tolerance


def test_zero_angle_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out = rotate_batch_shear(img, jnp.float32(0.0), 10.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_mask_integrality_order0():
    rng = np.random.default_rng(1)
    m = (rng.random((2, 32, 32, 1)) > 0.7).astype(np.float32)
    out = np.asarray(rotate_batch_shear(jnp.asarray(m), jnp.float32(7.3), 10.0, order=0))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_paired_augment_per_batch_shear_mode():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 4, (2, 32, 32, 1)).astype(np.int32))
    out_img, out_mask = paired_geometric_augment(
        img, mask, jax.random.key(0), degrees=10.0, rotation_mode="per_batch_shear")
    assert out_img.shape == img.shape
    assert out_mask.dtype == jnp.int32
    assert set(np.unique(np.asarray(out_mask))) <= {0, 1, 2, 3}

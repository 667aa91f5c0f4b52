"""3-shear matmul rotation: geometry, numerics vs gather rotation, mask safety."""

import pytest
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


# ---------------------------------------------------------------------------
# Per-sample-angle banded shears (rotate_batch_shear_per_sample)
# ---------------------------------------------------------------------------

from tpu_unet.ops.rotate_shear import rotate_batch_shear_per_sample


def test_per_sample_shear_matches_shared_shear_at_equal_angles():
    """With every angle equal, the K-tap path computes the same lerps as the
    shared banded-operator path (same 3-shear math, different contraction)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((3, 32, 32, 3)).astype(np.float32))
    for order in (0, 1):
        shared = rotate_batch_shear(img, jnp.float32(7.3), 10.0, order=order)
        ps = rotate_batch_shear_per_sample(
            img, jnp.full((3,), 7.3, jnp.float32), 10.0, order=order)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(shared), atol=1e-5)


def test_per_sample_shear_close_to_gather_rotation_per_angle():
    """Each sample rotates by ITS OWN angle, interior within triple-resample
    tolerance of the direct 4-corner gather rotation."""
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = (np.sin(yy / 6.0) + np.cos(xx / 9.0)).astype(np.float32)[..., None]
    batch = jnp.asarray(np.stack([smooth, smooth.transpose(1, 0, 2), -smooth]))
    angles = jnp.asarray([-9.0, 2.5, 8.0], jnp.float32)
    a = np.asarray(rotate_batch_shear_per_sample(batch, angles, 10.0))
    b = np.asarray(rotate_batch(batch, angles))
    d = np.abs(a - b)[:, 8:-8, 8:-8, 0]
    assert d.max() < 0.02
    # And the samples really got DIFFERENT rotations: sample 2's output differs
    # from what sample 2 would be at sample 0's angle.
    alt = np.asarray(rotate_batch_shear_per_sample(
        batch, jnp.asarray([-9.0, 2.5, -9.0], jnp.float32), 10.0))
    assert np.abs(alt[2] - a[2]).max() > 0.05


def test_per_sample_shear_zero_angle_identity():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out = rotate_batch_shear_per_sample(img, jnp.zeros((2,), jnp.float32), 10.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_per_sample_shear_mask_integrality_order0():
    rng = np.random.default_rng(5)
    m = (rng.random((3, 32, 32, 1)) > 0.7).astype(np.float32)
    out = np.asarray(rotate_batch_shear_per_sample(
        jnp.asarray(m), jnp.asarray([-7.3, 0.0, 4.1], jnp.float32), 10.0, order=0))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_paired_augment_per_sample_shear_mode():
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 4, (2, 32, 32, 1)).astype(np.int32))
    out_img, out_mask = paired_geometric_augment(
        img, mask, jax.random.key(0), degrees=10.0,
        rotation_mode="per_sample_shear")
    assert out_img.shape == img.shape
    assert out_mask.dtype == jnp.int32
    assert set(np.unique(np.asarray(out_mask))) <= {0, 1, 2, 3}


@pytest.mark.slow
def test_per_sample_shear_row_blocking_boundary():
    """Row-blocked static band narrowing is exact (skipped taps have weight 0
    for every angle within the bound): many small blocks over an h that is NOT
    a block multiple must reproduce the single-block result."""
    from tpu_unet.ops import rotate_shear as rs
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((2, 52, 40, 3)).astype(np.float32))
    angles = jnp.asarray([-8.7, 5.2], jnp.float32)
    orig = rs._SHEAR_ROW_BLOCK
    try:
        rs._SHEAR_ROW_BLOCK = 10 ** 9  # one block: full-width static band
        one = np.asarray(rotate_batch_shear_per_sample(img, angles, 10.0))
        rs._SHEAR_ROW_BLOCK = 8  # 7 blocks per 52-row pass, ragged tail
        blocked = np.asarray(rotate_batch_shear_per_sample(img, angles, 10.0))
    finally:
        rs._SHEAR_ROW_BLOCK = orig
    np.testing.assert_allclose(blocked, one, atol=1e-6)


def test_per_sample_shear_tap_chunking_boundary():
    """Force the K-tap chunk size to 1 so accumulation crosses every chunk
    boundary; result must be identical to the unchunked computation."""
    from tpu_unet.ops import rotate_shear as rs
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((2, 24, 24, 3)).astype(np.float32))
    angles = jnp.asarray([-6.0, 9.5], jnp.float32)
    full = np.asarray(rotate_batch_shear_per_sample(img, angles, 10.0))
    orig = rs._PATCH_CHUNK_BYTES
    try:
        rs._PATCH_CHUNK_BYTES = 1  # chunk = 1 tap
        chunked = np.asarray(rotate_batch_shear_per_sample(img, angles, 10.0))
    finally:
        rs._PATCH_CHUNK_BYTES = orig
    np.testing.assert_allclose(chunked, full, atol=1e-6)

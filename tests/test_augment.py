"""On-device augmentation tests: pairing, determinism, value ranges, rotation parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.ops.augment import (
    color_jitter,
    denormalize,
    eval_transform,
    normalize,
    paired_geometric_augment,
    rotate_batch,
    to_float,
    train_transform,
)
from tpu_unet.ops.resize import resize_bilinear_align_corners


class TestNormalize:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 8, 8, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(denormalize(normalize(x))), np.asarray(x),
                                   atol=1e-5)

    def test_matches_torchvision_formula(self):
        x = jnp.ones((1, 2, 2, 3), jnp.float32) * 0.5
        out = np.asarray(normalize(x))
        expect = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


class TestRotation:
    def test_zero_angle_identity(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 16, 16, 3)).astype(np.float32))
        out = rotate_batch(x, jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_90deg_matches_scipy(self):
        scipy_ndimage = pytest.importorskip("scipy.ndimage")
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(16, 16, 1)).astype(np.float32)
        ours = np.asarray(rotate_batch(jnp.asarray(img[None]), jnp.asarray([90.0])))[0, ..., 0]
        theirs = scipy_ndimage.rotate(img[..., 0], 90.0, reshape=False, order=1, cval=0.0)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_arbitrary_angle_matches_scipy(self):
        scipy_ndimage = pytest.importorskip("scipy.ndimage")
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(20, 20, 1)).astype(np.float32)
        ours = np.asarray(rotate_batch(jnp.asarray(img[None]), jnp.asarray([7.3])))[0, ..., 0]
        theirs = scipy_ndimage.rotate(img[..., 0], 7.3, reshape=False, order=1, cval=0.0)
        # Border pixels differ (jax vs scipy constant-mode boundary interpolation);
        # the interior must match.
        np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=1e-4)


class TestPairedGeometry:
    def test_mask_follows_image(self):
        """The core fix over the reference: identical geometry for image and mask."""
        rng = np.random.default_rng(4)
        img = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
        # Mask equals a channel-slice indicator so we can verify pairing.
        mask = (img[..., :1] > 0.5).astype(np.float32)
        key = jax.random.key(0)
        out_img, out_mask = paired_geometric_augment(
            jnp.asarray(img), jnp.asarray(mask), key, degrees=0.0, p_flip=1.0)
        # With p_flip=1 and no rotation, both must be exactly flipped.
        np.testing.assert_allclose(np.asarray(out_img), img[:, :, ::-1, :], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_mask), mask[:, :, ::-1, :], atol=1e-6)

    def test_mask_dtype_and_integrality_preserved(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        mask = rng.integers(0, 4, (2, 16, 16, 1)).astype(np.int32)
        out_img, out_mask = paired_geometric_augment(
            jnp.asarray(img), jnp.asarray(mask), jax.random.key(1), degrees=10.0)
        assert out_mask.dtype == jnp.int32
        vals = np.unique(np.asarray(out_mask))
        assert set(vals.tolist()) <= {0, 1, 2, 3}

    def test_deterministic_under_key(self):
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
        a1, _ = paired_geometric_augment(img, None, jax.random.key(7))
        a2, _ = paired_geometric_augment(img, None, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


class TestColorJitter:
    def test_range_preserved(self):
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
        out = color_jitter(img, jax.random.key(0))
        assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5

    def test_zero_strength_identity(self):
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        out = color_jitter(img, jax.random.key(0), brightness=0, contrast=0,
                           saturation=0, hue=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    @pytest.mark.slow
    def test_random_order_matches_manual_permutation(self):
        """random_order=True applies the ops in the drawn permutation exactly."""
        import jax

        from tpu_unet.ops.augment import color_jitter

        import itertools

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        perms_seen = set()
        hue_moved_and_differed = 0
        for seed in range(16):
            key = jax.random.key(seed)
            out_rand = color_jitter(x, key, random_order=True)
            out_fixed = color_jitter(x, key, random_order=False)
            # Reconstruct the permutation the same way color_jitter draws it.
            kperm = jax.random.split(key, 5)[4]
            idx = int(jax.random.randint(kperm, (), 0, 24))
            perm = list(itertools.permutations(range(4)))[idx]
            perms_seen.add(perm)
            # brightness/contrast/saturation are mutually commuting linear blends
            # (when clipping doesn't bind), so only hue's position is guaranteed
            # to change the composition numerically.
            if perm.index(3) != 3:
                assert not np.allclose(np.asarray(out_rand), np.asarray(out_fixed),
                                       atol=1e-6), \
                    f"seed {seed}: hue moved ({perm}) but output matched fixed order"
                hue_moved_and_differed += 1
            elif perm == (0, 1, 2, 3):
                np.testing.assert_allclose(np.asarray(out_rand),
                                           np.asarray(out_fixed), atol=1e-6)
        assert len(perms_seen) >= 6       # the order really varies across keys
        assert hue_moved_and_differed >= 4  # and it changes the output

    def test_random_order_zero_strength_identity(self):
        import jax

        from tpu_unet.ops.augment import color_jitter

        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 8, 8, 3)).astype(np.float32))
        out = color_jitter(x, jax.random.key(5), brightness=0, contrast=0,
                           saturation=0, hue=0, random_order=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)

    def test_hue_roundtrip_preserves_value(self):
        # Hue rotation must not change the HSV 'value' (max channel).
        rng = np.random.default_rng(10)
        img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        out = color_jitter(img, jax.random.key(3), brightness=0, contrast=0,
                           saturation=0, hue=0.05)
        np.testing.assert_allclose(np.asarray(out.max(axis=-1)),
                                   np.asarray(img.max(axis=-1)), atol=1e-4)


class TestFullTransforms:
    def test_train_transform_shapes(self):
        rng = np.random.default_rng(11)
        img_u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        mask = rng.integers(0, 2, (2, 32, 32, 1)).astype(np.float32)
        out_img, out_mask = train_transform(jnp.asarray(img_u8), jnp.asarray(mask),
                                            jax.random.key(0))
        assert out_img.shape == (2, 32, 32, 3) and out_img.dtype == jnp.float32
        assert out_mask.shape == (2, 32, 32, 1)

    def test_eval_transform_no_randomness(self):
        rng = np.random.default_rng(12)
        img_u8 = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8))
        np.testing.assert_array_equal(np.asarray(eval_transform(img_u8)),
                                      np.asarray(normalize(to_float(img_u8))))


class TestResize:
    def test_align_corners_endpoints(self):
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
        out = resize_bilinear_align_corners(x, 1, 7)
        # align_corners: first and last outputs equal first/last inputs.
        assert float(out[0, 0, 0, 0]) == 0.0
        assert float(out[0, 0, -1, 0]) == 3.0
        np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]),
                                   np.linspace(0, 3, 7), atol=1e-6)

    def test_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(13)
        x = rng.uniform(size=(1, 8, 8, 2)).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 16, 16))
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        theirs = torch.nn.functional.interpolate(
            tx, scale_factor=2, mode="bilinear", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

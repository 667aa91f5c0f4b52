"""Tiled full-resolution inference (tpu_unet/ops/tiling.py).

Unit properties of the grid/window math, exactness of the blend (a pointwise
tile forward must reconstruct the direct full-image result bit-for-nearly),
and the SegmentationPredictor integration on a tiny real model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.ops.tiling import make_tiled_logits_fn, tile_offsets, tile_weight


# -- grid schedule ------------------------------------------------------------

def test_tile_offsets_cover_and_align():
    offs = tile_offsets(10, 4, 2)
    assert offs == (0, 2, 4, 6)  # last tile ends exactly at the extent
    covered = np.zeros(10, bool)
    for o in offs:
        covered[o:o + 4] = True
    assert covered.all()


def test_tile_offsets_non_divisible_extent():
    offs = tile_offsets(11, 4, 3)
    assert offs[-1] == 7 and offs[0] == 0
    assert all(b > a for a, b in zip(offs, offs[1:]))  # strictly ascending
    covered = np.zeros(11, bool)
    for o in offs:
        covered[o:o + 4] = True
    assert covered.all()


def test_tile_offsets_degenerate_and_errors():
    assert tile_offsets(8, 8, 3) == (0,)  # tile == extent: one tile
    with pytest.raises(ValueError, match="larger than image"):
        tile_offsets(6, 8, 2)
    with pytest.raises(ValueError, match="stride"):
        tile_offsets(10, 4, 0)  # overlap >= tile


def test_tile_weight_properties():
    w = tile_weight(8, 6)
    assert w.shape == (8, 6) and w.dtype == np.float32
    assert (w > 0).all()  # clamped: den can never vanish
    np.testing.assert_allclose(w, w[::-1], rtol=1e-6)     # symmetric in H
    np.testing.assert_allclose(w, w[:, ::-1], rtol=1e-6)  # symmetric in W
    assert w[4, 3] >= w.max() * (1 - 1e-6)  # center-weighted


# -- blend exactness ----------------------------------------------------------

def _pointwise_apply(_, tiles_u8):
    """A pointwise 'model': logits depend only on each pixel's own value, so
    every overlapping tile agrees at a pixel and the blend must return the
    direct full-image result exactly (up to one f32 divide rounding)."""
    x = tiles_u8.astype(jnp.float32)
    return jnp.stack([x.sum(-1), 255.0 * 3 - x.sum(-1)], axis=-1)


@pytest.mark.parametrize("hw,tile,ov", [
    ((48, 64), (32, 32), 16),   # 2x3 grid, even overlaps
    ((50, 33), (32, 32), 8),    # non-divisible extents, edge-aligned tiles
    ((32, 32), (32, 32), 16),   # single tile: pure passthrough
])
def test_tiled_pointwise_matches_direct(hw, tile, ov):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8)
    fn = jax.jit(make_tiled_logits_fn(_pointwise_apply, hw, tile, ov))
    blended = np.asarray(fn(None, jnp.asarray(imgs)))
    direct = np.asarray(_pointwise_apply(None, jnp.asarray(imgs)))
    assert blended.shape == direct.shape == (2, *hw, 2)
    np.testing.assert_allclose(blended, direct, rtol=1e-5, atol=1e-3)


def test_tiled_batch_order_not_mixed():
    """Image k's blended logits must come from image k's tiles only — catches
    any tile-major/image-major stacking mismatch."""
    hw, tile = (40, 40), (32, 32)
    imgs = np.zeros((2, *hw, 3), np.uint8)
    imgs[1] += 200  # constant but very different images
    fn = jax.jit(make_tiled_logits_fn(_pointwise_apply, hw, tile, 24))
    out = np.asarray(fn(None, jnp.asarray(imgs)))
    np.testing.assert_allclose(out[0, ..., 0], 0.0, atol=1e-3)
    np.testing.assert_allclose(out[1, ..., 0], 600.0, rtol=1e-5)


# -- SegmentationPredictor integration ---------------------------------------

@pytest.fixture(scope="module")
def tiny_seg_variables():
    from tpu_unet.models import build_model
    from tpu_unet.train import create_train_state, make_optimizer

    model = build_model("seg_unet", n_classes=3, base_features=4)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    return state.params, state.batch_stats


def test_predictor_tiled_native_resolution(tiny_seg_variables):
    from tpu_unet.serve import SegmentationPredictor

    params, bs = tiny_seg_variables
    pred = SegmentationPredictor.from_variables(
        params, bs, num_classes=3, image_size_hw=(48, 64), batch_size=2,
        precision="f32", base_features=4, tile_hw=(32, 32), tile_overlap=16)
    imgs = np.random.default_rng(1).integers(0, 256, (3, 48, 64, 3),
                                             dtype=np.uint8)
    masks, confs = pred.predict_array(imgs)
    assert masks.shape == (3, 48, 64) and masks.dtype == np.uint8
    assert masks.max() < 3
    assert confs.shape == (3,) and np.isfinite(confs).all()
    assert (confs >= 1 / 3 - 1e-6).all() and (confs <= 1 + 1e-6).all()


def test_predictor_single_tile_matches_untiled(tiny_seg_variables):
    """tile == image must reproduce the untiled engine (the blend reduces to
    w*l/w): identical confidences, argmax flips only on float ties."""
    from tpu_unet.serve import SegmentationPredictor

    params, bs = tiny_seg_variables
    kw = dict(num_classes=3, image_size_hw=(32, 32), batch_size=2,
              precision="f32", base_features=4)
    direct = SegmentationPredictor.from_variables(params, bs, **kw)
    tiled = SegmentationPredictor.from_variables(
        params, bs, tile_hw=(32, 32), tile_overlap=16, **kw)
    imgs = np.random.default_rng(2).integers(0, 256, (2, 32, 32, 3),
                                             dtype=np.uint8)
    m1, c1 = direct.predict_array(imgs)
    m2, c2 = tiled.predict_array(imgs)
    np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-6)
    assert (m1 == m2).mean() > 0.999


def test_predictor_tiled_rejects_spatial_sharding(tiny_seg_variables):
    from tpu_unet.serve import SegmentationPredictor

    params, bs = tiny_seg_variables
    with pytest.raises(ValueError, match="n_space"):
        SegmentationPredictor.from_variables(
            params, bs, num_classes=3, image_size_hw=(64, 32), batch_size=2,
            precision="f32", base_features=4, tile_hw=(32, 32), n_space=2)

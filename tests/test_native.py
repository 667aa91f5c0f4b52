"""Native loader-core tests (skipped when the toolchain is unavailable)."""

import numpy as np
import pytest

from tpu_unet.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader core not built (g++ missing)")


def test_resize_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.resize_u8(img, (16, 16)), img)


def test_resize_bilinear_matches_numpy_reference():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 1), dtype=np.uint8)
    out = native.resize_u8(img, (16, 16), mode="bilinear")

    # Half-pixel-center bilinear reference in numpy.
    sh, sw = 8, 8
    dh, dw = 16, 16
    fy = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
    y0 = fy.astype(int); y1 = np.minimum(y0 + 1, sh - 1); wy = fy - y0
    x0 = fx.astype(int); x1 = np.minimum(x0 + 1, sw - 1); wx = fx - x0
    src = img[..., 0].astype(np.float64)
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    ref = top * (1 - wy)[:, None] + bot * wy[:, None]
    np.testing.assert_allclose(out[..., 0].astype(np.float64), ref, atol=1.0)


def test_resize_area_matches_pil_bilinear():
    """'area' mode (the production default, transforms.py) must reproduce PIL's
    widened-triangle BILINEAR resampling within 1 LSB, up- and downscale."""
    from PIL import Image
    rng = np.random.default_rng(3)
    for (sh, sw), (dh, dw) in [((90, 90), (32, 32)), ((130, 50), (96, 48)),
                               ((20, 30), (64, 64)), ((64, 64), (64, 32))]:
        img = rng.integers(0, 256, (sh, sw, 3), dtype=np.uint8)
        ours = native.resize_u8(img, (dh, dw), mode="area")
        theirs = np.asarray(Image.fromarray(img).resize((dw, dh), Image.BILINEAR),
                            np.uint8)
        d = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
        assert d.max() <= 1, (sh, sw, dh, dw, d.max())


def test_load_image_rgb_native_default_matches_pil_within_tolerance(tmp_path):
    """The production loader path (native area default) stays within 1 LSB of the
    PIL path it replaced (TPU_UNET_NATIVE_RESIZE=0 parity guard)."""
    from PIL import Image

    from tpu_unet.data import transforms as T
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    got = T.load_image_rgb(p, (32, 32))
    ref = np.asarray(Image.open(p).convert("RGB").resize((32, 32), Image.BILINEAR),
                     np.uint8)
    d = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    assert d.max() <= 1


def test_resize_nearest_values_preserved():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 4, (10, 10), dtype=np.uint8)
    out = native.resize_u8(img, (20, 20), mode="nearest")
    assert set(np.unique(out)) <= set(np.unique(img))
    assert out.shape == (20, 20)


def test_fill_polygon_close_to_pil():
    from PIL import Image, ImageDraw
    pts = [(5.0, 5.0), (30.0, 8.0), (20.0, 35.0)]
    ours = np.zeros((40, 40), np.uint8)
    native.fill_polygon(ours, pts)
    im = Image.new("L", (40, 40), 0)
    ImageDraw.Draw(im).polygon(pts, fill=1)
    pil = np.asarray(im)
    # Interiors agree; only boundary-rule pixels may differ (PIL draws outlines).
    mismatch = int((ours != pil).sum())
    assert mismatch <= 0.1 * max(pil.sum(), 1)
    # Interior erosion of the PIL mask must be entirely covered by ours.
    core = pil[1:-1, 1:-1] & pil[:-2, 1:-1] & pil[2:, 1:-1] & pil[1:-1, :-2] & pil[1:-1, 2:]
    assert np.all(ours[1:-1, 1:-1][core.astype(bool)] == 1)

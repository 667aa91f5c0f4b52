"""Host-side decode & resize (the only work left on the host).

Design (BASELINE.json north_star): the host decodes and resizes to the fixed target
shape as uint8; every random/float transform (normalize, paired augs) runs on device
inside the jitted step (tpu_unet.ops.augment). Shipping uint8 quarters the
host->device transfer volume vs the reference's float32 CHW tensors.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image

# Native resize (native/loader_core.cpp), DEFAULT ON: 'area' mode implements the
# same widened-triangle-filter resampling as PIL's BILINEAR (alias-free downscale;
# validated within ±1 LSB of PIL across shapes, tests/test_native.py) at ~2.2x
# PIL's speed on the 900²→256² MVTec downscale, GIL-free. Set
# TPU_UNET_NATIVE_RESIZE=0 to force the PIL path.
_USE_NATIVE = os.environ.get("TPU_UNET_NATIVE_RESIZE", "1") == "1"


def resize_backend_tag() -> str:
    """Identifies the active image resampler ('native-area-vN' | 'pil-bilinear').

    Included in disk-pack fingerprints so toggling TPU_UNET_NATIVE_RESIZE (or a
    host without g++) never serves pixels produced by the other backend.
    """
    if _USE_NATIVE:
        from tpu_unet.data import native
        if native.available():
            return f"native-area-v{native._EXPECTED_VERSION}"
    return "pil-bilinear"


def load_image_rgb(path: str, size_hw: Tuple[int, int]) -> np.ndarray:
    """Decode an image to RGB and area-resize to (H, W); returns (H,W,3) uint8."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        h, w = size_hw
        if im.size == (w, h):  # PIL size is (W, H)
            return np.asarray(im, dtype=np.uint8)
        if _USE_NATIVE:
            from tpu_unet.data import native
            if native.available():
                return native.resize_u8(np.asarray(im, np.uint8), (h, w), "area")
        return np.asarray(im.resize((w, h), Image.BILINEAR), dtype=np.uint8)


def load_mask(path: str, size_hw: Tuple[int, int], binarize: bool = False,
              method: str = "nearest") -> np.ndarray:
    """Decode a grayscale mask, resize to (H, W); returns (H,W) uint8.

    binarize=True maps any nonzero value to 1 (MVTec ground-truth masks,
    /root/reference/src/dataset.py:100-103).

    method='nearest' (default) binarizes then nearest-resizes — no invented
    values, correct for multi-class label maps. method='bilinear' is the MVTec
    eval-parity mode reproducing the reference raster geometry
    (/root/reference/src/dataset.py:100-106,149-152: binarize to {0,1}, then
    transforms.Resize's default BILINEAR, whose uint8 rounding thresholds the
    interpolated edge at 0.5) — boundary pixels can differ from 'nearest' by
    one pixel of anti-aliased growth/shrink. Only meaningful with binarize=True.
    """
    with Image.open(path) as im:
        im = im.convert("L")
        h, w = size_hw
        if method == "bilinear" and binarize:
            arr = (np.asarray(im, dtype=np.uint8) > 0).astype(np.uint8)
            im = Image.fromarray(arr, mode="L")
            if im.size != (w, h):
                im = im.resize((w, h), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)
        if im.size != (w, h):
            im = im.resize((w, h), Image.NEAREST)
        arr = np.asarray(im, dtype=np.uint8)
    if binarize:
        arr = (arr > 0).astype(np.uint8)
    return arr


def resize_mask_array(mask: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-resize a (H,W) uint8 label map already in memory."""
    h, w = size_hw
    if mask.shape == (h, w):
        return mask
    im = Image.fromarray(mask, mode="L")
    return np.asarray(im.resize((w, h), Image.NEAREST), dtype=np.uint8)

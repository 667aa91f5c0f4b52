"""Tiled full-resolution inference: fixed-shape tile programs + overlap blend.

The reference resizes every image to the training shape before inference
(/root/reference/src/dataset.py:91-127 — KolektorSDD's native 1408x512 and
MVTec's 900^2 are downsampled to 1024x512 / 256^2), discarding resolution that
industrial surface inspection often needs (sub-pixel scratches; see
tests/test_data.py::test_load_mask_bilinear_parity_mode for what a 1-px defect
loses to resizing). This module serves images at NATIVE resolution instead —
beyond-reference capability, designed TPU-first:

- the tile grid is STATIC (python ints at trace time), so the whole pipeline —
  slice tiles -> batch them through the conv stack -> weighted blend back —
  is ONE fixed-shape XLA program with no dynamic shapes anywhere;
- tiles are extracted with static strided slices and stacked into the model's
  BATCH dimension, so a single full-res image still fills the MXU the way a
  batch of training crops does;
- the overlap blend is numerator/denominator accumulation with a separable
  triangular window: `num += w * tile_logits` via static-index scatter-adds,
  `den` is a trace-time numpy CONSTANT (it depends only on the grid), and
  edge tiles need no special casing — dividing by the accumulated weight
  renormalizes wherever fewer tiles overlap (the standard sliding-window
  blend, cf. MONAI's sliding_window_inference).

Works with any logits-producing tile forward: the float/BN-folded apply, the
int8 PTQ forward, and UNet++ pruned heads all plug in unchanged because the
contract is just ``(variables, tiles_u8 (M,th,tw,3)) -> (M,th,tw,C)``.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["tile_offsets", "tile_weight", "make_tiled_logits_fn"]


def tile_offsets(extent: int, tile: int, stride: int) -> Tuple[int, ...]:
    """Tile start offsets covering ``[0, extent)``, last tile edge-aligned.

    Offsets advance by ``stride`` and the final tile is shifted back to end
    exactly at ``extent`` (the standard sliding-window schedule), so coverage
    is complete without padding and every offset is a trace-time constant.
    """
    extent, tile, stride = int(extent), int(tile), int(stride)
    if tile > extent:
        raise ValueError(f"tile ({tile}) larger than image extent ({extent})")
    if stride <= 0:
        raise ValueError(f"stride must be positive (got {stride}; is the "
                         "overlap >= the tile size?)")
    if tile == extent:
        return (0,)
    offs = list(range(0, extent - tile, stride))
    offs.append(extent - tile)
    return tuple(offs)


def tile_weight(tile_h: int, tile_w: int) -> np.ndarray:
    """(th, tw) f32 separable triangular blend window, center-weighted.

    Peaks at the tile center and decays toward the edges, so in overlap
    regions the tile whose center is nearer a pixel dominates — conv
    predictions are least reliable near their receptive-field-truncated
    borders. Clamped away from zero so the den accumulator can never vanish
    at tile corners.
    """
    def ramp(n: int) -> np.ndarray:
        x = (np.arange(n, dtype=np.float32) + 0.5) / n  # pixel centers in (0,1)
        return 2.0 * np.minimum(x, 1.0 - x)

    w = np.outer(ramp(int(tile_h)), ramp(int(tile_w)))
    return np.maximum(w, 1e-3).astype(np.float32)


def make_tiled_logits_fn(
    tile_apply: Callable,
    image_hw: Sequence[int],
    tile_hw: Sequence[int],
    overlap: int = 64,
) -> Callable:
    """Build ``fn(variables, images_u8 (N,H,W,3)) -> (N,H,W,C) f32 logits``.

    ``tile_apply(variables, tiles_u8 (M,th,tw,3)) -> (M,th,tw,C)`` is the
    fixed-shape tile forward (float apply, int8 forward, ...). The returned
    function slices the static tile grid out of each image, runs ALL tiles of
    ALL images as one model batch (M = N * n_tiles), and blends the per-tile
    logits back to full resolution with the triangular window; pixels covered
    by one tile pass through exactly (num/den == logits there).
    """
    h, w = (int(x) for x in image_hw)
    th, tw = (int(x) for x in tile_hw)
    overlap = int(overlap)
    if overlap < 0:
        raise ValueError(f"overlap must be >= 0 (got {overlap})")
    ys = tile_offsets(h, th, th - overlap)
    xs = tile_offsets(w, tw, tw - overlap)
    grid = [(oy, ox) for oy in ys for ox in xs]
    w_np = tile_weight(th, tw)
    den = np.zeros((h, w), np.float32)
    for oy, ox in grid:
        den[oy:oy + th, ox:ox + tw] += w_np
    inv_den = (1.0 / den).astype(np.float32)  # trace-time constant

    def fn(variables, images_u8):
        n = images_u8.shape[0]
        # Tile-major stacking: logits[i*n:(i+1)*n] are grid[i]'s tiles for
        # every image, matching the concatenate order below.
        tiles = jnp.concatenate(
            [images_u8[:, oy:oy + th, ox:ox + tw, :] for oy, ox in grid],
            axis=0)
        logits = tile_apply(variables, tiles)
        c = logits.shape[-1]
        wt = jnp.asarray(w_np)[None, :, :, None]
        num = jnp.zeros((n, h, w, c), jnp.float32)
        for i, (oy, ox) in enumerate(grid):
            tl = logits[i * n:(i + 1) * n].astype(jnp.float32) * wt
            num = num.at[:, oy:oy + th, ox:ox + tw, :].add(tl)
        return num * jnp.asarray(inv_den)[None, :, :, None]

    return fn

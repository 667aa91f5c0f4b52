"""Shared --quantize/--qparams/--calib_dir resolution for the serving CLIs
(serve_mvtec, serve_seg, tools/export_serving).

One semantics everywhere: an existing --qparams .npz is loaded and skips
calibration; otherwise int8 requires --calib_dir, and the freshly calibrated
scales are written back to --qparams (when given) after the engine is built
(:func:`maybe_save_qparams`).
"""

from __future__ import annotations

import os

import numpy as np


def resolve_quantization(args, size_hw):
    """Map the CLI quantization flags to engine-constructor inputs.

    Returns ``(quantize, calib_images, qparams_tree)`` where ``quantize`` is
    the engine tag (None or 'int8'), ``calib_images`` is a uint8 (N,H,W,3)
    stack for calibration, and ``qparams_tree`` is a pre-quantized param tree
    loaded from --qparams. At most one of the last two is non-None.
    """
    quantize = None if args.quantize == "none" else args.quantize
    if quantize != "int8":
        return quantize, None, None
    if args.qparams and os.path.exists(args.qparams):
        from tpu_unet.ops.quantize import load_qparams
        qparams_tree = load_qparams(args.qparams)
        print(f"Loaded quantized params from {args.qparams} (no calibration)")
        return quantize, None, qparams_tree
    if not args.calib_dir:
        raise SystemExit("--quantize int8 requires --calib_dir (in-domain "
                         "images, e.g. the category's train/good) or an "
                         "existing --qparams .npz")
    from tpu_unet.data.transforms import load_image_rgb
    from tpu_unet.utils.io import list_calibration_images
    calib_paths = list_calibration_images(args.calib_dir)[:args.calib_samples]
    if not calib_paths:
        raise SystemExit(f"no calibration images under {args.calib_dir}")
    calib_images = np.stack([load_image_rgb(p, size_hw) for p in calib_paths])
    print(f"Calibrated int8 scales on {len(calib_paths)} images")
    return quantize, calib_images, None


def maybe_save_qparams(args, engine, qparams_tree) -> None:
    """Persist freshly calibrated scales when --qparams named a new file."""
    if args.quantize == "int8" and args.qparams and qparams_tree is None:
        from tpu_unet.ops.quantize import save_qparams
        save_qparams(engine._params, args.qparams)
        print(f"Quantized params saved to {args.qparams}")

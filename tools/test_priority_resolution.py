#!/usr/bin/env python3
"""Integration check of the Gear priority-based overlap resolution on real data.

Capability parity with /root/reference/test_priority_resolution.py:11-93: loads the
real splits with priority logging enabled, prints per-split resolution statistics,
and saves sample mask PNGs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from tpu_unet.data.gear import GearDataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--output_dir", type=str, default="priority_resolution_samples")
    parser.add_argument("--samples", type=int, default=4)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        try:
            ds = GearDataset(args.data_root, split,
                             (args.image_size, args.image_size),
                             enable_priority_logging=True)
        except ValueError as e:
            print(f"[{split}] skipped: {e}")
            continue
        n = min(args.samples, len(ds))
        for i in range(len(ds) if len(ds) < 50 else 50):
            ds.load(i)  # triggers rasterization + stats
        ds.print_priority_stats()
        for i in range(n):
            mask = ds.load(i)["mask"].astype(np.uint8)
            # Scale ids for visibility: 0/85/170/255.
            Image.fromarray(mask * 85).save(
                os.path.join(args.output_dir, f"{split}_sample{i}_mask.png"))
        print(f"[{split}] saved {n} sample masks to {args.output_dir}")


if __name__ == "__main__":
    main()

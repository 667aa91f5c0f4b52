#!/usr/bin/env python3
"""Scan Gear label files and count polygon instances per class.

Capability parity with /root/reference/analyze_classes.py:11-92: walks
labels/<split>/*.txt, counts instances per original class id, prints per-split and
total tables plus the id remapping (pitting 0->1, spalling 1->2, scrape 2->3).
"""

from __future__ import annotations

import argparse
import os
from collections import Counter

from tpu_unet.data.gear import CLASS_ID_TO_FINAL_ID, CLASS_NAMES_MAP, parse_label_file


def analyze(root_dir: str):
    totals = Counter()
    print(f"Analyzing Gear labels under {root_dir}\n")
    for split in ("train", "val", "test"):
        labels_dir = os.path.join(root_dir, "labels", split)
        if not os.path.isdir(labels_dir):
            continue
        counts = Counter()
        n_files = 0
        for name in sorted(os.listdir(labels_dir)):
            if not name.endswith(".txt"):
                continue
            n_files += 1
            for class_id, _ in parse_label_file(os.path.join(labels_dir, name)):
                counts[class_id] += 1
        totals.update(counts)
        print(f"[{split}] {n_files} label files")
        for cid in sorted(counts):
            print(f"  class {cid} ({CLASS_NAMES_MAP.get(cid, '?'):8s}): "
                  f"{counts[cid]:5d} polygons")
    print("\nTotals:")
    for cid in sorted(totals):
        print(f"  class {cid} ({CLASS_NAMES_MAP.get(cid, '?'):8s}): {totals[cid]:5d}")
    print("\nClass id remapping (original -> final mask id):")
    print("  background -> 0")
    for cid, fid in CLASS_ID_TO_FINAL_ID.items():
        print(f"  {CLASS_NAMES_MAP[cid]:8s} {cid} -> {fid}")
    return totals


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="datasets/Gear")
    analyze(parser.parse_args().data_root)

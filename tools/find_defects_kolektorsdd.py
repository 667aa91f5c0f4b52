#!/usr/bin/env python3
"""List KolektorSDD samples whose masks contain defects, with percentage stats.

Capability parity with /root/reference/find_defects_kolektorsdd.py:10-72.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def find_defects(root_dir: str):
    defective = []
    total = 0
    for folder in sorted(os.listdir(root_dir)):
        fpath = os.path.join(root_dir, folder)
        if not (folder.startswith("kos") and os.path.isdir(fpath)):
            continue
        for name in sorted(os.listdir(fpath)):
            if not name.endswith("_label.bmp"):
                continue
            total += 1
            mask = np.asarray(Image.open(os.path.join(fpath, name)).convert("L"))
            n_defect = int((mask > 0).sum())
            if n_defect > 0:
                defective.append((os.path.join(folder, name), n_defect,
                                  100.0 * n_defect / mask.size))

    print(f"Scanned {total} masks; {len(defective)} contain defects "
          f"({100.0 * len(defective) / max(total, 1):.1f}%)\n")
    for path, n_px, pct in defective:
        print(f"  {path}: {n_px:6d} defect px ({pct:.3f}%)")
    if defective:
        pcts = np.asarray([d[2] for d in defective])
        print(f"\nDefect percentage stats: mean {pcts.mean():.3f}%, "
              f"median {np.median(pcts):.3f}%, max {pcts.max():.3f}%")
    return defective


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="datasets/KolektorSDD")
    find_defects(parser.parse_args().data_root)

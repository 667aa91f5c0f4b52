#!/usr/bin/env python3
"""Measure the reference PyTorch stack's single-CPU training throughput.

Runs the reference's own model + loss (/root/reference/src/model.py,
src/train_utils.py) on synthetic MVTec-shaped data (batch 16, 256px) for a few
optimizer steps and records images/sec into BASELINE_MEASURED.json. The reference
publishes no benchmark numbers (BASELINE.md), so this self-measured number is the
baseline bench.py compares against.

Usage: python tools/measure_reference_baseline.py [--steps N] [--batch B] [--size S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REFERENCE_SRC = "/root/reference/src"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()

    import torch
    sys.path.insert(0, REFERENCE_SRC)
    from model import AnomalyUNet            # reference code, executed as-is
    from train_utils import CombinedLoss

    torch.manual_seed(0)
    device = torch.device("cpu")
    model = AnomalyUNet(n_channels=3).to(device)
    model.train()
    criterion = CombinedLoss()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)

    images = torch.randn(args.batch, 3, args.size, args.size)
    masks = torch.zeros(args.batch, 1, args.size, args.size)

    def one_step():
        recon, amap = model(images)
        loss = criterion(recon, amap, images, masks)["total_loss"]
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

    for _ in range(args.warmup):
        one_step()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        one_step()
    dt = time.perf_counter() - t0

    ips = args.batch * args.steps / dt
    out = {
        "train_images_per_sec_cpu": round(ips, 4),
        "seconds_per_step": round(dt / args.steps, 4),
        "batch": args.batch,
        "image_size": args.size,
        "steps": args.steps,
        "hardware": f"CPU x{os.cpu_count()}",
        "source": "reference AnomalyUNet + CombinedLoss (MSE+focal), Adam, synthetic data",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Host input-pipeline benchmark: decode+resize+collate throughput.

Quantifies the host half of the training loop (the device half is bench.py):
cold-epoch (PIL decode + resize) and warm-epoch (RAM sample cache) batches/sec for
a dataset, with and without the native C++ resize core.

Usage: python tools/bench_input_pipeline.py --dataset mvtec --data_root ... \
           [--image_size 256] [--batch_size 16] [--num_workers 8]
"""

from __future__ import annotations

import argparse
import time


def bench_loader(dataset, batch_size, num_workers, epochs=2):
    from tpu_unet.data.loader import DataLoader

    loader = DataLoader(dataset, batch_size, shuffle=True,
                        num_workers=num_workers)
    results = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        results.append((n / dt, dt))
    return results


def make_dataset(args, disk_cache_dir):
    if args.dataset == "mvtec":
        from tpu_unet.data.mvtec import MVTecDataset
        return MVTecDataset(args.data_root, args.category, "train",
                            args.image_size, disk_cache_dir=disk_cache_dir)
    if args.dataset == "gear":
        from tpu_unet.data.gear import GearDataset
        return GearDataset(args.data_root, "train",
                           (args.image_size, args.image_size),
                           disk_cache_dir=disk_cache_dir)
    from tpu_unet.data.kolektorsdd import KolektorSDDDataset
    return KolektorSDDDataset(args.data_root, "train",
                              (args.image_height, args.image_width),
                              disk_cache_dir=disk_cache_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="mvtec",
                        choices=["mvtec", "gear", "kolektorsdd"])
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--category", type=str, default="bottle")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--image_height", type=int, default=1024)
    parser.add_argument("--image_width", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--disk_cache_dir", default=None,
                        help="measure the persistent pack path too (dir for packs)")
    args = parser.parse_args()

    ds = make_dataset(args, disk_cache_dir=None)
    print(f"{args.dataset}: {len(ds)} samples, batch {args.batch_size}, "
          f"{args.num_workers} workers")
    results = bench_loader(ds, args.batch_size, args.num_workers)
    for i, (ips, dt) in enumerate(results):
        kind = "cold (decode)" if i == 0 else "warm (RAM cache)"
        print(f"epoch {i} [{kind}]: {ips:.1f} images/sec ({dt:.2f}s)")

    if args.disk_cache_dir:
        t0 = time.perf_counter()
        ds = make_dataset(args, disk_cache_dir=args.disk_cache_dir)
        print(f"pack build (decode once): {time.perf_counter() - t0:.2f}s")
        # A fresh dataset instance = what a new CLI process sees with the pack on disk.
        ds = make_dataset(args, disk_cache_dir=args.disk_cache_dir)
        (ips, dt), = bench_loader(ds, args.batch_size, args.num_workers, epochs=1)
        print(f"fresh process w/ disk pack: {ips:.1f} images/sec ({dt:.2f}s)")


if __name__ == "__main__":
    main()

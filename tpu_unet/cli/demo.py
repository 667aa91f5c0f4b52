#!/usr/bin/env python3
"""Environment smoke test (parity with /root/reference/src/demo.py):
dataset load -> model forward shapes -> sample grid PNG. Works on synthetic data
when no dataset path is supplied."""

from __future__ import annotations

import argparse
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="tpu_unet environment smoke test")
    parser.add_argument("--data_root", type=str, default=None,
                        help="MVTec root (default: generate a tiny synthetic set)")
    parser.add_argument("--category", type=str, default="bottle")
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--output", type=str, default="demo_samples.png")
    return parser.parse_args(argv)


def _make_synthetic(root, category, size):
    from PIL import Image
    rng = np.random.default_rng(0)
    for sub in (f"{category}/train/good", f"{category}/test/good",
                f"{category}/test/scratch", f"{category}/ground_truth/scratch"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(4):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, category, "train/good", f"{i}.png"))
        Image.fromarray(img).save(os.path.join(root, category, "test/good", f"{i}.png"))
        Image.fromarray(img).save(os.path.join(root, category, "test/scratch", f"{i}.png"))
        m = np.zeros((size, size), np.uint8)
        m[8:16, 8:16] = 255
        Image.fromarray(m).save(
            os.path.join(root, category, "ground_truth/scratch", f"{i}_mask.png"))
    return root


def main(argv=None):
    args = parse_args(argv)
    print(f"JAX {jax.__version__}; devices: {jax.devices()}")

    root = args.data_root
    if root is None:
        root = _make_synthetic(tempfile.mkdtemp(prefix="tpu_unet_demo_"),
                               args.category, args.image_size)
        print(f"Using synthetic dataset at {root}")

    from tpu_unet.data.loader import DataLoader
    from tpu_unet.data.mvtec import MVTecDataset
    from tpu_unet.models import AnomalyUNet, UNet
    from tpu_unet.ops.augment import eval_transform

    ds = MVTecDataset(root, args.category, "test", args.image_size, is_train=False)
    print(f"Dataset: {len(ds)} test samples")
    loader = DataLoader(ds, batch_size=4, pad_last=True, num_workers=2)
    batch = next(iter(loader))
    print(f"Batch image {batch['image'].shape} {batch['image'].dtype}, "
          f"mask {batch['mask'].shape}")

    x = eval_transform(jnp.asarray(batch["image"]))
    model = UNet(n_classes=1, base_features=8)
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    print(f"UNet forward: {x.shape} -> {logits.shape}")

    amodel = AnomalyUNet(base_features=8)
    avars = amodel.init(jax.random.key(0), x, train=False)
    recon, amap = amodel.apply(avars, x, train=False)
    print(f"AnomalyUNet forward: recon {recon.shape}, anomaly_map {amap.shape}")

    from tpu_unet.utils.viz import visualize_results
    visualize_results(np.asarray(x), batch["mask"][..., 0],
                      np.asarray(amap)[..., 0], np.asarray(recon),
                      save_path=args.output, max_samples=4)
    print("Demo completed successfully!")
    return True


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Convert a tpu_unet Orbax checkpoint into a reference PyTorch .pth.

The inverse of tools/import_torch_checkpoint.py: models trained with this
framework can be evaluated/visualized by the reference stack (the .pth has the
reference's {epoch, model_state_dict, optimizer_state_dict, loss} layout,
/root/reference/src/utils.py:37-58; BatchNorm running stats are carried over).

Usage:
  python tools/export_torch_checkpoint.py \
      --checkpoint outputs/<exp>/checkpoints/best_model \
      --model anomaly_unet --output best_model.pth
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Orbax checkpoint directory")
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "seg_unet", "anomaly_unet"])
    parser.add_argument("--n_classes", type=int, default=1,
                        help="(unet/seg_unet) output classes")
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--base_features", type=int, default=64,
                        help="UNet width the checkpoint was trained with (64 = reference)")
    parser.add_argument("--output", type=str, required=True, help=".pth to write")
    args = parser.parse_args(argv)

    from tpu_unet.models import build_model
    from tpu_unet.train import create_train_state, load_params, make_optimizer
    from tpu_unet.utils.torch_import import save_torch_checkpoint

    model = build_model(args.model, n_classes=args.n_classes, bilinear=args.bilinear,
                        base_features=args.base_features)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0),
                               (1, args.image_size, args.image_size, 3), tx)
    print(f"Loading Orbax checkpoint: {args.checkpoint}")
    state = load_params(state, args.checkpoint)

    save_torch_checkpoint(args.output, jax.device_get(state.params),
                          jax.device_get(state.batch_stats),
                          model=args.model, bilinear=args.bilinear)
    print(f"Wrote reference-layout torch checkpoint: {args.output}")
    return args.output


if __name__ == "__main__":
    main()

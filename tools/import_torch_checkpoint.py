#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint (.pth) into a tpu_unet Orbax checkpoint.

Migration path for users of the reference stack: weights trained with
/root/reference/src/train.py (or the Gear/KolektorSDD trainers) load directly into
this framework's eval/visualize/serve CLIs. Forward-pass numerics parity is
tested in tests/test_torch_import.py.

Usage:
  python tools/import_torch_checkpoint.py --torch_checkpoint best_model.pth \
      --model anomaly_unet --image_size 256 --output outputs/imported/best_model
"""

from __future__ import annotations

import argparse

import jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_checkpoint", type=str, required=True)
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "seg_unet", "anomaly_unet"])
    parser.add_argument("--n_classes", type=int, default=1,
                        help="(unet/seg_unet) output classes")
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--image_size", type=int, default=256,
                        help="Spatial size used to initialize the optimizer state")
    parser.add_argument("--base_features", type=int, default=64,
                        help="UNet width of the checkpoint (64 = reference)")
    parser.add_argument("--output", type=str, required=True,
                        help="Orbax checkpoint directory to write")
    args = parser.parse_args()

    from tpu_unet.models import build_model
    from tpu_unet.train import create_train_state, make_optimizer, save_checkpoint
    from tpu_unet.utils.torch_import import load_torch_checkpoint

    print(f"Loading torch checkpoint: {args.torch_checkpoint}")
    params, batch_stats = load_torch_checkpoint(
        args.torch_checkpoint, model=args.model, bilinear=args.bilinear)

    model = build_model(args.model, n_classes=args.n_classes, bilinear=args.bilinear,
                        base_features=args.base_features)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0),
                               (1, args.image_size, args.image_size, 3), tx)

    # Structure AND shape check against a fresh init (a path-only check would
    # silently accept a checkpoint trained at a different --base_features).
    ref_paths = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_leaves_with_path(state.params)}
    new_paths = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_leaves_with_path(params)}
    if ref_paths != new_paths:
        missing = sorted(set(ref_paths) - set(new_paths))[:5]
        extra = sorted(set(new_paths) - set(ref_paths))[:5]
        shape_diffs = sorted(k for k in set(ref_paths) & set(new_paths)
                             if ref_paths[k] != new_paths[k])[:5]
        raise SystemExit("Parameter tree mismatch (check --model/--base_features/"
                         f"--bilinear).\n  missing: {missing}\n  extra: {extra}\n"
                         f"  shape diffs: {shape_diffs}")

    import jax.numpy as jnp
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
    batch_stats = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), batch_stats)
    state = state.replace(params=params, batch_stats=batch_stats)

    save_checkpoint(state, epoch=0, loss=0.0, path=args.output)
    print(f"Imported checkpoint written to {args.output}")
    print("Use it with the test/visualize CLIs via --checkpoint.")


if __name__ == "__main__":
    main()

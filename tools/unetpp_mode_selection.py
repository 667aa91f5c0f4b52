#!/usr/bin/env python3
"""UNet++ deep-supervision mode selection: accuracy vs cost per pruned level.

The UNet++ paper's deployment workflow (arXiv:1912.05074 §V): train ONE
deep-supervision model, evaluate every pruned level X[0][k] on the validation
split, then serve the level whose accuracy/cost point fits the budget. This
tool runs that workflow end-to-end on a trained checkpoint:

  for k in 1..4: val mIoU/Dice/pixel-acc at --heads k (k=4 = accurate mode)
  plus each level's serving throughput (SegmentationPredictor, device img/s)
  and the compiled forward's FLOPs (XLA cost analysis — the DCE receipt).

Usage:
  python tools/unetpp_mode_selection.py --data_root datasets/Gear \
      --checkpoint outputs/<exp>/checkpoints/best_model [--image_size 512]
  # or, self-contained demo on a synthetic tree (used for the committed
  # artifact tools/unetpp_mode_selection_result.json):
  python tools/unetpp_mode_selection.py --synthetic

Prints one JSON line {"heads{k}": {mean_iou, dice, flops, serving_img_s}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--base_features", type=int, default=32)
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--serving_batches", type=int, default=5,
                   help="0 disables the per-level throughput measurement")
    p.add_argument("--synthetic", action="store_true",
                   help="Self-contained demo: make a synthetic gear tree, "
                        "train a small DS model, then run the selection")
    p.add_argument("--epochs", type=int, default=20,
                   help="--synthetic only: training epochs")
    p.add_argument("--out", type=str, default=None,
                   help="Also write the result JSON here")
    args = p.parse_args(argv)

    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np

    tmp = None
    if args.synthetic:
        tmp = tempfile.mkdtemp(prefix="unetpp_modesel_")
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from test_data import make_gear
        args.data_root = make_gear(os.path.join(tmp, "gear"), n_per_split=16,
                                   size=64)
        args.image_size = 64
        args.base_features = 8
        from tpu_unet.cli.train_gear import main as train_main
        exp = train_main([
            "--data_root", args.data_root, "--image_size", "64",
            "--epochs", str(args.epochs), "--batch_size", "8",
            "--val_freq", "5", "--base_features", "8",
            "--model", "unetpp", "--deep_supervision",
            "--save_dir", os.path.join(tmp, "out"),
        ])
        args.checkpoint = os.path.join(exp, "checkpoints", "best_model")
    if not (args.data_root and args.checkpoint):
        raise SystemExit("--data_root and --checkpoint required "
                         "(or --synthetic)")

    from tpu_unet.cli.test_gear import main as test_main
    from tpu_unet.models.unetpp import UNetPlusPlus
    from tpu_unet.serve import SegmentationPredictor
    from tpu_unet.train import create_train_state, make_optimizer

    s = args.image_size
    results = {}
    for k in (4, 3, 2, 1):
        with tempfile.TemporaryDirectory() as td:
            ev = test_main([
                "--data_root", args.data_root, "--image_size", str(s),
                "--batch_size", str(args.batch_size),
                "--checkpoint", args.checkpoint,
                "--base_features", str(args.base_features),
                "--model", "unetpp", "--deep_supervision",
                "--heads", str(k), "--split", args.split,
                "--output_dir", td,
            ])
        row = {
            "mean_iou": round(float(ev["overall_metrics"]["mean_iou"]), 4),
            "mean_dice": round(float(ev["overall_metrics"]["mean_dice"]), 4),
            "pixel_accuracy": round(
                float(ev["overall_metrics"]["pixel_accuracy"]), 4),
        }
        # DCE receipt: the pruned eval forward's compiled FLOPs.
        model = UNetPlusPlus(n_classes=args.num_classes,
                             base_features=args.base_features,
                             deep_supervision=True, heads=k)
        st = create_train_state(model, jax.random.key(0), (1, s, s, 3),
                                make_optimizer("adam", 1e-3, 0.0))
        fn = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False))
        c = fn.lower({"params": st.params, "batch_stats": st.batch_stats},
                     np.zeros((args.batch_size, s, s, 3),
                              np.float32)).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        row["fwd_gflops"] = round(float(ca.get("flops", 0.0)) / 1e9, 2)
        if args.serving_batches > 0:
            pred = SegmentationPredictor.from_checkpoint(
                args.checkpoint, num_classes=args.num_classes,
                image_size_hw=(s, s), batch_size=args.batch_size,
                base_features=args.base_features, model_name="unetpp",
                deep_supervision=True, heads=k)
            row["serving_img_s"] = round(
                pred.throughput(args.serving_batches), 1)
            del pred
        results[f"heads{k}"] = row
        print(f"heads={k}: {row}", file=sys.stderr, flush=True)

    out = {"metric": "unetpp_mode_selection", "image_size": s,
           "split": args.split, "checkpoint": args.checkpoint,
           "synthetic": bool(args.synthetic), "results": results}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()

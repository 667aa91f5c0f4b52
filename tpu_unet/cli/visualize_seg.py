#!/usr/bin/env python3
"""Visualize segmentation results for Gear / KolektorSDD (TPU-native).

Capability parity with /root/reference/visualize.py and
visualize_kolektorsdd.py: transparent class-colored overlays, side-by-side grids,
per-sample confidence (softmax max-prob) maps, and GT-vs-pred class-distribution
bar charts. One CLI serves both workloads via --dataset.
(The reference's visualize_kolektorsdd.py does not even compile — IndentationError
at :29, SURVEY.md §2.11.)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.loader import DataLoader
from tpu_unet.models import build_model
from tpu_unet.ops.augment import eval_transform
from tpu_unet.parallel import make_mesh, replicate, shard_batch
from tpu_unet.train import create_train_state, load_params, make_optimizer
from tpu_unet.utils.viz import _plt, denormalize_image, overlay_segmentation


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Visualize segmentation results")
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["gear", "kolektorsdd"])
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--image_size", type=int, default=512, help="(gear)")
    parser.add_argument("--image_height", type=int, default=1024, help="(kolektorsdd)")
    parser.add_argument("--image_width", type=int, default=512, help="(kolektorsdd)")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--model", type=str, default="seg_unet",
                        choices=["unet", "seg_unet", "unetpp", "attn_unet"])
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--deep_supervision", action="store_true",
                        help="UNet++ only: rebuild the deep-supervision heads "
                             "(must match how the checkpoint was trained)")
    parser.add_argument("--heads", type=int, default=4,
                        help="UNet++ deep-supervision inference mode: 4 = "
                             "averaged accurate mode; k<4 = the paper's "
                             "pruned fast mode (single head X[0][k]; "
                             "deeper columns DCE'd) — evaluate each k to "
                             "choose the accuracy/cost point")
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_dir", "--output_dir", dest="output_dir", type=str,
                        default=None, help="Default: derived from the checkpoint path")
    parser.add_argument("--num_samples", "--max_samples", dest="num_samples",
                        type=int, default=10,
                        help="Number of samples to visualize (first N, like the reference)")
    parser.add_argument("--save_individual", action="store_true",
                        help="Save individual prediction panels (only these when "
                             "given without --save_grid)")
    parser.add_argument("--save_grid", action="store_true",
                        help="Save a grid visualization (only this when given "
                             "without --save_individual)")
    parser.add_argument("--always_save", action="store_true",
                        help="Render both outputs regardless of the selectors "
                             "(also the default when neither selector is given — "
                             "the reference's always_save=True behavior)")
    parser.add_argument("--show_confidence", action="store_true",
                        help="Add the softmax max-prob confidence map to each panel")
    parser.add_argument("--figsize", type=float, nargs=2, default=[15, 5])
    parser.add_argument("--grid_size", type=int, nargs=2, default=[2, 5],
                        help="Grid rows x cols")
    parser.add_argument("--alpha", type=float, default=0.5, help="Overlay opacity")
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--base_features", type=int, default=64)
    return parser.parse_args(argv)


def build_dataset(args):
    if args.dataset == "gear":
        from tpu_unet.data.gear import GearDataset
        size = (args.image_size, args.image_size)
        ds = GearDataset(args.data_root, args.split, size)
        return ds, ds.num_classes, ["background"] + ds.class_names, size
    from tpu_unet.data.kolektorsdd import CLASS_NAMES, KolektorSDDDataset
    size = (args.image_height, args.image_width)
    ds = KolektorSDDDataset(args.data_root, args.split, size)
    return ds, ds.num_classes, list(CLASS_NAMES), size


def main(argv=None):
    args = parse_args(argv)
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)
    plt = _plt()

    output_dir = args.output_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(args.checkpoint))),
        "visualizations")
    os.makedirs(output_dir, exist_ok=True)

    ds, num_classes, class_names, (h, w) = build_dataset(args)
    mesh = make_mesh(n_data=args.n_devices)
    to_device = lambda b: {k: (shard_batch(mesh, v) if hasattr(v, "shape") else v)
                           for k, v in b.items()}
    loader = DataLoader(ds, args.batch_size, pad_last=True,
                        num_workers=args.num_workers, transform=to_device)

    policy = get_policy(args.precision)
    # heads only selects the eval return value (the full param tree inits and
    # restores regardless), so the pruned model IS the restore template.
    model = build_model(args.model, n_channels=3, n_classes=num_classes,
                        bilinear=args.bilinear, dropout=args.dropout, policy=policy,
                        base_features=args.base_features,
                        deep_supervision=args.deep_supervision, heads=args.heads)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0), (1, h, w, 3), tx)
    state = replicate(mesh, state)
    state = load_params(state, args.checkpoint)
    if args.heads != 4:
        print(f"Pruned fast mode: visualizing head X[0][{args.heads}]")

    @jax.jit
    def infer(images_u8):
        img = eval_transform(images_u8)
        logits = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                             img, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(logits, axis=-1), jnp.max(probs, axis=-1), img

    # Collect the first num_samples (reference visualize.py:352-373 semantics).
    samples = []
    for batch in loader:
        if len(samples) >= args.num_samples:
            break
        preds, conf, images = infer(batch["image"])
        preds, conf, images = np.asarray(preds), np.asarray(conf), np.asarray(images)
        masks = np.asarray(batch["mask"])
        valid = np.asarray(batch.get("valid", np.ones(images.shape[0], bool)))
        for i in range(images.shape[0]):
            if not valid[i] or len(samples) >= args.num_samples:
                continue
            samples.append({"image": images[i], "mask": masks[i], "pred": preds[i],
                            "conf": conf[i],
                            "stem": os.path.basename(batch["image_path"][i]).split(".")[0]})
    print(f"Collected {len(samples)} samples for visualization")

    # Output selection: with no selector, render both (reference default);
    # an explicit selector narrows to it unless --always_save re-widens.
    explicit = args.save_individual or args.save_grid
    do_individual = args.save_individual or args.always_save or not explicit
    do_grid = args.save_grid or args.always_save or not explicit

    gt_counts = np.zeros(num_classes, np.int64)
    pred_counts = np.zeros(num_classes, np.int64)
    rendered = 0
    for idx, s in enumerate(samples):
        gt_counts += np.bincount(s["mask"].ravel(), minlength=num_classes)
        pred_counts += np.bincount(s["pred"].ravel(), minlength=num_classes)
        # Per-sample stats line (reference visualize.py:239-257,396-399).
        acc = float((s["pred"] == s["mask"]).mean())
        print(f"Sample {idx + 1}: Accuracy={acc:.3f}, "
              f"Confidence={s['conf'].mean():.3f}±{s['conf'].std():.3f}")
        if not do_individual:
            continue
        ncols = 5 if args.show_confidence else 4
        fig, axes = plt.subplots(1, ncols, figsize=tuple(args.figsize))
        axes[0].imshow(denormalize_image(s["image"]))
        axes[0].set_title("Original")
        axes[1].imshow(s["mask"], cmap="tab10", vmin=0, vmax=num_classes - 1)
        axes[1].set_title("Ground Truth")
        axes[2].imshow(s["pred"], cmap="tab10", vmin=0, vmax=num_classes - 1)
        axes[2].set_title("Prediction")
        axes[3].imshow(overlay_segmentation(s["image"], s["pred"], alpha=args.alpha))
        axes[3].set_title(f"Overlay (conf {s['conf'].mean():.3f})")
        if args.show_confidence:
            im = axes[4].imshow(s["conf"], cmap="viridis", vmin=0, vmax=1)
            axes[4].set_title(f"Confidence (mean {s['conf'].mean():.3f})")
            fig.colorbar(im, ax=axes[4], fraction=0.046)
        for ax in axes:
            ax.axis("off")
        fig.tight_layout()
        path = os.path.join(output_dir,
                            f"prediction_{idx:03d}_{s['stem']}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        rendered += 1

    # Grid visualization (reference visualize.py:169-236; predictions_grid.png).
    if samples and do_grid:
        gr, gc = args.grid_size
        n = min(len(samples), gr * gc)
        fig, axes = plt.subplots(gr, 2 * gc, figsize=(4 * gc, 2.5 * gr))
        axes = np.atleast_2d(axes)
        for k in range(gr * gc):
            r, c = divmod(k, gc)
            ax_gt, ax_pr = axes[r][2 * c], axes[r][2 * c + 1]
            if k < n:
                s = samples[k]
                ax_gt.imshow(overlay_segmentation(s["image"], s["mask"], alpha=args.alpha))
                ax_gt.set_title(f"Sample {k + 1}: GT", fontsize=9)
                ax_pr.imshow(overlay_segmentation(s["image"], s["pred"], alpha=args.alpha))
                ax_pr.set_title(f"Pred (conf {s['conf'].mean():.2f})", fontsize=9)
            ax_gt.axis("off")
            ax_pr.axis("off")
        fig.tight_layout()
        grid_path = os.path.join(output_dir, "predictions_grid.png")
        fig.savefig(grid_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"Grid visualization saved to {grid_path}")

    # Class-distribution bars, GT vs prediction (reference visualize.py:411-441).
    fig, ax = plt.subplots(figsize=(10, 6))
    x = np.arange(num_classes)
    width = 0.35
    total_gt = max(gt_counts.sum(), 1)
    total_pred = max(pred_counts.sum(), 1)
    ax.bar(x - width / 2, gt_counts / total_gt * 100, width, label="Ground Truth")
    ax.bar(x + width / 2, pred_counts / total_pred * 100, width, label="Prediction")
    ax.set_xticks(x, class_names, rotation=20)
    ax.set_ylabel("Pixel share (%)")
    ax.set_title(f"{args.dataset} class distribution "
                 f"({args.split}, first {len(samples)} samples)")
    ax.legend()
    fig.tight_layout()
    dist_path = os.path.join(output_dir, "class_distribution.png")
    fig.savefig(dist_path, dpi=150, bbox_inches="tight")
    plt.close(fig)

    print(f"Rendered {rendered} panels + class distribution to {output_dir}")
    return output_dir


if __name__ == "__main__":
    main()

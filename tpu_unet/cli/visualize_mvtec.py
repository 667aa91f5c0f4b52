#!/usr/bin/env python3
"""Visualize MVTec anomaly-detection results (TPU-native).

Capability parity with /root/reference/src/visualize.py: renders per-sample panels
(original | GT overlay | predicted heatmap | reconstruction | error map) and a
summary grid, with checkpoint auto-discovery by walking the outputs directory.

Two modes:
- default: batch PNG rendering (works headless on TPU hosts); ``--max_samples``
  controls how many panels;
- ``--interactive``: a matplotlib browser with Previous/Next/Info buttons and
  left/right/i keyboard navigation (parity with the reference's
  AnomalyVisualizer, /root/reference/src/visualize.py:20-190) for non-headless use.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.loader import DataLoader
from tpu_unet.data.mvtec import MVTecDataset
from tpu_unet.models import build_model
from tpu_unet.parallel import make_mesh, replicate, shard_batch
from tpu_unet.train import create_train_state, load_params, make_anomaly_eval_step, make_optimizer
from tpu_unet.train.checkpoint import find_best_checkpoint
from tpu_unet.utils.viz import _plt, denormalize_image


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Visualize MVTec anomaly results")
    parser.add_argument("--data_root", type=str, default="../datasets/mvtec_anomaly_detection")
    parser.add_argument("--category", type=str, default="bottle")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--model", type=str, default="anomaly_unet",
                        choices=["unet", "anomaly_unet"])
    parser.add_argument("--bilinear", action="store_true")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Checkpoint path (default: auto-discover under --outputs_dir)")
    parser.add_argument("--outputs_dir", type=str, default="../outputs",
                        help="Directory walked for checkpoint auto-discovery")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--output_dir", type=str, default="../visualizations")
    parser.add_argument("--max_samples", type=int, default=16)
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--base_features", type=int, default=64)
    parser.add_argument("--interactive", action="store_true",
                        help="open the Previous/Next/Info matplotlib browser "
                             "instead of writing batch PNGs")
    return parser.parse_args(argv)


def discover_checkpoint(outputs_dir: str, category: str, model: str = None):
    """Newest experiment for the category with a usable checkpoint
    (mirrors /root/reference/src/visualize.py:223-264).

    Newest by mtime — experiment names are '{category}_{model}_{timestamp}', so
    a lexicographic sort would rank by MODEL name before timestamp (e.g. a
    stale 'bottle_unet_*' beats a fresh 'bottle_anomaly_unet_*'). When
    ``model`` is given, experiments of that model are preferred so the loaded
    params match the constructed architecture.
    """
    candidates = []  # (matches_model, mtime, ckpt)
    if os.path.isdir(outputs_dir):
        for name in os.listdir(outputs_dir):
            if name.startswith(category):
                exp_dir = os.path.join(outputs_dir, name)
                ckpt = find_best_checkpoint(exp_dir)
                if ckpt:
                    matches = bool(model) and name.startswith(f"{category}_{model}_")
                    candidates.append((matches, os.path.getmtime(exp_dir), ckpt))
    if not candidates:
        return None
    return max(candidates)[2]


def render_panel(ax_row, image, mask_true, anomaly_map, reconstruction, error_map):
    img = denormalize_image(np.asarray(image))
    ax_row[0].imshow(img)
    ax_row[0].set_title("Original")
    overlay = img.copy()
    overlay[np.asarray(mask_true) > 0.5] = [1.0, 0.0, 0.0]
    ax_row[1].imshow(overlay)
    ax_row[1].set_title("GT overlay (red)")
    ax_row[2].imshow(np.asarray(anomaly_map), cmap="hot", vmin=0, vmax=1)
    ax_row[2].set_title("Predicted map")
    ax_row[3].imshow(np.clip(np.asarray(reconstruction), 0, 1))
    ax_row[3].set_title("Reconstruction")
    ax_row[4].imshow(np.asarray(error_map), cmap="viridis")
    ax_row[4].set_title("Recon error")
    for ax in ax_row:
        ax.axis("off")


class AnomalyBrowser:
    """Interactive sample browser: Previous/Next/Info buttons + arrow keys.

    Capability parity with the reference's AnomalyVisualizer
    (/root/reference/src/visualize.py:20-190): wrapping navigation over
    precomputed records, an Info action printing sample metadata, and the same
    5-panel rendering as the batch mode (shared ``render_panel``).
    """

    def __init__(self, records, plt):
        if not records:
            raise ValueError("no samples to browse")
        self.records = records
        self.idx = 0
        self.plt = plt
        self.fig, axes = plt.subplots(1, 5, figsize=(20, 4.4))
        self.axes = list(np.atleast_1d(axes).ravel())
        from matplotlib.widgets import Button

        self.fig.subplots_adjust(bottom=0.2)
        self._buttons = []
        for label, x, cb in (("Previous", 0.30, lambda e: self.prev()),
                             ("Next", 0.45, lambda e: self.next()),
                             ("Info", 0.60, lambda e: self.info())):
            ax = self.fig.add_axes([x, 0.04, 0.1, 0.07])
            b = Button(ax, label)
            b.on_clicked(cb)
            self._buttons.append(b)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self.show_current()

    def _on_key(self, event):
        if event.key in ("right", "n"):
            self.next()
        elif event.key in ("left", "p"):
            self.prev()
        elif event.key == "i":
            self.info()

    def show_current(self):
        r = self.records[self.idx]
        for ax in self.axes:
            ax.clear()
        render_panel(self.axes, r["image"], r["mask"], r["anomaly_map"],
                     r["reconstruction"], r["error_map"])
        self.fig.suptitle(
            f"Sample {self.idx + 1}/{len(self.records)}  "
            f"type={r['anomaly_type']}  score={r['score']:.5f}", fontsize=13)
        self.fig.canvas.draw_idle()

    def next(self):
        self.idx = (self.idx + 1) % len(self.records)
        self.show_current()

    def prev(self):
        self.idx = (self.idx - 1) % len(self.records)
        self.show_current()

    def info(self):
        r = self.records[self.idx]
        print(f"\nSample {self.idx + 1}/{len(self.records)}")
        print(f"  path:         {r['image_path']}")
        print(f"  anomaly type: {r['anomaly_type']}")
        print(f"  label:        {'anomalous' if r['label'] else 'normal'}")
        print(f"  image score:  {r['score']:.6f}")
        print(f"  GT defect px: {int((r['mask'] > 0.5).sum())}")

    def show(self):
        self.plt.show()


def main(argv=None):
    args = parse_args(argv)
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device not in ("auto", "tpu"):
        jax.config.update("jax_platforms", args.device)
    plt = _plt()

    checkpoint = args.checkpoint or discover_checkpoint(args.outputs_dir,
                                                        args.category, args.model)
    if checkpoint is None:
        print(f"No checkpoint found under {args.outputs_dir} for '{args.category}'")
        return None
    print(f"Using checkpoint: {checkpoint}")

    ds = MVTecDataset(args.data_root, args.category, "test", args.image_size,
                      is_train=False)
    mesh = make_mesh(n_data=args.n_devices)
    to_device = lambda b: {k: (shard_batch(mesh, v) if hasattr(v, "shape") else v)
                           for k, v in b.items()}
    loader = DataLoader(ds, args.batch_size, pad_last=True,
                        num_workers=args.num_workers, transform=to_device)

    policy = get_policy(args.precision)
    model = build_model(args.model, n_channels=3, n_classes=1, bilinear=args.bilinear,
                        policy=policy, base_features=args.base_features)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0),
                               (1, args.image_size, args.image_size, 3), tx)
    state = replicate(mesh, state)
    state = load_params(state, checkpoint)
    eval_step = make_anomaly_eval_step(dual_decoder=(args.model == "anomaly_unet"))

    # Collect per-sample records once; both modes render from them.
    records = []
    for batch in loader:
        if len(records) >= args.max_samples:
            break
        out = eval_step(state, batch["image"], batch["mask"])
        valid = np.asarray(batch.get("valid", np.ones(len(batch["label"]), bool)))
        for i in range(len(valid)):
            if not valid[i] or len(records) >= args.max_samples:
                continue
            records.append({
                "image": np.asarray(out["image"])[i],
                "mask": np.asarray(batch["mask"])[i, ..., 0],
                "anomaly_map": np.asarray(out["anomaly_map"])[i],
                "reconstruction": np.asarray(out["reconstruction"])[i],
                "error_map": np.asarray(out["error_map"])[i],
                "score": float(np.asarray(out["score"])[i]),
                "label": int(np.asarray(batch["label"])[i]),
                "anomaly_type": batch["anomaly_type"][i],
                "image_path": batch["image_path"][i],
            })

    if args.interactive:
        if not records:
            print("No samples to browse (empty test split?)")
            return None
        browser = AnomalyBrowser(records, plt)
        print("Interactive browser: Previous/Next/Info buttons, "
              "arrow keys + 'i' for info, close the window to exit.")
        browser.show()
        return browser

    os.makedirs(args.output_dir, exist_ok=True)
    per_fig = 8
    for start in range(0, len(records), per_fig):
        chunk = records[start:start + per_fig]
        fig, axes = plt.subplots(len(chunk), 5, figsize=(20, 3.2 * len(chunk)),
                                 squeeze=False)
        for row, r in enumerate(chunk):
            render_panel(axes[row], r["image"], r["mask"], r["anomaly_map"],
                         r["reconstruction"], r["error_map"])
            axes[row][0].set_ylabel(r["anomaly_type"])
        fig.tight_layout()
        path = os.path.join(args.output_dir,
                            f"{args.category}_panel_{start:03d}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"Saved {path}")
    print(f"Rendered {len(records)} sample panels to {args.output_dir}")
    return args.output_dir


if __name__ == "__main__":
    main()

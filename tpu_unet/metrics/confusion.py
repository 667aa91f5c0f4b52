"""On-device confusion matrix accumulation + derived segmentation metrics.

The reference recomputes a sklearn confusion matrix on host every training step
(/root/reference/src/metrics.py:22-45), forcing a device->host sync in the hot loop.
Here the (C, C) matrix is accumulated on device as part of the jitted step — a
one-hot contraction that maps onto the MXU — and fetched once per epoch.

Derived metrics (IoU, Dice, pixel/mean accuracy, precision/recall/F1) match the
reference formulas including the 1e-8 clamps and nan-mean reductions
(/root/reference/src/metrics.py:47-140).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


_F32_EXACT_MAX = 1 << 24  # largest count a float32 accumulator holds exactly


def _confusion_matrix_sliced(preds: jnp.ndarray, targets: jnp.ndarray,
                             num_classes: int,
                             ignore_index: Optional[int]) -> jnp.ndarray:
    """CM via C² fused mask-sums — the small-C fast path.

    For the tiny class counts of these workloads (C=3/4) the one-hot contraction
    materializes (n, C) C-minor operands that waste ~128/C of the vector lanes;
    summing boolean mask products keeps every tensor a full-lane (n,) plane, and
    int32 accumulation is exact to 2^31 pixels — no f32-exactness chunking needed.
    """
    t = targets.reshape(-1)
    p = preds.reshape(-1)
    valid = None if ignore_index is None else (t != ignore_index)
    p_masks = [p == d for d in range(num_classes)]
    rows = []
    for c in range(num_classes):
        tc = t == c
        if valid is not None:
            tc = tc & valid
        rows.append([jnp.sum((tc & p_masks[d]).astype(jnp.int32))
                     for d in range(num_classes)])
    return jnp.stack([jnp.stack(r) for r in rows])


def _confusion_matrix_impl(preds: jnp.ndarray, targets: jnp.ndarray,
                           num_classes: int,
                           ignore_index: Optional[int] = None,
                           max_exact: int = _F32_EXACT_MAX) -> jnp.ndarray:
    t = targets.reshape(-1)
    p = preds.reshape(-1)
    if ignore_index is not None:
        valid = (t != ignore_index)
        # Route ignored pixels to class 0 with zero weight.
        t = jnp.where(valid, t, 0)
        p = jnp.where(valid, p, 0)
        w = valid.astype(jnp.float32)
    else:
        w = jnp.ones_like(t, dtype=jnp.float32)

    # f32 accumulation is exact only up to 2^24 counts per cell; a KolektorSDD
    # eval at batch 32 (1024x512) already exceeds it. Contract in static chunks
    # of <= 2^24 pixels and sum the per-chunk CMs as int32 (exact to 2^31).
    n = t.shape[0]
    n_chunks = max(1, -(-n // max_exact))
    chunk = -(-n // n_chunks)
    pad = n_chunks * chunk - n
    if pad:
        t = jnp.concatenate([t, jnp.zeros(pad, t.dtype)])
        p = jnp.concatenate([p, jnp.zeros(pad, p.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        t_oh = jax.nn.one_hot(t[sl], num_classes, dtype=jnp.float32) * w[sl][:, None]
        p_oh = jax.nn.one_hot(p[sl], num_classes, dtype=jnp.float32)
        cm = cm + jnp.einsum("nc,nd->cd", t_oh, p_oh,
                             preferred_element_type=jnp.float32).astype(jnp.int32)
    # The epoch accumulator is host-side np.int64 (overflow-safe on long runs).
    return cm


@partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def confusion_matrix_batch(preds: jnp.ndarray, targets: jnp.ndarray,
                           num_classes: int,
                           ignore_index: Optional[int] = None) -> jnp.ndarray:
    """(C, C) confusion matrix (rows = target, cols = pred) for one batch.

    preds/targets: integer arrays of identical shape. Runs fully on device: for
    the small class counts these workloads use (C <= 8), via C² fused full-lane
    boolean mask-sums (int32-exact); for larger C via a one-hot matmul
    CM = onehot(t)^T @ onehot(p), chunked to stay within f32's exact-integer
    range.
    """
    from tpu_unet.ops.seg_head import SMALL_C_MAX
    if num_classes <= SMALL_C_MAX:
        return _confusion_matrix_sliced(preds, targets, num_classes, ignore_index)
    return _confusion_matrix_impl(preds, targets, num_classes, ignore_index)


class SegmentationMetrics:
    """Running confusion-matrix metrics for semantic segmentation.

    API parity with the reference class of the same name
    (/root/reference/src/metrics.py:9-204): reset/update/compute_* and
    compute_all_metrics. ``update`` accepts logits (N,H,W,C) or hard predictions
    (N,H,W) as JAX or numpy arrays; the per-batch (C,C) contraction runs on device,
    the tiny running accumulator is host-side np.int64 (overflow-safe).
    """

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        self.confusion_matrix = np.zeros((self.num_classes, self.num_classes), np.int64)
        self.total_samples = 0

    def update(self, pred, target):
        pred = jnp.asarray(pred)
        target = jnp.asarray(target)
        if pred.ndim == target.ndim + 1:  # logits (N,H,W,C)
            pred = jnp.argmax(pred, axis=-1)
        self.confusion_matrix = self.confusion_matrix + np.asarray(
            confusion_matrix_batch(pred.astype(jnp.int32), target.astype(jnp.int32),
                                   self.num_classes, self.ignore_index), np.int64)
        self.total_samples += int(np.prod(target.shape))

    def _cm(self) -> np.ndarray:
        return np.asarray(self.confusion_matrix)

    def compute_iou(self, per_class: bool = True):
        cm = self._cm()
        intersection = np.diag(cm)
        union = cm.sum(axis=1) + cm.sum(axis=0) - intersection
        iou = intersection / np.maximum(union, 1e-8)
        return iou if per_class else np.nanmean(iou)

    def compute_dice(self, per_class: bool = True):
        cm = self._cm()
        intersection = np.diag(cm)
        denom = cm.sum(axis=1) + cm.sum(axis=0)
        dice = 2 * intersection / np.maximum(denom, 1e-8)
        return dice if per_class else np.nanmean(dice)

    def compute_pixel_accuracy(self) -> float:
        cm = self._cm()
        return float(np.diag(cm).sum() / max(cm.sum(), 1e-8))

    def compute_mean_accuracy(self) -> float:
        cm = self._cm()
        acc = np.diag(cm) / np.maximum(cm.sum(axis=1), 1e-8)
        return float(np.nanmean(acc))

    def compute_precision_recall_f1(self, per_class: bool = True):
        cm = self._cm()
        tp = np.diag(cm)
        fp = cm.sum(axis=0) - tp
        fn = cm.sum(axis=1) - tp
        precision = tp / np.maximum(tp + fp, 1e-8)
        recall = tp / np.maximum(tp + fn, 1e-8)
        f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-8)
        if per_class:
            return precision, recall, f1
        return np.nanmean(precision), np.nanmean(recall), np.nanmean(f1)

    def compute_all_metrics(self) -> Dict:
        iou = self.compute_iou(per_class=True)
        dice = self.compute_dice(per_class=True)
        precision, recall, f1 = self.compute_precision_recall_f1(per_class=True)
        return {
            "iou_per_class": iou,
            "mean_iou": float(np.nanmean(iou)),
            "dice_per_class": dice,
            "mean_dice": float(np.nanmean(dice)),
            "pixel_accuracy": self.compute_pixel_accuracy(),
            "mean_accuracy": self.compute_mean_accuracy(),
            "precision_per_class": precision,
            "recall_per_class": recall,
            "f1_per_class": f1,
            "mean_precision": float(np.nanmean(precision)),
            "mean_recall": float(np.nanmean(recall)),
            "mean_f1": float(np.nanmean(f1)),
            "confusion_matrix": self._cm(),
        }

    def print_metrics(self, class_names=None):
        m = self.compute_all_metrics()
        if class_names is None:
            class_names = [f"Class_{i}" for i in range(self.num_classes)]
        print("=" * 60)
        print("SEMANTIC SEGMENTATION METRICS")
        print("=" * 60)
        print(f"Pixel Accuracy:     {m['pixel_accuracy']:.4f}")
        print(f"Mean Accuracy:      {m['mean_accuracy']:.4f}")
        print(f"Mean IoU:          {m['mean_iou']:.4f}")
        print(f"Mean Dice:         {m['mean_dice']:.4f}")
        print(f"Mean Precision:    {m['mean_precision']:.4f}")
        print(f"Mean Recall:       {m['mean_recall']:.4f}")
        print(f"Mean F1:           {m['mean_f1']:.4f}")
        print("\n" + "=" * 60)
        print("PER-CLASS METRICS")
        print("=" * 60)
        print(f"{'Class':<15} {'IoU':<8} {'Dice':<8} {'Prec':<8} {'Rec':<8} {'F1':<8}")
        print("-" * 60)
        for i, name in enumerate(class_names):
            print(f"{name:<15} "
                  f"{m['iou_per_class'][i]:.4f}   "
                  f"{m['dice_per_class'][i]:.4f}   "
                  f"{m['precision_per_class'][i]:.4f}   "
                  f"{m['recall_per_class'][i]:.4f}   "
                  f"{m['f1_per_class'][i]:.4f}")

    def plot_confusion_matrix(self, class_names=None, save_path=None, figsize=(10, 8)):
        """Normalized confusion-matrix heatmap (host-side matplotlib)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if class_names is None:
            class_names = [f"Class_{i}" for i in range(self.num_classes)]
        cm = self._cm().astype(float)
        cm_norm = cm / (cm.sum(axis=1, keepdims=True) + 1e-8)
        fig, ax = plt.subplots(figsize=figsize)
        im = ax.imshow(cm_norm, cmap="Blues", vmin=0, vmax=1)
        ax.set_xticks(range(self.num_classes), class_names)
        ax.set_yticks(range(self.num_classes), class_names)
        for i in range(self.num_classes):
            for j in range(self.num_classes):
                ax.text(j, i, f"{cm_norm[i, j]:.3f}", ha="center", va="center",
                        color="white" if cm_norm[i, j] > 0.5 else "black")
        ax.set_title("Normalized Confusion Matrix")
        ax.set_xlabel("Predicted Label")
        ax.set_ylabel("True Label")
        fig.colorbar(im)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=300, bbox_inches="tight")
        return fig


def compute_metrics_from_predictions(predictions, targets, num_classes, class_names=None):
    """Convenience wrapper mirroring /root/reference/src/metrics.py:207-230."""
    calc = SegmentationMetrics(num_classes)
    calc.update(jnp.asarray(predictions), jnp.asarray(targets))
    return calc.compute_all_metrics()

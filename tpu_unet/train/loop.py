"""Epoch drivers: thin host loops around the jitted steps.

Parity with the reference's train/validate epoch functions
(/root/reference/src/train_utils.py:107-260 and the inlined loops in the Gear /
KolektorSDD trainers), with TPU-first changes:

- per-step scalars stay on device until epoch end (no per-batch host sync);
- validation aggregates scores/masks on host exactly like the reference
  (95th-percentile image threshold, pixel F1 at {0.3, 0.5, 0.7} over anomalous
  images) so numeric outputs match;
- segmentation confusion matrices accumulate on device.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

from tpu_unet.metrics.binary import calculate_metrics
from tpu_unet.metrics.confusion import SegmentationMetrics


def _epoch_key(base_key, epoch: int):
    return jax.random.fold_in(base_key, epoch)


# ---------------------------------------------------------------------------
# Anomaly (MVTec)
# ---------------------------------------------------------------------------

def train_anomaly_epoch(state, step_fn, loader, base_key, epoch: int,
                        log_fn: Optional[Callable[[str], None]] = None):
    """One training epoch; returns (state, {'total_loss','recon_loss','seg_loss'})."""
    key = _epoch_key(base_key, epoch)
    per_batch = []
    counts = []
    for i, batch in enumerate(loader):
        k = jax.random.fold_in(key, i)
        state, losses = step_fn(state, batch["image"], batch["mask"], k)
        per_batch.append(losses)
        counts.append(batch["image"].shape[0])
    if not per_batch:
        return state, {"total_loss": 0.0, "recon_loss": 0.0, "seg_loss": 0.0}
    counts = np.asarray(counts, np.float64)
    out = {}
    for name in per_batch[0]:
        vals = np.asarray([float(d[name]) for d in per_batch])
        out[name] = float((vals * counts).sum() / counts.sum())
    if log_fn:
        log_fn(f"Epoch {epoch}: loss {out['total_loss']:.4f} "
               f"(recon {out['recon_loss']:.4f}, seg {out['seg_loss']:.4f})")
    return state, out


def validate_anomaly_epoch(state, eval_fn, loader) -> Dict:
    """Validation pass with the reference's image/pixel metric recipe
    (/root/reference/src/train_utils.py:155-260).

    Multi-process safe: each host reads only its addressable rows
    (``local_rows``), then the epoch-level arrays are all-gathered so every
    process computes the identical global metrics.
    """
    from tpu_unet.parallel.collectives import all_gather_host_values, local_rows

    losses = []
    valids, all_labels, all_scores, all_masks_true, all_masks_pred = [], [], [], [], []
    for batch in loader:
        # Ship the valid mask to device so padded rows are excluded from the loss
        # scalars (not just from the host-side metrics).
        v = batch.get("valid")
        out = eval_fn(state, batch["image"], batch["mask"], v)
        labels_l = local_rows(batch["label"])
        valid_l = (local_rows(v).astype(bool) if v is not None
                   else np.ones(labels_l.shape[0], bool))
        losses.append(out["losses"])
        valids.append(valid_l)
        all_labels.append(labels_l)
        all_scores.append(local_rows(out["score"]))
        all_masks_true.append(local_rows(batch["mask"])[..., 0])
        all_masks_pred.append(local_rows(out["anomaly_map"]))

    if not losses:  # empty val loader (e.g. a category with no test split yet)
        return {
            "total_loss": 0.0, "recon_loss": 0.0, "seg_loss": 0.0,
            "image_metrics": {}, "pixel_metrics": {},
            "predictions": {"labels": np.zeros(0, int), "scores": np.zeros(0),
                            "masks_true": np.zeros((0,)), "masks_pred": np.zeros((0,))},
        }
    # Per-batch global valid counts: gather the per-process per-batch counts and
    # sum over processes (the loss scalars are already replicated global values).
    counts_local = np.asarray([v.sum() for v in valids], np.float64)
    counts_arr = all_gather_host_values(counts_local).reshape(-1, len(valids)).sum(0)
    loss_out = {}
    for name in ("total_loss", "recon_loss", "seg_loss"):
        vals = np.asarray([float(d[name]) for d in losses])
        loss_out[name] = float((vals * counts_arr).sum() / counts_arr.sum())

    # Gather the epoch arrays (fixed shapes on every process), THEN filter by the
    # gathered valid mask — per-process valid counts may differ.
    valid = all_gather_host_values(np.concatenate(valids))
    labels = all_gather_host_values(np.concatenate(all_labels))[valid]
    scores = all_gather_host_values(np.concatenate(all_scores))[valid]
    masks_true = all_gather_host_values(np.concatenate(all_masks_true))[valid]
    masks_pred = all_gather_host_values(np.concatenate(all_masks_pred))[valid]

    if len(np.unique(labels)) > 1:
        threshold = np.percentile(scores, 95)
        predictions = (scores > threshold).astype(int)
        image_metrics = calculate_metrics(labels, predictions, scores)
    else:
        image_metrics = {
            "accuracy": 1.0 if labels[0] == 0 else 0.0,
            "precision": 0.0,
            "recall": 0.0,
            "specificity": 1.0 if labels[0] == 0 else 0.0,
            "f1_score": 0.0,
            "auroc": 0.0,
            "auprc": 0.0,
        }

    pixel_metrics: Dict[str, float] = {}
    anomaly_idx = labels == 1
    if anomaly_idx.sum() > 0:
        for threshold in (0.3, 0.5, 0.7):
            pred = (masks_pred[anomaly_idx] > threshold).astype(np.uint8).ravel()
            true = (masks_true[anomaly_idx] > 0.5).astype(np.uint8).ravel()
            if len(np.unique(true)) > 1:
                pixel_metrics[f"pixel_f1_@{threshold}"] = calculate_metrics(true, pred)["f1_score"]

    return {
        **loss_out,
        "image_metrics": image_metrics,
        "pixel_metrics": pixel_metrics,
        "predictions": {
            "labels": labels,
            "scores": scores,
            "masks_true": masks_true,
            "masks_pred": masks_pred,
        },
    }


# ---------------------------------------------------------------------------
# Segmentation (Gear / KolektorSDD)
# ---------------------------------------------------------------------------

def train_seg_epoch(state, step_fn, loader, base_key, epoch: int, num_classes: int):
    """One seg training epoch; returns (state, loss dict, SegmentationMetrics)."""
    key = _epoch_key(base_key, epoch)
    metrics = SegmentationMetrics(num_classes)
    per_batch, counts, cms = [], [], []
    for i, batch in enumerate(loader):
        k = jax.random.fold_in(key, i)
        state, losses, cm = step_fn(state, batch["image"], batch["mask"], k)
        per_batch.append(losses)
        counts.append(batch["image"].shape[0])
        if cm is not None:
            cms.append(cm)
    for cm in cms:
        metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm, np.int64)
    counts_arr = np.asarray(counts, np.float64) if counts else np.asarray([1.0])
    out = {}
    if per_batch:
        for name in per_batch[0]:
            vals = np.asarray([float(d[name]) for d in per_batch])
            out[name] = float((vals * counts_arr).sum() / counts_arr.sum())
    return state, out, metrics


def validate_seg_epoch(state, eval_fn, loader, num_classes: int):
    """Validation pass; returns (loss dict, SegmentationMetrics).

    Multi-process safe: each host accumulates a local confusion matrix over its
    addressable valid rows; the CMs and valid counts are all-gathered at epoch
    end so every process holds the identical global metrics.
    """
    import jax

    from tpu_unet.parallel.collectives import all_gather_host_values, local_rows

    multiproc = jax.process_count() > 1
    metrics = SegmentationMetrics(num_classes)
    per_batch, counts_local = [], []
    for batch in loader:
        v = batch.get("valid")
        losses, preds, cm = eval_fn(state, batch["image"], batch["mask"], v)
        # No padding -> all rows valid; size from shape alone (local_rows(preds)
        # would device-to-host copy the full predictions tensor just to count).
        n_local = preds.shape[0] // max(jax.process_count(), 1)
        valid_l = (local_rows(v).astype(bool) if v is not None
                   else np.ones(n_local, bool))
        if multiproc or (v is not None and not bool(valid_l.all())):
            # Host CM over this process's valid rows (padded rows are
            # zeros-on-zeros and would pollute the background class).
            metrics.update(local_rows(preds)[valid_l],
                           local_rows(batch["mask"])[valid_l])
        else:
            metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm, np.int64)
        per_batch.append(losses)
        counts_local.append(int(valid_l.sum()))
    if multiproc and per_batch:
        gathered = all_gather_host_values(
            metrics.confusion_matrix.astype(np.int64))
        metrics.confusion_matrix = gathered.reshape(-1, num_classes, num_classes).sum(0)
    if counts_local:
        counts_arr = all_gather_host_values(
            np.asarray(counts_local, np.float64)).reshape(-1, len(counts_local)).sum(0)
    else:
        counts_arr = np.asarray([1.0])
    out = {}
    if per_batch:
        for name in per_batch[0]:
            vals = np.asarray([float(d[name]) for d in per_batch])
            out[name] = float((vals * counts_arr).sum() / counts_arr.sum())
    return out, metrics

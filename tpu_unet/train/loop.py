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

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from tpu_unet.metrics.binary import calculate_metrics
from tpu_unet.metrics.confusion import SegmentationMetrics


def _epoch_key(base_key, epoch: int):
    return jax.random.fold_in(base_key, epoch)


def _fetch_scalars(per_batch) -> Dict[str, np.ndarray]:
    """One batched device->host transfer of every per-batch loss scalar.

    The r2 loops called ``float(d[name])`` per batch per loss name — 3×N
    separate roundtrips over the axon tunnel at every epoch boundary.
    ``jax.device_get`` issues the async copies for all leaves up front, so the
    whole epoch's scalars land in a single wait.
    """
    host = jax.device_get(per_batch)
    return {name: np.asarray([float(d[name]) for d in host], np.float64)
            for name in host[0]}


class _Progress:
    """Intra-epoch progress lines (reference tqdm-postfix analogue,
    /root/reference/src/train_utils.py:142-146, train.py:148-153).

    Every ``every`` steps it fetches ONLY the loss handle from ``every`` steps
    ago — already computed by then, so reading it does not stall the chip; the
    reported img/s is the honest lower bound 'images known complete / elapsed'.
    """

    def __init__(self, fn: Optional[Callable[[str], None]], every: int, n_total):
        self.fn = fn if every and every > 0 else None  # every<=0 disables
        self.every, self.n_total = max(int(every), 1), n_total
        self.t0 = time.perf_counter()

    def tick(self, i: int, per_batch, counts, extra: str = "") -> None:
        if self.fn is None or (i + 1) % self.every != 0:
            return
        # Trailing, surely-completed step. The lag is never less than one step —
        # with every=1 the naive i+1-every would read the JUST-dispatched step and
        # block on the chip every iteration, exactly the per-batch sync this
        # class promises not to add.
        j = min(i + 1 - self.every, i - 1)
        if j < 0:
            return
        loss = float(per_batch[j]["total_loss"])
        imgs_done = float(np.sum(counts[: j + 1]))
        dt = max(time.perf_counter() - self.t0, 1e-9)
        total = f"/{self.n_total}" if self.n_total is not None else ""
        self.fn(f"  step {i + 1}{total}: loss {loss:.4f}"
                f"{extra} [{imgs_done / dt:.1f} img/s]")


# ---------------------------------------------------------------------------
# Anomaly (MVTec)
# ---------------------------------------------------------------------------

def train_anomaly_epoch(state, step_fn, loader, base_key, epoch: int,
                        log_fn: Optional[Callable[[str], None]] = None,
                        progress_fn: Optional[Callable[[str], None]] = None,
                        progress_every: int = 10,
                        should_stop: Optional[Callable[[], bool]] = None):
    """One training epoch; returns (state, {'total_loss','recon_loss','seg_loss'}).

    ``progress_fn``: optional sink for an intra-epoch step/loss/rate line every
    ``progress_every`` steps (lagged device reads — no added chip syncs).
    ``should_stop``: polled between steps; True ends the epoch early (the
    trainers' SIGTERM latch — see train/interrupt.py). Metrics cover the steps
    that ran.
    """
    key = _epoch_key(base_key, epoch)
    per_batch = []
    counts = []
    prog = _Progress(progress_fn, progress_every,
                     len(loader) if hasattr(loader, "__len__") else None)
    for i, batch in enumerate(loader):
        if should_stop is not None and should_stop():
            break
        k = jax.random.fold_in(key, i)
        state, losses = step_fn(state, batch["image"], batch["mask"], k)
        per_batch.append(losses)
        counts.append(batch["image"].shape[0])
        prog.tick(i, per_batch, counts)
    if not per_batch:
        return state, {"total_loss": 0.0, "recon_loss": 0.0, "seg_loss": 0.0}
    counts = np.asarray(counts, np.float64)
    out = {}
    for name, vals in _fetch_scalars(per_batch).items():
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
    scalars = _fetch_scalars(losses)
    loss_out = {}
    for name in ("total_loss", "recon_loss", "seg_loss"):
        vals = scalars[name]
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

def train_seg_epoch(state, step_fn, loader, base_key, epoch: int, num_classes: int,
                    progress_fn: Optional[Callable[[str], None]] = None,
                    progress_every: int = 10,
                    should_stop: Optional[Callable[[], bool]] = None):
    """One seg training epoch; returns (state, loss dict, SegmentationMetrics).

    ``progress_fn``: optional intra-epoch step/loss/mIoU/rate line every
    ``progress_every`` steps (the reference's tqdm postfix,
    /root/reference/train.py:148-153) from lagged device handles.
    ``should_stop``: polled between steps; True ends the epoch early (the
    trainers' SIGTERM latch — see train/interrupt.py).
    """
    key = _epoch_key(base_key, epoch)
    metrics = SegmentationMetrics(num_classes)
    per_batch, counts, cms = [], [], []
    prog = _Progress(progress_fn, progress_every,
                     len(loader) if hasattr(loader, "__len__") else None)
    run_cm = np.zeros((num_classes, num_classes), np.int64)
    fetched = 0  # cms consumed into run_cm at progress ticks
    for i, batch in enumerate(loader):
        if should_stop is not None and should_stop():
            break
        k = jax.random.fold_in(key, i)
        state, losses, cm = step_fn(state, batch["image"], batch["mask"], k)
        per_batch.append(losses)
        counts.append(batch["image"].shape[0])
        if cm is not None:
            cms.append(cm)
        if prog.fn and (i + 1) % prog.every == 0:
            extra = ""
            if cms:
                # Running train mIoU from the trailing (completed) CM handles
                # (same >=1-step lag as _Progress.tick).
                upto = max(min(len(cms) - prog.every + 1, len(cms) - 1), fetched)
                for c in cms[fetched:upto]:
                    run_cm += np.asarray(c, np.int64)
                fetched = upto
                if run_cm.sum() > 0:
                    # Same 0-for-absent-class convention as the epoch-end
                    # SegmentationMetrics.compute_iou (reference parity) — a
                    # NaN-skipping progress figure would read higher than the
                    # epoch summary whenever a class hasn't appeared yet.
                    running = SegmentationMetrics(num_classes)
                    running.confusion_matrix = run_cm
                    miou = float(np.nanmean(running.compute_iou()))
                    extra = f", mIoU {miou:.4f}"
            prog.tick(i, per_batch, counts, extra=extra)
    for cm in (jax.device_get(cms) if cms else []):
        metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm, np.int64)
    counts_arr = np.asarray(counts, np.float64) if counts else np.asarray([1.0])
    out = {}
    if per_batch:
        for name, vals in _fetch_scalars(per_batch).items():
            out[name] = float((vals * counts_arr).sum() / counts_arr.sum())
    return state, out, metrics


def validate_seg_epoch(state, eval_fn, loader, num_classes: int,
                       ignore_index: Optional[int] = None):
    """Validation pass; returns (loss dict, SegmentationMetrics).

    Multi-process safe: each host accumulates a local confusion matrix over its
    addressable valid rows; the CMs and valid counts are all-gathered at epoch
    end so every process holds the identical global metrics.

    ``ignore_index`` must match the eval step's loss config: the device CM
    excludes it on-device, and the host-side update() paths (multi-process /
    padded final batch) need the same exclusion or the two CM definitions mix.
    """
    import jax

    from tpu_unet.parallel.collectives import all_gather_host_values, local_rows

    multiproc = jax.process_count() > 1
    metrics = SegmentationMetrics(num_classes, ignore_index)
    per_batch, counts_local, cm_handles = [], [], []
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
            # Keep the device handle; fetching here would block on THIS batch's
            # program every iteration (the per-batch sync _fetch_scalars removed).
            cm_handles.append(cm)
        per_batch.append(losses)
        counts_local.append(int(valid_l.sum()))
    for cm in (jax.device_get(cm_handles) if cm_handles else []):
        metrics.confusion_matrix = metrics.confusion_matrix + np.asarray(cm, np.int64)
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
        for name, vals in _fetch_scalars(per_batch).items():
            out[name] = float((vals * counts_arr).sum() / counts_arr.sum())
    return out, metrics

"""Threshold-sweep curves: AUROC, AUPRC, PR curve, optimal threshold.

Self-contained numpy implementations matching sklearn's numerics (the reference
relies on sklearn: /root/reference/src/utils.py:84-92, 315-326). Eval-final metrics
run on host for exact parity; sort-based, so O(n log n).

- auroc: Mann-Whitney rank statistic with tie correction — identical to the
  trapezoidal area under the full ROC curve.
- precision_recall_curve: sklearn semantics (distinct-score thresholds, curve cut at
  full recall, (1, 0) end point appended, arrays in decreasing-recall order).
- auprc: trapezoidal auc(recall, precision) — the reference uses sklearn.metrics.auc,
  NOT average_precision (/root/reference/src/utils.py:88-89).
- get_optimal_threshold: PR-F1-max (the reference docstring says Youden's J but the
  code maximizes F1 over the PR curve; we follow the code — SURVEY.md §2.6 defect 6).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _rankdata_average(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties sharing the mean rank."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    # Boundaries of tied groups.
    boundaries = np.flatnonzero(np.r_[True, sx[1:] != sx[:-1], True])
    for start, stop in zip(boundaries[:-1], boundaries[1:]):
        ranks[order[start:stop]] = 0.5 * (start + stop - 1) + 1.0
    return ranks


def auroc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Area under the ROC curve. Raises ValueError if only one class is present
    (mirroring sklearn, whose ValueError the reference catches and maps to 0.0)."""
    y_true = np.asarray(y_true).astype(np.int64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    n_pos = int(y_true.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("Only one class present in y_true. ROC AUC score is not defined.")
    ranks = _rankdata_average(y_score)
    return float((ranks[y_true == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def _binary_clf_curve(y_true: np.ndarray, y_score: np.ndarray):
    """Cumulative TPs/FPs at each distinct score threshold (descending scores)."""
    y_true = np.asarray(y_true).astype(np.float64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    desc = np.argsort(-y_score, kind="mergesort")
    y_score = y_score[desc]
    y_true = y_true[desc]
    distinct = np.flatnonzero(np.diff(y_score)) if len(y_score) > 1 else np.array([], dtype=int)
    threshold_idxs = np.r_[distinct, len(y_true) - 1]
    tps = np.cumsum(y_true)[threshold_idxs]
    fps = 1 + threshold_idxs - tps
    return fps, tps, y_score[threshold_idxs]


def precision_recall_curve(y_true: np.ndarray, y_score: np.ndarray):
    """sklearn-compatible PR curve: (precision, recall, thresholds)."""
    fps, tps, thresholds = _binary_clf_curve(y_true, y_score)
    ps = tps + fps
    precision = np.divide(tps, ps, out=np.zeros_like(tps), where=ps > 0)
    if tps[-1] == 0:
        recall = np.ones_like(tps)
    else:
        recall = tps / tps[-1]
    # Reverse so recall is decreasing; append the (precision=1, recall=0) end point.
    # (Matches sklearn >= 1.9, which returns the full curve without cutting at the
    # first full-recall point.)
    return (np.r_[precision[::-1], 1.0], np.r_[recall[::-1], 0.0], thresholds[::-1])


def auc(x: np.ndarray, y: np.ndarray) -> float:
    """Trapezoidal area under y(x); accepts increasing or decreasing x (sklearn.auc)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = np.diff(x)
    if np.all(dx <= 0):
        sign = -1.0
    elif np.all(dx >= 0):
        sign = 1.0
    else:
        raise ValueError("x is neither increasing nor decreasing.")
    return float(sign * np.trapezoid(y, x)) if hasattr(np, "trapezoid") else float(sign * np.trapz(y, x))


def auprc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """auc(recall, precision) — the reference's AUPRC definition."""
    precision, recall, _ = precision_recall_curve(y_true, y_score)
    return auc(recall, precision)


def get_optimal_threshold(y_true: np.ndarray, y_score: np.ndarray) -> Tuple[float, float]:
    """Threshold maximizing F1 over the PR curve (reference behavior,
    /root/reference/src/utils.py:315-326). Returns (threshold, best_f1)."""
    precision, recall, thresholds = precision_recall_curve(y_true, y_score)
    f1 = 2 * (precision * recall) / (precision + recall + 1e-8)
    idx = int(np.argmax(f1))
    threshold = float(thresholds[idx]) if idx < len(thresholds) else 0.5
    return threshold, float(f1[idx])

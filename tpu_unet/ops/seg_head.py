"""Channel-sliced prediction heads for small-C segmentation logits.

The seg models emit (N,H,W,C) logits with C=3/4 classes. On TPU a C-minor tensor
occupies C of the 128 vector lanes, so every elementwise pass over it (softmax,
argmax, max) costs ~128/C-fold its logical bytes. For small C it is much cheaper
to compute the same results from C static channel slices, where every working
tensor is a full-lane (N,H,W) plane. Same trick as the sliced loss head
(losses/segmentation.py::_combined_sliced).

``SMALL_C_MAX`` is the single cutoff shared by every sliced head (this module,
the sliced loss dispatch, and the sliced confusion matrix) — tune it here, not
per-module.

Identities used (exact, not approximations):
- argmax via an iterative strict-``>`` scan over slices reproduces jnp.argmax's
  first-max tie-breaking;
- max softmax probability = exp(lmax - lse) = 1 / sum_c exp(l_c - lmax), which
  equals max(jax.nn.softmax(logits)) bit-for-bit (softmax's own shift makes the
  winning exponent exp(0) = 1).

Reference semantics being served: confidence = softmax max-prob as in
/root/reference/visualize.py:239-257 (per-sample confidence stats).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

# Channel-count cutoff below which the sliced (full-lane plane) heads are used.
# Shared by losses/segmentation.py and metrics/confusion.py — one knob.
SMALL_C_MAX = 8


def _argmax_and_max(slices: List[jnp.ndarray], dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(argmax, max) over a list of equal-shape planes via a strict-``>`` scan.

    Reproduces ``jnp.argmax`` exactly: first-max tie-breaking (a later equal
    value never displaces the incumbent) AND NaN-is-greatest (the first NaN
    wins; a bare strict-``>`` scan would silently report class 0 during a
    numerics blowup while jnp.argmax consumers report the NaN index). The
    single scan serves both sliced_argmax and sliced_pred_confidence so the
    tie/NaN semantics cannot drift apart.
    """
    best = slices[0]
    am = jnp.zeros(slices[0].shape, dtype)
    for i in range(1, len(slices)):
        l_i = slices[i]
        take = (l_i > best) | (jnp.isnan(l_i) & ~jnp.isnan(best))
        am = jnp.where(take, jnp.asarray(i, dtype), am)
        best = jnp.where(take, l_i, best)
    return am, best


def sliced_argmax(logits: jnp.ndarray, dtype=jnp.int32) -> jnp.ndarray:
    """argmax over the minor (class) axis of (..., C) logits.

    Matches ``jnp.argmax(logits, axis=-1)`` including first-max tie-breaking.
    Falls back to jnp.argmax for C > SMALL_C_MAX.
    """
    c = logits.shape[-1]
    if c > SMALL_C_MAX:
        return jnp.argmax(logits, axis=-1).astype(dtype)
    am, _ = _argmax_and_max([logits[..., i] for i in range(c)], dtype)
    return am


def sliced_pred_confidence(logits: jnp.ndarray,
                           pred_dtype=jnp.uint8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(preds, per-pixel max softmax probability) from (..., C) logits.

    Equals ``(argmax(logits, -1), max(softmax(logits, -1), -1))`` while touching
    only full-lane (...,)-shaped planes for C <= SMALL_C_MAX.
    """
    c = logits.shape[-1]
    if c > SMALL_C_MAX:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return (jnp.argmax(logits, axis=-1).astype(pred_dtype),
                jnp.max(probs, axis=-1))
    ls = [logits[..., i].astype(jnp.float32) for i in range(c)]
    am, best = _argmax_and_max(ls, pred_dtype)
    se = jnp.exp(ls[0] - best)
    for i in range(1, c):
        se = se + jnp.exp(ls[i] - best)
    return am, 1.0 / se

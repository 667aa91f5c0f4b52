"""Parity tests for the channel-sliced small-C heads (ops/seg_head.py) and the
sliced confusion-matrix path (metrics/confusion.py::_confusion_matrix_sliced):
each must reproduce the straightforward (N,H,W,C)-tensor formulation exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.metrics.confusion import (_confusion_matrix_impl,
                                        _confusion_matrix_sliced,
                                        confusion_matrix_batch)
from tpu_unet.ops.seg_head import sliced_argmax, sliced_pred_confidence


@pytest.mark.parametrize("c", [2, 3, 4, 8])
def test_sliced_argmax_matches_jnp(c):
    rng = np.random.default_rng(c)
    logits = jnp.asarray(rng.standard_normal((2, 7, 5, c)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(sliced_argmax(logits)),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_sliced_argmax_tie_breaking():
    # jnp.argmax returns the FIRST maximal index; the strict-> scan must too.
    logits = jnp.asarray([[1.0, 1.0, 0.5], [0.5, 2.0, 2.0], [3.0, 3.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(sliced_argmax(logits)),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_sliced_argmax_nan_parity():
    """jnp.argmax treats NaN as the greatest value (first NaN wins); the sliced
    scan must agree so a numerics blowup surfaces identically on both paths."""
    nan = float("nan")
    logits = jnp.asarray([[0.5, nan, 0.2],     # NaN mid
                          [nan, 1.0, 2.0],     # NaN first
                          [0.1, nan, nan],     # two NaNs -> first one
                          [3.0, 2.0, 1.0]])    # no NaN
    np.testing.assert_array_equal(np.asarray(sliced_argmax(logits)),
                                  np.asarray(jnp.argmax(logits, axis=-1)))
    preds, conf = sliced_pred_confidence(logits)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(jnp.argmax(logits, axis=-1)))
    # confidence of NaN rows is NaN (softmax would be all-NaN too)
    assert np.isnan(np.asarray(conf)[:3]).all() and np.isfinite(np.asarray(conf)[3])


@pytest.mark.parametrize("c", [3, 4])
def test_sliced_pred_confidence_matches_softmax_max(c):
    rng = np.random.default_rng(10 + c)
    logits = jnp.asarray((10 * rng.standard_normal((2, 6, 6, c))).astype(np.float32))
    preds, conf = sliced_pred_confidence(logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(jnp.argmax(logits, axis=-1)))
    np.testing.assert_allclose(np.asarray(conf),
                               np.asarray(jnp.max(probs, axis=-1)),
                               rtol=1e-6, atol=0)


def test_sliced_pred_confidence_large_c_fallback():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 16)).astype(np.float32))
    preds, conf = sliced_pred_confidence(logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(jnp.argmax(logits, axis=-1)))
    np.testing.assert_allclose(np.asarray(conf),
                               np.asarray(jnp.max(probs, axis=-1)), rtol=1e-6)


@pytest.mark.parametrize("ignore_index", [None, 2])
def test_sliced_confusion_matrix_matches_einsum_path(ignore_index):
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.integers(0, 3, (4, 33)).astype(np.int32))
    p = jnp.asarray(rng.integers(0, 3, (4, 33)).astype(np.int32))
    sliced = np.asarray(_confusion_matrix_sliced(p, t, 3, ignore_index))
    einsum = np.asarray(_confusion_matrix_impl(p, t, 3, ignore_index))
    np.testing.assert_array_equal(sliced, einsum)
    # public entry dispatches to the sliced path for small C
    np.testing.assert_array_equal(
        np.asarray(confusion_matrix_batch(p, t, 3, ignore_index)), sliced)

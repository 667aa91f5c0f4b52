"""Metric tests: sklearn numeric parity for curves, confusion-matrix math, scoring."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.metrics import (
    SegmentationMetrics,
    anomaly_error_map,
    anomaly_score,
    auprc,
    auroc,
    calculate_metrics,
    calculate_pixel_metrics,
    confusion_matrix_batch,
    get_optimal_threshold,
    precision_recall_curve,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.fixture(params=[0, 1, 2, 3])
def scored_labels(request):
    rng = np.random.default_rng(request.param)
    n = 200
    y = (rng.uniform(size=n) > 0.7).astype(int)
    # Include ties to exercise tie handling.
    s = np.round(rng.uniform(size=n) + 0.3 * y, 2)
    return y, s


class TestCurves:
    def test_auroc_matches_sklearn(self, scored_labels):
        y, s = scored_labels
        assert abs(auroc(y, s) - sklearn_metrics.roc_auc_score(y, s)) < 1e-10

    def test_auprc_matches_sklearn(self, scored_labels):
        y, s = scored_labels
        p, r, _ = sklearn_metrics.precision_recall_curve(y, s)
        expect = sklearn_metrics.auc(r, p)
        assert abs(auprc(y, s) - expect) < 1e-10

    def test_pr_curve_matches_sklearn(self, scored_labels):
        y, s = scored_labels
        p1, r1, t1 = precision_recall_curve(y, s)
        p2, r2, t2 = sklearn_metrics.precision_recall_curve(y, s)
        np.testing.assert_allclose(p1, p2, atol=1e-12)
        np.testing.assert_allclose(r1, r2, atol=1e-12)
        np.testing.assert_allclose(t1, t2, atol=1e-12)

    def test_optimal_threshold_matches_reference_formula(self, scored_labels):
        y, s = scored_labels
        thr, f1 = get_optimal_threshold(y, s)
        p, r, t = sklearn_metrics.precision_recall_curve(y, s)
        f1s = 2 * (p * r) / (p + r + 1e-8)
        idx = int(np.argmax(f1s))
        expect_thr = t[idx] if idx < len(t) else 0.5
        assert abs(thr - expect_thr) < 1e-12
        assert abs(f1 - f1s[idx]) < 1e-12

    def test_auroc_single_class_raises(self):
        with pytest.raises(ValueError):
            auroc(np.zeros(10, int), np.linspace(0, 1, 10))


class TestBinaryMetrics:
    def test_matches_reference_toy_example(self):
        # The reference's own __main__ check (/root/reference/src/utils.py:329-343).
        y_true = np.array([0, 0, 1, 1, 0, 1, 0, 1])
        y_pred = np.array([0, 1, 1, 1, 0, 0, 0, 1])
        y_scores = np.array([0.1, 0.6, 0.8, 0.9, 0.2, 0.4, 0.1, 0.7])
        m = calculate_metrics(y_true, y_pred, y_scores)
        assert abs(m["accuracy"] - 0.75) < 1e-12
        assert abs(m["precision"] - 3 / 4) < 1e-12
        assert abs(m["recall"] - 3 / 4) < 1e-12
        assert abs(m["specificity"] - 3 / 4) < 1e-12
        assert abs(m["auroc"] - sklearn_metrics.roc_auc_score(y_true, y_scores)) < 1e-12

    def test_single_class_scores_fallback_zero(self):
        m = calculate_metrics(np.zeros(5, int), np.zeros(5, int), np.linspace(0, 1, 5))
        assert m["auroc"] == 0.0 and m["auprc"] == 0.0

    def test_pixel_metrics(self):
        rng = np.random.default_rng(5)
        gt = (rng.uniform(size=(4, 16, 16)) > 0.8).astype(np.float32)
        pred = rng.uniform(size=(4, 16, 16)).astype(np.float32)
        m = calculate_pixel_metrics(gt, pred, threshold=0.5)
        expect_acc = np.mean((pred > 0.5).astype(int) == gt.astype(int))
        assert abs(m["accuracy"] - expect_acc) < 1e-12


class TestConfusion:
    def test_cm_matches_sklearn(self):
        rng = np.random.default_rng(6)
        t = rng.integers(0, 4, 1000)
        p = rng.integers(0, 4, 1000)
        ours = np.asarray(confusion_matrix_batch(jnp.asarray(p), jnp.asarray(t), 4))
        theirs = sklearn_metrics.confusion_matrix(t, p, labels=range(4))
        np.testing.assert_array_equal(ours, theirs)

    def test_cm_ignore_index(self):
        t = np.array([0, 1, 2, 255, 1])
        p = np.array([0, 1, 1, 2, 1])
        ours = np.asarray(confusion_matrix_batch(jnp.asarray(p), jnp.asarray(t), 3,
                                                 ignore_index=255))
        theirs = sklearn_metrics.confusion_matrix(t[t != 255], p[t != 255], labels=range(3))
        np.testing.assert_array_equal(ours, theirs)

    def test_running_metrics_match_reference_formulas(self):
        rng = np.random.default_rng(7)
        calc = SegmentationMetrics(num_classes=4)
        all_t, all_p = [], []
        for i in range(3):
            logits = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
            t = rng.integers(0, 4, (2, 16, 16))
            calc.update(jnp.asarray(logits), jnp.asarray(t))
            all_t.append(t.ravel())
            all_p.append(np.argmax(logits, axis=-1).ravel())
        t = np.concatenate(all_t)
        p = np.concatenate(all_p)
        cm = sklearn_metrics.confusion_matrix(t, p, labels=range(4))
        m = calc.compute_all_metrics()
        np.testing.assert_array_equal(m["confusion_matrix"], cm)

        inter = np.diag(cm)
        union = cm.sum(1) + cm.sum(0) - inter
        np.testing.assert_allclose(m["iou_per_class"], inter / np.maximum(union, 1e-8))
        assert abs(m["pixel_accuracy"] - inter.sum() / cm.sum()) < 1e-12

    def test_accepts_hard_predictions(self):
        calc = SegmentationMetrics(num_classes=3)
        calc.update(jnp.asarray([[0, 1], [2, 2]]), jnp.asarray([[0, 1], [2, 0]]))
        m = calc.compute_all_metrics()
        assert m["confusion_matrix"].sum() == 4


class TestAnomalyScore:
    def test_scalar_per_image(self):
        rng = np.random.default_rng(8)
        img = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
        recon = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
        s = np.asarray(anomaly_score(jnp.asarray(recon), jnp.asarray(img)))
        assert s.shape == (3,)
        expect = ((recon - img) ** 2).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(s, expect, rtol=1e-6)

    def test_pixel_map_shape(self):
        rng = np.random.default_rng(9)
        img = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        recon = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        m = np.asarray(anomaly_error_map(jnp.asarray(recon), jnp.asarray(img)))
        assert m.shape == (2, 16, 16)
        np.testing.assert_allclose(m, ((recon - img) ** 2).mean(axis=-1), rtol=1e-6)

    def test_l1_method(self):
        rng = np.random.default_rng(10)
        img = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
        recon = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
        s = np.asarray(anomaly_score(jnp.asarray(recon), jnp.asarray(img), method="l1"))
        np.testing.assert_allclose(s, np.abs(recon - img).mean(axis=(1, 2, 3)), rtol=1e-6)


def test_confusion_matrix_chunked_contraction_exact():
    """The chunked one-hot contraction (f32-exactness guard) equals the direct
    count for any chunk size, including chunk boundaries and ignore_index."""
    from tpu_unet.metrics.confusion import _confusion_matrix_impl

    rng = np.random.default_rng(11)
    t = rng.integers(0, 3, 1000).astype(np.int32)
    p = rng.integers(0, 3, 1000).astype(np.int32)
    expect = np.zeros((3, 3), np.int64)
    for a, b in zip(t, p):
        expect[a, b] += 1
    for max_exact in (7, 100, 999, 1000, 10**9):
        got = np.asarray(_confusion_matrix_impl(jnp.asarray(p), jnp.asarray(t), 3,
                                                max_exact=max_exact))
        np.testing.assert_array_equal(got, expect, err_msg=f"max_exact={max_exact}")
    # ignore_index with chunking
    expect_ig = expect.copy()
    expect_ig[2, :] = 0
    got = np.asarray(_confusion_matrix_impl(jnp.asarray(p), jnp.asarray(t), 3,
                                            ignore_index=2, max_exact=13))
    # rows for ignored target removed; ignored pixels contribute nothing
    assert got[2].sum() == 0
    np.testing.assert_array_equal(got[:2], expect_ig[:2])

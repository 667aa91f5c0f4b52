"""Loss function tests: numeric parity with torch-semantics formulas.

Where torch (CPU) is available we check exact parity against torch's own ops
(BCE/CE/MSE reference semantics) on random tensors — torch here is a test oracle
only; the framework itself is torch-free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.losses import (
    binary_focal_loss,
    combined_anomaly_loss,
    combined_segmentation_loss,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    mse_loss,
)
from tpu_unet.ops.ssim import ssim, ssim_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestAnomalyLosses:
    def test_mse_parity(self):
        a, b = rand((2, 16, 16, 3), 0), rand((2, 16, 16, 3), 1)
        ours = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
        theirs = float(F.mse_loss(torch.tensor(a), torch.tensor(b)))
        assert abs(ours - theirs) < 1e-6

    def test_binary_focal_parity(self):
        rng = np.random.default_rng(2)
        probs = rng.uniform(0.01, 0.99, (2, 16, 16, 1)).astype(np.float32)
        target = (rng.uniform(size=(2, 16, 16, 1)) > 0.8).astype(np.float32)
        ours = float(binary_focal_loss(jnp.asarray(probs), jnp.asarray(target)))
        bce = F.binary_cross_entropy(torch.tensor(probs), torch.tensor(target), reduction="none")
        pt = torch.exp(-bce)
        theirs = float((0.25 * (1 - pt) ** 2.0 * bce).mean())
        assert abs(ours - theirs) < 1e-6

    def test_combined_loss_weights(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        recon = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        amap = rng.uniform(0.01, 0.99, (2, 32, 32, 1)).astype(np.float32)
        mask = (rng.uniform(size=(2, 32, 32, 1)) > 0.9).astype(np.float32)
        out = combined_anomaly_loss(jnp.asarray(recon), jnp.asarray(amap),
                                    jnp.asarray(img), jnp.asarray(mask),
                                    recon_weight=2.0, seg_weight=0.5)
        expect = 2.0 * float(out["recon_loss"]) + 0.5 * float(out["seg_loss"])
        assert abs(float(out["total_loss"]) - expect) < 1e-6

    def test_focal_finite_at_saturated_sigmoid(self):
        """p == 1.0 exactly (sigmoid of logit ~17 in f32) must yield a finite
        loss AND finite gradients — the old 1e-12 clip rounded away and one
        saturated background pixel poisoned the training state with NaNs."""
        from tpu_unet.losses.anomaly import binary_focal_loss

        logits = jnp.asarray([17.0, 120.0, -120.0, 0.3], jnp.float32)
        t = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)  # all "wrong" extremes
        p = jax.nn.sigmoid(logits)
        assert float(p[0]) == 1.0  # the saturation actually happens in f32
        val = binary_focal_loss(p, t)
        assert bool(jnp.isfinite(val))
        g = jax.grad(lambda x: binary_focal_loss(jax.nn.sigmoid(x), t))(logits)
        assert bool(jnp.isfinite(g).all())

    def test_ssim_wired_in(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        recon = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        amap = rng.uniform(0.01, 0.99, (1, 32, 32, 1)).astype(np.float32)
        mask = np.zeros((1, 32, 32, 1), np.float32)
        out_mse = combined_anomaly_loss(jnp.asarray(recon), jnp.asarray(amap),
                                        jnp.asarray(img), jnp.asarray(mask))
        out_ssim = combined_anomaly_loss(jnp.asarray(recon), jnp.asarray(amap),
                                         jnp.asarray(img), jnp.asarray(mask),
                                         recon_loss_type="ssim")
        # SSIM recon loss must actually differ from MSE (reference defect: --use_ssim no-op).
        assert abs(float(out_mse["recon_loss"]) - float(out_ssim["recon_loss"])) > 1e-4


class TestSSIM:
    @pytest.mark.slow
    def test_banded_matches_depthwise_oracle(self):
        """The separable banded-matmul SSIM must match the 2-D depthwise-conv
        formulation (values, per-image means, and gradients), incl. non-square."""
        from tpu_unet.ops.ssim import _ssim_map_banded, _ssim_map_depthwise

        rng = np.random.default_rng(7)
        # Last two shapes have H or W <= window//2: taps land entirely in the
        # zero pad (regression: np.diag with negative size crashed there).
        for shape in [(2, 16, 16, 3), (1, 24, 16, 3), (2, 13, 17, 1),
                      (1, 4, 4, 3), (1, 3, 7, 1)]:
            a = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
            b = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
            banded = np.asarray(_ssim_map_banded(a, b, 11, 1.5))  # (N,C,H,W)
            oracle = np.asarray(_ssim_map_depthwise(a, b, 11, 1.5))  # (N,H,W,C)
            np.testing.assert_allclose(banded, np.transpose(oracle, (0, 3, 1, 2)),
                                       rtol=1e-4, atol=1e-5)
            g1 = jax.grad(lambda x: jnp.mean(_ssim_map_banded(x, b, 11, 1.5)))(a)
            g2 = jax.grad(lambda x: jnp.mean(_ssim_map_depthwise(x, b, 11, 1.5)))(a)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-3, atol=1e-6)

    def test_banded_matches_oracle_across_windows(self):
        """Banded == depthwise for non-default window sizes and sigmas (the
        public ssim() exposes both; only 11/1.5 is the reference default)."""
        from tpu_unet.ops.ssim import _ssim_map_banded, _ssim_map_depthwise

        rng = np.random.default_rng(13)
        a = jnp.asarray(rng.uniform(size=(1, 20, 14, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 20, 14, 3)).astype(np.float32))
        for window, sigma in [(3, 0.8), (5, 1.5), (7, 2.0), (15, 1.0)]:
            banded = np.asarray(_ssim_map_banded(a, b, window, sigma))
            oracle = np.asarray(_ssim_map_depthwise(a, b, window, sigma))
            np.testing.assert_allclose(banded, np.transpose(oracle, (0, 3, 1, 2)),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"window={window} sigma={sigma}")

    def test_identical_images(self):
        img = jnp.asarray(rand((1, 32, 32, 3), 5))
        assert float(ssim(img, img)) > 0.999
        assert abs(float(ssim_loss(img, img))) < 1e-3

    def test_parity_with_torch_reference_formula(self):
        """Check against the reference SSIMLoss math re-expressed in torch."""
        a = rand((2, 32, 32, 3), 6)
        b = rand((2, 32, 32, 3), 7)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))

        # Reference formula (train_utils.py:57-87) evaluated with torch as oracle.
        ta = torch.tensor(a).permute(0, 3, 1, 2)
        tb = torch.tensor(b).permute(0, 3, 1, 2)
        w = 11
        g = torch.tensor([float(np.exp(-((x - w // 2) ** 2) / (2 * 1.5**2))) for x in range(w)])
        g = (g / g.sum()).unsqueeze(1)
        win = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, w, w).contiguous()
        mu1 = F.conv2d(ta, win, padding=w // 2, groups=3)
        mu2 = F.conv2d(tb, win, padding=w // 2, groups=3)
        mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
        s1 = F.conv2d(ta * ta, win, padding=w // 2, groups=3) - mu1_sq
        s2 = F.conv2d(tb * tb, win, padding=w // 2, groups=3) - mu2_sq
        s12 = F.conv2d(ta * tb, win, padding=w // 2, groups=3) - mu1_mu2
        c1, c2 = 0.01**2, 0.03**2
        smap = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
        theirs = float(smap.mean())
        assert abs(ours - theirs) < 1e-4


class TestSegmentationLosses:
    def _data(self, seed=8, n=2, h=16, w=16, c=4):
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((n, h, w, c)).astype(np.float32)
        labels = rng.integers(0, c, (n, h, w)).astype(np.int32)
        return logits, labels

    def test_ce_parity(self):
        logits, labels = self._data()
        ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
        tl = torch.tensor(logits).permute(0, 3, 1, 2)
        tt = torch.tensor(labels).long()
        theirs = float(F.cross_entropy(tl, tt))
        assert abs(ours - theirs) < 1e-5

    def test_weighted_ce_parity(self):
        logits, labels = self._data(9)
        w = [1.0, 50.0, 50.0, 2.0]
        ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), class_weights=w))
        tl = torch.tensor(logits).permute(0, 3, 1, 2)
        tt = torch.tensor(labels).long()
        theirs = float(F.cross_entropy(tl, tt, weight=torch.tensor(w)))
        assert abs(ours - theirs) < 1e-5

    def test_dice_parity(self):
        logits, labels = self._data(10)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        ours = float(dice_loss(probs, jnp.asarray(labels)))

        tp = F.softmax(torch.tensor(logits).permute(0, 3, 1, 2), dim=1)
        tt = torch.tensor(labels).long()
        one_hot = F.one_hot(tt, 4).permute(0, 3, 1, 2).float()
        pf = tp.reshape(tp.size(0), tp.size(1), -1)
        tf_ = one_hot.reshape(one_hot.size(0), one_hot.size(1), -1)
        inter = (pf * tf_).sum(dim=2)
        union = pf.sum(dim=2) + tf_.sum(dim=2)
        dice = (2 * inter + 1e-8) / (union + 1e-8)
        theirs = float(1 - dice.mean())
        assert abs(ours - theirs) < 1e-5

    def test_focal_parity(self):
        logits, labels = self._data(11)
        ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
        tl = torch.tensor(logits).permute(0, 3, 1, 2)
        tt = torch.tensor(labels).long()
        ce = F.cross_entropy(tl, tt, reduction="none")
        pt = torch.exp(-ce)
        theirs = float((1.0 * (1 - pt) ** 2 * ce).mean())
        assert abs(ours - theirs) < 1e-5

    def test_combined_gating(self):
        logits, labels = self._data(12)
        out = combined_segmentation_loss(jnp.asarray(logits), jnp.asarray(labels),
                                         ce_weight=1.0, dice_weight=0.0, focal_weight=0.0)
        assert "dice_loss" not in out and "focal_loss" not in out
        assert abs(float(out["total_loss"]) - float(out["ce_loss"])) < 1e-7

        out2 = combined_segmentation_loss(jnp.asarray(logits), jnp.asarray(labels),
                                          ce_weight=1.0, dice_weight=1.0, focal_weight=0.5)
        expect = float(out2["ce_loss"]) + float(out2["dice_loss"]) + 0.5 * float(out2["focal_loss"])
        assert abs(float(out2["total_loss"]) - expect) < 1e-5

    def test_ignore_index(self):
        logits, labels = self._data(13)
        labels_ig = labels.copy()
        labels_ig[0, :4] = 255
        ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels_ig),
                                        ignore_index=255))
        tl = torch.tensor(logits).permute(0, 3, 1, 2)
        tt = torch.tensor(labels_ig).long()
        theirs = float(F.cross_entropy(tl, tt, ignore_index=255))
        assert abs(ours - theirs) < 1e-5


class TestSlicedCombinedLossEquivalence:
    """The channel-sliced fast path must match the (N,H,W,C) oracle path in
    values AND gradients across every configuration the trainers use."""

    CONFIGS = [
        dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.0),                  # gear default
        dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.0,
             class_weights=(1.0, 50.0, 50.0)),                                   # ksdd default (c=3)
        dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.5),
        dict(ce_weight=1.0, dice_weight=0.0, focal_weight=0.0, ignore_index=255),
        dict(ce_weight=0.0, dice_weight=1.0, focal_weight=0.0),
        dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.25, ignore_index=255,
             class_weights=(1.0, 2.0, 3.0)),
        dict(ce_weight=1.0, dice_weight=1.0, focal_weight=0.0,
             class_weights=(1.0, 1.0, 2.0, 0.5)),                                # gear 4-class
    ]

    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_value_and_grad_match(self, cfg):
        from tpu_unet.losses.segmentation import _combined_sliced, _combined_unsliced

        c = len(cfg.get("class_weights") or (0, 0, 0))
        rng = np.random.default_rng(21)
        logits = jnp.asarray(rng.standard_normal((2, 16, 16, c)).astype(np.float32))
        labels = rng.integers(0, c, (2, 16, 16)).astype(np.int32)
        if cfg.get("ignore_index") is not None:
            labels[0, :3] = cfg["ignore_index"]
        labels = jnp.asarray(labels)
        sw = jnp.asarray([1.0, 0.0], dtype=jnp.float32)

        full = dict(ce_weight=cfg.get("ce_weight", 1.0),
                    dice_weight=cfg.get("dice_weight", 1.0),
                    focal_weight=cfg.get("focal_weight", 0.0),
                    class_weights=cfg.get("class_weights"),
                    ignore_index=cfg.get("ignore_index"),
                    sample_weight=None)
        for sample_weight in (None, sw):
            full["sample_weight"] = sample_weight
            a = _combined_sliced(logits, labels, **full)
            b = _combined_unsliced(logits, labels, **full)
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                           rtol=1e-5, atol=1e-6, err_msg=k)

            ga = jax.grad(lambda l: _combined_sliced(l, labels, **full)["total_loss"])(logits)
            gb = jax.grad(lambda l: _combined_unsliced(l, labels, **full)["total_loss"])(logits)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_randomized_sweep_including_out_of_range_labels(self):
        """Seeded fuzz: random C/shape/weights/ignore_index draws, with some
        labels OUTSIDE [0, C) (neither path should diverge on them — both treat
        an out-of-range non-ignore label as a zero-one-hot row)."""
        from tpu_unet.losses.segmentation import _combined_sliced, _combined_unsliced

        rng = np.random.default_rng(99)
        for draw in range(12):
            c = int(rng.integers(2, 9))
            h, w = int(rng.integers(3, 12)), int(rng.integers(3, 12))
            n = int(rng.integers(1, 4))
            cfg = dict(
                ce_weight=float(rng.uniform(0, 2)),
                dice_weight=float(rng.uniform(0, 2)),
                focal_weight=float(rng.choice([0.0, rng.uniform(0, 1)])),
                class_weights=(tuple(rng.uniform(0.5, 5.0, c).round(2))
                               if rng.random() < 0.5 else None),
                ignore_index=(255 if rng.random() < 0.5 else None),
                sample_weight=None,
            )
            logits = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
            labels = rng.integers(0, c, (n, h, w)).astype(np.int32)
            labels[rng.random(labels.shape) < 0.05] = c      # out-of-range
            if cfg["ignore_index"] is not None:
                labels[rng.random(labels.shape) < 0.1] = 255
            labels = jnp.asarray(labels)
            a = _combined_sliced(logits, labels, **cfg)
            b = _combined_unsliced(logits, labels, **cfg)
            for k in a:
                np.testing.assert_allclose(
                    np.asarray(a[k]), np.asarray(b[k]), rtol=1e-4, atol=1e-5,
                    err_msg=f"draw {draw} key {k} cfg {cfg}")
            ga = jax.grad(lambda l: _combined_sliced(l, labels, **cfg)["total_loss"])(logits)
            gb = jax.grad(lambda l: _combined_unsliced(l, labels, **cfg)["total_loss"])(logits)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-3, atol=1e-5,
                                       err_msg=f"draw {draw} grad cfg {cfg}")

    def test_dispatch_uses_sliced_for_small_c(self):
        from tpu_unet.losses import segmentation as seg

        logits = jnp.zeros((1, 4, 4, 3))
        labels = jnp.zeros((1, 4, 4), jnp.int32)
        called = {}
        orig = seg._combined_sliced

        def spy(*a, **k):
            called["hit"] = True
            return orig(*a, **k)

        try:
            seg._combined_sliced = spy
            out = seg.combined_segmentation_loss(logits, labels)
        finally:
            seg._combined_sliced = orig
        assert called.get("hit") and "total_loss" in out

"""Gradient accumulation (grad_accum=G on the train-step factories).

Semantics pinned against an EAGER python-loop oracle built from the same
public pieces (train_transform + apply_fn + loss + jax.grad): G sequential
microbatches, BN batch_stats chained through, gradients averaged into ONE
optimizer update, loss scalars averaged, confusion matrices summed. This is
torch-style accumulation (each microbatch normalizes by its own BN batch
statistics) — it is NOT numerically the full-batch step, which is why the
oracle is the loop, not grad_accum=1 at the big batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.losses.anomaly import combined_anomaly_loss
from tpu_unet.losses.segmentation import combined_segmentation_loss
from tpu_unet.metrics.confusion import confusion_matrix_batch
from tpu_unet.models import AnomalyUNet, SegmentationUNet
from tpu_unet.ops.augment import train_transform
from tpu_unet.ops.seg_head import sliced_argmax
from tpu_unet.parallel import make_mesh, replicate, shard_batch
from tpu_unet.train import (
    AnomalyLossConfig,
    AugmentConfig,
    SegLossConfig,
    create_train_state,
    make_anomaly_train_step,
    make_optimizer,
    make_seg_train_step,
)

# Whole-file slow tier: multi-device numerics / PTQ sweeps (see pyproject markers).
pytestmark = pytest.mark.slow

AUG = AugmentConfig(degrees=0.0)  # rotation-free: cheap and exact on CPU


def anomaly_batch(n, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8)
    mask = (rng.uniform(size=(n, hw, hw, 1)) > 0.9).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(mask)


def seg_batch(n, hw=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8)
    lbl = rng.integers(0, c, (n, hw, hw)).astype(np.int32)
    return jnp.asarray(img), jnp.asarray(lbl)


def _anomaly_eager_accum(state, images_u8, masks, key, G, loss_cfg):
    """Reference semantics: eager loop over G microbatches."""
    n = images_u8.shape[0] // G
    keys = jax.random.split(key, G)
    stats = state.batch_stats
    gsum = jax.tree.map(jnp.zeros_like, state.params)
    loss_hist = []
    for g in range(G):
        img, msk = train_transform(images_u8[g * n:(g + 1) * n],
                                   masks[g * n:(g + 1) * n], keys[g],
                                   **AUG.kwargs())

        def loss_fn(params, stats=stats, img=img, msk=msk):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": stats},
                img, train=True, mutable=["batch_stats"])
            recon, amap = out
            losses = combined_anomaly_loss(recon, amap, img, msk,
                                           **loss_cfg.kwargs())
            return losses["total_loss"], (losses, mut["batch_stats"])

        grads, (losses, stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        gsum = jax.tree.map(jnp.add, gsum, grads)
        loss_hist.append(losses)
    state = state.apply_gradients(grads=jax.tree.map(lambda g: g / G, gsum))
    state = state.replace(batch_stats=stats)
    mean_losses = {k: float(np.mean([float(d[k]) for d in loss_hist]))
                   for k in loss_hist[0]}
    return state, mean_losses


class TestAnomalyGradAccum:
    @pytest.mark.slow
    def test_matches_eager_loop(self):
        model = AnomalyUNet(base_features=4)
        tx = make_optimizer("sgd", 1e-2, 0.0)
        cfg = AnomalyLossConfig()
        img, msk = anomaly_batch(n=8, seed=1)
        key = jax.random.key(9)

        state0 = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        step = make_anomaly_train_step(cfg, AUG, donate_state=False, grad_accum=2)
        state_a, ld_a = step(state0, img, msk, key)

        state0 = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        state_b, ld_b = _anomaly_eager_accum(state0, img, msk, key, 2, cfg)

        for k in ld_b:
            assert abs(float(ld_a[k]) - ld_b[k]) < 5e-6 * max(1.0, abs(ld_b[k])), k
        for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-6, atol=1e-6)
        for sa, sb in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                          jax.tree_util.tree_leaves(state_b.batch_stats)):
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                       rtol=1e-6, atol=1e-6)

    def test_differs_from_full_batch_only_via_bn(self):
        """Accumulation is a different (documented) estimator than the big
        batch — but it must still be a sane one: one optimizer step, finite
        losses, and params close to the full-batch step at these tiny LRs."""
        model = AnomalyUNet(base_features=4)
        tx = make_optimizer("sgd", 1e-3, 0.0)
        img, msk = anomaly_batch(n=8, seed=2)
        key = jax.random.key(3)

        def run(G):
            state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
            step = make_anomaly_train_step(AnomalyLossConfig(), AUG,
                                           donate_state=False, grad_accum=G)
            state, ld = step(state, img, msk, key)
            return state, float(ld["total_loss"])

        s1, l1 = run(1)
        s2, l2 = run(2)
        assert np.isfinite(l1) and np.isfinite(l2)
        assert int(s1.step) == int(s2.step) == 1
        p1 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(s1.params)])
        p2 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(s2.params)])
        # Same data, same-scale update: directions agree even though BN stats
        # and the per-microbatch augment keys differ.
        assert np.max(np.abs(p1 - p2)) < 1e-2

    def test_batch_not_divisible_raises(self):
        model = AnomalyUNet(base_features=4)
        tx = make_optimizer("sgd", 1e-2, 0.0)
        state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        step = make_anomaly_train_step(aug_cfg=AUG, donate_state=False,
                                       grad_accum=3)
        img, msk = anomaly_batch(n=8)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, img, msk, jax.random.key(0))

    def test_bad_factory_arg(self):
        with pytest.raises(ValueError, match="grad_accum"):
            make_anomaly_train_step(grad_accum=0)


class TestSegGradAccum:
    @pytest.mark.slow
    def test_matches_eager_loop_with_cm(self):
        model = SegmentationUNet(n_classes=3, base_features=4, dropout=0.0)
        tx = make_optimizer("sgd", 1e-2, 0.0)
        cfg = SegLossConfig()
        img, lbl = seg_batch(n=8, c=3, seed=4)
        key = jax.random.key(11)
        G = 4

        state0 = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        step = make_seg_train_step(3, cfg, AUG, donate_state=False, grad_accum=G)
        state_a, ld_a, cm_a = step(state0, img, lbl, key)

        # Eager oracle
        state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        n = img.shape[0] // G
        keys = jax.random.split(key, G)
        stats = state.batch_stats
        gsum = jax.tree.map(jnp.zeros_like, state.params)
        cm_sum = np.zeros((3, 3))
        loss_hist = []
        for g in range(G):
            k_aug, k_drop = jax.random.split(keys[g])
            im, lb = train_transform(img[g * n:(g + 1) * n],
                                     lbl[g * n:(g + 1) * n, ..., None].astype(jnp.int32),
                                     k_aug, **AUG.kwargs())
            lb = lb[..., 0]

            def loss_fn(params, stats=stats, im=im, lb=lb, k_drop=k_drop):
                logits, mut = state.apply_fn(
                    {"params": params, "batch_stats": stats}, im, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k_drop})
                losses = combined_segmentation_loss(logits, lb, **cfg.kwargs())
                return losses["total_loss"], (losses, mut["batch_stats"], logits)

            grads, (losses, stats, logits) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            loss_hist.append(losses)
            cm_sum += np.asarray(confusion_matrix_batch(
                sliced_argmax(logits), lb.astype(jnp.int32), 3, None))
        state_b = state.apply_gradients(grads=jax.tree.map(lambda g: g / G, gsum))
        state_b = state_b.replace(batch_stats=stats)

        np.testing.assert_allclose(np.asarray(cm_a), cm_sum)
        for k in loss_hist[0]:
            mean = float(np.mean([float(d[k]) for d in loss_hist]))
            # f32 mean-of-G rounds differently on device vs np.mean of floats
            assert abs(float(ld_a[k]) - mean) < 5e-6 * max(1.0, abs(mean)), k
        for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-6, atol=1e-6)

    def test_without_confusion(self):
        model = SegmentationUNet(n_classes=3, base_features=4)
        tx = make_optimizer("adam", 1e-3, 0.0)
        state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        step = make_seg_train_step(3, SegLossConfig(), AUG, with_confusion=False,
                                   donate_state=False, grad_accum=2)
        state, ld, cm = step(state, *seg_batch(n=4, c=3), jax.random.key(0))
        assert cm is None
        assert np.isfinite(float(ld["total_loss"]))


class TestGradAccumSharded:
    def test_dp_mesh_matches_single_device(self, devices):
        """8-way data-parallel accumulation == single-device accumulation:
        the (G, B/G) reshape must partition cleanly over the 'data' axis."""
        model = SegmentationUNet(n_classes=3, base_features=4, dropout=0.0)
        tx = make_optimizer("sgd", 1e-2, 0.0)
        img, lbl = seg_batch(n=16, c=3, seed=6)

        def run(mesh_size):
            state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
            step = make_seg_train_step(3, aug_cfg=AUG, donate_state=False,
                                       grad_accum=2)
            if mesh_size > 1:
                mesh = make_mesh(n_data=mesh_size)
                state = replicate(mesh, state)
                b = shard_batch(mesh, {"image": np.asarray(img),
                                       "mask": np.asarray(lbl)})
                bi, bl = b["image"], b["mask"]
            else:
                bi, bl = img, lbl
            state, ld, cm = step(state, bi, bl, jax.random.key(2))
            return float(ld["total_loss"]), np.asarray(cm), state

        loss1, cm1, state1 = run(1)
        loss8, cm8, state8 = run(8)
        assert abs(loss1 - loss8) < 1e-5
        np.testing.assert_array_equal(cm1, cm8)
        p1 = jax.tree_util.tree_leaves(state1.params)[0]
        p8 = jax.tree_util.tree_leaves(state8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)

    @pytest.mark.slow
    def test_spatial_mesh_matches_unsharded(self, devices):
        """Accumulation under H ('space') sharding — the seg CLIs allow
        --n_space with --grad_accum, so the (G, B/G, H, W) reshape must
        partition over BOTH mesh axes without numeric drift."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_unet.models import SegmentationUNet

        model = SegmentationUNet(n_classes=3, base_features=4, dropout=0.0)
        tx = make_optimizer("sgd", 1e-2, 0.0)
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (4, 64, 32, 3), dtype=np.uint8)
        lbl = rng.integers(0, 3, (4, 64, 32)).astype(np.int32)

        def run(spatial):
            state = create_train_state(model, jax.random.key(0), (1, 64, 32, 3), tx)
            step = make_seg_train_step(3, aug_cfg=AUG, donate_state=False,
                                       grad_accum=2)
            bi, bl = img, lbl
            if spatial:
                mesh = make_mesh(n_data=2, n_space=4)
                state = replicate(mesh, state)
                bi = jax.device_put(img, NamedSharding(mesh, P("data", "space")))
                bl = jax.device_put(lbl, NamedSharding(mesh, P("data", "space")))
            state, ld, cm = step(state, bi, bl, jax.random.key(4))
            return float(ld["total_loss"]), np.asarray(cm), state

        loss1, cm1, state1 = run(False)
        loss8, cm8, state8 = run(True)
        assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1))
        np.testing.assert_array_equal(cm1, cm8)
        p1 = jax.tree_util.tree_leaves(state1.params)[0]
        p8 = jax.tree_util.tree_leaves(state8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   rtol=2e-4, atol=2e-5)

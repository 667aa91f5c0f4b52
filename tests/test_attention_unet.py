"""Attention U-Net (models/attention.py): gates, shapes, folding, sharding, CLI.

The gate layers are deliberately named conv{i}/bn{i} (in g/x child scopes plus
the psi conv2/bn2 pair) so the GENERIC subsystem walkers cover them — these
tests pin exactly that: BN folding reproduces the unfolded forward, and the
tensor-parallel rules column/row-shard the gate projections.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_unet.models import AttentionUNet, SegmentationUNet, build_model
from tpu_unet.train import (
    AugmentConfig,
    create_train_state,
    make_optimizer,
    make_seg_eval_step,
    make_seg_train_step,
)

FAST_AUG = AugmentConfig(degrees=0.0, p_flip=0.0, brightness=0.0, contrast=0.0,
                         saturation=0.0, hue=0.0)

# Pinned at base_features=64, 4 classes (the CLI default config): the plain
# SegmentationUNet is 31,037,828 there, and the four gates add their 1x1
# projections on top (W_g reads the WIDE pre-upsample decoder tensor — the
# coarse gate, arXiv:1804.03999 §3.1) — recorded once from the implementation
# and pinned so the gate wiring can't drift silently.
EXPECTED_PARAMS_B64 = 31_562_476


def seg_batch(n=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    lbl = rng.integers(0, 4, (n, 32, 32), dtype=np.uint8)
    return img, lbl


def make_state(bf=8, opt="adam", lr=1e-3, **kw):
    model = AttentionUNet(n_classes=4, base_features=bf, **kw)
    tx = make_optimizer(opt, lr, 1e-4 if opt == "adam" else 0.0)
    return create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


class TestModel:
    def test_output_shapes(self):
        state = make_state()
        out = state.apply_fn({"params": state.params,
                              "batch_stats": state.batch_stats},
                             np.zeros((2, 32, 32, 3), np.float32), train=False)
        assert out.shape == (2, 32, 32, 4)

    def test_param_count_pin(self):
        model = AttentionUNet(n_classes=4, base_features=64)
        v = jax.eval_shape(
            lambda k: model.init(k, np.zeros((1, 32, 32, 3), np.float32),
                                 train=False),
            jax.random.key(0))
        assert n_params(v["params"]) == EXPECTED_PARAMS_B64

    def test_gate_params_exist_and_matter(self):
        """Each decoder stage owns an att gate; mangling one changes the
        output (the gate is live, not dead weight)."""
        import flax

        state = make_state()
        for k in ("up1", "up2", "up3", "up4"):
            att = state.params["decoder"][k]["att"]
            assert set(att) == {"g", "x", "conv2", "bn2"}, (k, set(att))
            assert att["conv2"]["kernel"].shape[-1] == 1  # psi -> 1 channel

        x = np.random.default_rng(1).uniform(size=(2, 32, 32, 3)).astype(np.float32)

        def run(params):
            return np.asarray(state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=False))

        mangled = flax.core.unfreeze(jax.tree_util.tree_map(lambda p: p,
                                                            state.params))
        mangled["decoder"]["up2"]["att"]["conv2"]["kernel"] = (
            mangled["decoder"]["up2"]["att"]["conv2"]["kernel"] + 7.0)
        assert not np.allclose(run(state.params), run(mangled))

    def test_plain_models_unchanged(self):
        """attention defaults to False: SegmentationUNet's param tree has no
        gate entries and its pinned count is untouched."""
        model = SegmentationUNet(n_classes=4)
        v = jax.eval_shape(
            lambda k: model.init(k, np.zeros((1, 32, 32, 3), np.float32),
                                 train=False),
            jax.random.key(0))
        assert n_params(v["params"]) == 31_037_828
        assert "att" not in v["params"]["decoder"]["up1"]

    def test_non_divisible_size_traces(self):
        """Odd extents: W_x's stride-2 output crops to the coarse grid (ceil
        vs floor) and alpha resizes to the skip's exact extent."""
        state = make_state()
        out = state.apply_fn({"params": state.params,
                              "batch_stats": state.batch_stats},
                             np.zeros((1, 36, 36, 3), np.float32), train=False)
        assert out.shape == (1, 36, 36, 4)

    def test_bilinear_mode(self):
        state = make_state(bilinear=True)
        out = state.apply_fn({"params": state.params,
                              "batch_stats": state.batch_stats},
                             np.zeros((1, 32, 32, 3), np.float32), train=False)
        assert out.shape == (1, 32, 32, 4)

    def test_build_model_aliases(self):
        for name in ("attn_unet", "attention_unet", "attunet"):
            assert isinstance(build_model(name, n_classes=4), AttentionUNet)

    def test_deep_supervision_rejected(self):
        with pytest.raises(ValueError, match="unetpp"):
            build_model("attn_unet", n_classes=4, deep_supervision=True)

    def test_heads_rejected(self):
        with pytest.raises(ValueError, match="heads"):
            build_model("attn_unet", n_classes=4, heads=2)


class TestTraining:
    def test_train_step_loss_decreases(self):
        state = make_state()
        step = make_seg_train_step(num_classes=4, aug_cfg=FAST_AUG,
                                   donate_state=False)
        img, lbl = seg_batch()
        losses = []
        for i in range(5):
            state, ld, cm = step(state, img, lbl, jax.random.key(i))
            losses.append(float(ld["total_loss"]))
        assert losses[-1] < losses[0]
        assert cm.shape == (4, 4) and int(np.asarray(cm).sum()) == 4 * 32 * 32

    def test_eval_step(self):
        state = make_state()
        step = make_seg_eval_step(num_classes=4)
        img, lbl = seg_batch()
        losses, preds, cm = step(state, img, lbl)
        assert preds.shape == (4, 32, 32)
        assert np.isfinite(float(losses["total_loss"]))
        assert int(np.asarray(cm).sum()) == 4 * 32 * 32


class TestFolding:
    def test_fold_bn_covers_gates(self):
        """The generic conv{i}/bn{i} walker folds the gate BNs too: the folded
        model's eval forward matches the unfolded one."""
        from tpu_unet.ops.fold_bn import fold_batchnorm

        state = make_state()
        # A few train passes so BN running stats are non-trivial.
        step = make_seg_train_step(num_classes=4, aug_cfg=FAST_AUG,
                                   donate_state=False)
        img, lbl = seg_batch()
        for i in range(3):
            state, _, _ = step(state, img, lbl, jax.random.key(i))

        x = np.random.default_rng(2).uniform(size=(2, 32, 32, 3)).astype(np.float32)
        ref = state.apply_fn({"params": state.params,
                              "batch_stats": state.batch_stats}, x, train=False)
        folded, stats = fold_batchnorm(state.params, state.batch_stats)
        # The gate BNs were actually folded (identity stats left behind).
        att_bn = stats["decoder"]["up1"]["att"]["g"]["bn1"]
        np.testing.assert_array_equal(np.asarray(att_bn["mean"]), 0.0)
        np.testing.assert_array_equal(np.asarray(att_bn["var"]), 1.0)
        out = state.apply_fn({"params": folded, "batch_stats": stats},
                             x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


class TestTensorParallel:
    def test_tp_specs_cover_gates(self, devices):
        """Gate projections inherit the Megatron pattern from their names:
        g/conv1 and x/conv1 column-shard F_int, psi (conv2) row-shards its
        F_int contraction, psi's 1-channel bn2 stays replicated."""
        from tpu_unet.parallel import make_mesh
        from tpu_unet.parallel.tensor import tp_state_sharding

        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        state = make_state(bf=8)
        sh = tp_state_sharding(mesh, state)
        att = sh.params["decoder"]["up1"]["att"]
        assert att["g"]["conv1"]["kernel"].spec == P(None, None, None, "model")
        assert att["x"]["conv1"]["kernel"].spec == P(None, None, None, "model")
        assert att["g"]["bn1"]["scale"].spec == P("model")
        assert att["conv2"]["kernel"].spec == P(None, None, "model", None)
        assert att["bn2"]["scale"].spec == P()  # 1 channel: replicated

    @pytest.mark.slow
    def test_tp_step_matches_single_device(self, devices):
        from tpu_unet.parallel import make_mesh, shard_batch, shard_state

        img, lbl = seg_batch(n=8, seed=5)
        step = make_seg_train_step(num_classes=4, aug_cfg=FAST_AUG,
                                   donate_state=False)

        def run(tp):
            state = make_state(opt="sgd", lr=1e-2)
            bi, bl = img, lbl
            if tp:
                mesh = make_mesh(n_data=2, n_space=1, n_model=4)
                state = shard_state(mesh, state, tp=True)
                b = shard_batch(mesh, {"i": img, "l": lbl})
                bi, bl = b["i"], b["l"]
            state, ld, _ = step(state, bi, bl, jax.random.key(2))
            return float(ld["total_loss"])

        assert abs(run(False) - run(True)) < 1e-5


class TestQuantize:
    @pytest.mark.slow
    def test_quantized_tracks_float(self):
        """int8 PTQ covers the gated arch: heavy convs quantize, the gate's
        1x1 projections run in float on dequantized operands (ops/quantize.py
        ``_gate_float``); output tracks the float model within the same 8-bit
        envelope the other architectures are held to."""
        import jax.numpy as jnp

        from tpu_unet.ops.augment import eval_transform
        from tpu_unet.ops.quantize import (calibrate_absmax, full_fold,
                                           make_quantized_forward,
                                           quantize_model)

        model = AttentionUNet(n_classes=3, base_features=4)
        rng = np.random.default_rng(1)
        x0 = jax.random.normal(jax.random.key(100), (2, 32, 32, 3))
        v = model.init(jax.random.key(0), x0, train=False)
        for i in range(3):
            xi = jax.random.normal(jax.random.key(200 + i), (2, 32, 32, 3))
            _, mut = model.apply(v, xi, train=True, mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.key(300 + i)})
            v = {"params": v["params"], "batch_stats": mut["batch_stats"]}

        fparams = full_fold(v["params"], v["batch_stats"])
        calib = [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
                 for _ in range(3)]
        absmax = calibrate_absmax("attn_unet", fparams, calib)
        # The gated skips got their own calibration tags.
        assert "decoder/up1/att/out" in absmax
        qparams = quantize_model("attn_unet", fparams, absmax)
        # Gate layers stayed float (no int8 kernel/w_scale pair).
        att = qparams["layers"]["decoder"]["up1"]["att"]
        assert "w_scale" not in att["conv2"]
        assert att["conv2"]["kernel"].dtype == jnp.float32

        fwd = jax.jit(make_quantized_forward("attn_unet"))
        images = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3),
                                          dtype=np.uint8))
        ref = np.asarray(model.apply(v, eval_transform(images), train=False))
        out = np.asarray(fwd(qparams, images))
        err = np.abs(ref - out)
        spread = max(float(ref.max() - ref.min()), 1e-3)
        assert float(err.max()) <= 0.25 * spread, (err.max(), spread)
        assert float(err.mean()) <= 0.03 * spread, (err.mean(), spread)


@pytest.mark.slow
def test_train_then_eval_cli(devices, tmp_path):
    """Real-CLI roundtrip: train_gear --model attn_unet, then test_gear
    restores the checkpoint (the gate params must survive Orbax), in float
    and through the int8 PTQ eval path."""
    from tests.test_data import make_gear
    from tpu_unet.cli.test_gear import main as test_main
    from tpu_unet.cli.train_gear import main as train_main

    root = make_gear(str(tmp_path / "gear"), n_per_split=8, size=32)
    exp = train_main([
        "--data_root", root, "--image_size", "32", "--epochs", "1",
        "--batch_size", "8", "--val_freq", "1", "--num_workers", "2",
        "--save_dir", str(tmp_path / "out"), "--base_features", "8",
        "--precision", "f32", "--model", "attn_unet",
    ])
    best = os.path.join(exp, "checkpoints", "best_model")
    assert os.path.isdir(best)
    result = test_main([
        "--data_root", root, "--image_size", "32", "--batch_size", "8",
        "--num_workers", "2", "--checkpoint", best, "--base_features", "8",
        "--precision", "f32", "--model", "attn_unet",
        "--output_dir", str(tmp_path / "eval"),
    ])
    assert result is not None
    assert np.isfinite(result["overall_metrics"]["mean_iou"])
    q = test_main([
        "--data_root", root, "--image_size", "32", "--batch_size", "8",
        "--num_workers", "2", "--checkpoint", best, "--base_features", "8",
        "--precision", "f32", "--model", "attn_unet",
        "--quantize", "int8", "--output_dir", str(tmp_path / "eval_q"),
    ])
    assert q is not None
    assert np.isfinite(q["overall_metrics"]["mean_iou"])

"""Tensor (model) parallelism: Megatron channel sharding for the UNet.

parallel/tensor.py shards each DoubleConv's conv1 kernel on C_out (column),
conv2 on C_in (row, one GSPMD all-reduce per block), bn1 + transposed convs on
their channel dim — per-channel math partitions exactly, so a TP step must
reproduce unsharded numerics at f32 summation-order tolerance (measured 2e-7
over 3 SGD steps).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_unet.models import AnomalyUNet, SegmentationUNet
from tpu_unet.parallel import make_mesh, shard_batch, shard_state
from tpu_unet.parallel.fsdp import sharded_fraction
from tpu_unet.parallel.tensor import tp_state_sharding
from tpu_unet.train import (
    AugmentConfig,
    create_train_state,
    make_anomaly_eval_step,
    make_anomaly_train_step,
    make_optimizer,
    make_seg_train_step,
)

# Whole-file slow tier: multi-device numerics / PTQ sweeps (see pyproject markers).
pytestmark = pytest.mark.slow

FAST_AUG = AugmentConfig(degrees=0.0, p_flip=0.0, brightness=0.0, contrast=0.0,
                         saturation=0.0, hue=0.0)


def anomaly_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    msk = (rng.uniform(size=(n, 32, 32, 1)) > 0.9).astype(np.float32)
    return img, msk


def tiny_state(model=None, opt="sgd", lr=1e-2, wd=0.0, bf=8):
    model = model or AnomalyUNet(base_features=bf)
    tx = make_optimizer(opt, lr, wd)
    return create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)


class TestSpecAssignment:
    def test_double_conv_column_row_pattern(self, devices):
        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        state = tiny_state()
        sh = tp_state_sharding(mesh, state)
        inc = sh.params["encoder"]["inc"]
        assert inc["conv1"]["kernel"].spec == P(None, None, None, "model")
        assert inc["conv2"]["kernel"].spec == P(None, None, "model", None)
        assert inc["bn1"]["scale"].spec == P("model")
        assert inc["bn1"]["bias"].spec == P("model")
        assert inc["bn2"]["scale"].spec == P()  # full activations after the
        assert inc["bn2"]["bias"].spec == P()   # row conv's all-reduce
        # BN running stats mirror the param placement.
        assert sh.batch_stats["encoder"]["inc"]["bn1"]["mean"].spec == P("model")
        assert sh.batch_stats["encoder"]["inc"]["bn2"]["var"].spec == P()

    def test_transposed_conv_and_head(self, devices):
        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        state = tiny_state()
        sh = tp_state_sharding(mesh, state)
        # Up blocks: ConvTranspose column-sharded (kernel + bias).
        up = sh.params["decoder_seg"]["up_seg1"]["up"]
        assert up["kernel"].spec == P(None, None, None, "model")
        assert up["bias"].spec == P("model")
        # 1x1 output heads: C_out=1/3, not divisible -> replicated.
        assert sh.params["outc_seg"]["conv"]["kernel"].spec == P()

    def test_adam_moments_mirror_params(self, devices):
        """mu/nu mirror the params tree (module names in the path), so the
        column/row placement reaches them wherever optax nests the state
        (inject_hyperparams wraps the adam state)."""
        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        state = tiny_state(opt="adam")
        sh = tp_state_sharding(mesh, state)
        got = {}
        for path, s in jax.tree_util.tree_leaves_with_path(sh.opt_state):
            names = [str(getattr(k, "key", getattr(k, "name", "")))
                     for k in path]
            if "mu" in names and "inc" in names and names[-1] == "kernel":
                if "conv1" in names:
                    got["conv1"] = s.spec
                elif "conv2" in names:
                    got["conv2"] = s.spec
        assert got["conv1"] == P(None, None, None, "model")
        assert got["conv2"] == P(None, None, "model", None)

    def test_indivisible_channels_stay_replicated(self, devices):
        # base_features=4 with n_model=8: C=4 and the (3,3,3,4) stem can't
        # shard; deeper C=32/64 can. Nothing errors.
        mesh = make_mesh(n_data=1, n_space=1, n_model=8)
        state = tiny_state(bf=4)
        sh = tp_state_sharding(mesh, state)
        assert sh.params["encoder"]["inc"]["conv1"]["kernel"].spec == P()
        assert sh.params["encoder"]["down3"]["conv"]["conv1"]["kernel"].spec == \
            P(None, None, None, "model")

    def test_requires_model_axis(self, devices):
        mesh = make_mesh(n_data=8)  # no 'model' axis
        with pytest.raises(ValueError, match="model"):
            tp_state_sharding(mesh, tiny_state())

    def test_fsdp_composition_covers_tp_replicated_leaves(self, devices):
        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        state = tiny_state(bf=8)
        tp_only = tp_state_sharding(mesh, state)
        both = tp_state_sharding(mesh, state, fsdp=True, min_size=0)
        # The stem kernel (3,3,3,8): TP shards C_out=8 over 4 — fine either
        # way; bn2 scale (8,) is TP-replicated but FSDP-shardable over data=2.
        assert tp_only.params["encoder"]["inc"]["bn2"]["scale"].spec == P()
        assert both.params["encoder"]["inc"]["bn2"]["scale"].spec == P("data")
        # TP-sharded leaves stay TP-only (no double sharding).
        assert both.params["encoder"]["inc"]["conv1"]["kernel"].spec == \
            P(None, None, None, "model")


class TestNumerics:
    def _run(self, img, msk, tp=False, fsdp=False, steps=3, opt="sgd"):
        state = tiny_state(opt=opt)
        step = make_anomaly_train_step(aug_cfg=FAST_AUG, donate_state=False)
        bi, bm = img, msk
        if tp:
            mesh = make_mesh(n_data=2, n_space=1, n_model=4)
            state = shard_state(mesh, state, tp=True, fsdp=fsdp)
            b = shard_batch(mesh, {"i": img, "m": msk})
            bi, bm = b["i"], b["m"]
        losses = []
        for i in range(steps):
            state, ld = step(state, bi, bm, jax.random.key(i))
            losses.append(float(ld["total_loss"]))
        return losses, state

    @pytest.mark.slow
    def test_tp_sgd_matches_single_device(self, devices):
        img, msk = anomaly_batch(seed=3)
        l1, s1 = self._run(img, msk)
        lt, st = self._run(img, msk, tp=True)
        np.testing.assert_allclose(l1, lt, rtol=0, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # Layout survives the compiled steps (no silent re-replication).
        assert sharded_fraction(st.params) > 0.9

    def test_tp_plus_fsdp_matches(self, devices):
        img, msk = anomaly_batch(seed=4)
        l1, s1 = self._run(img, msk)
        lt, st = self._run(img, msk, tp=True, fsdp=True)
        np.testing.assert_allclose(l1, lt, rtol=0, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_tp_adam_first_step(self, devices):
        img, msk = anomaly_batch(seed=5)
        l1, _ = self._run(img, msk, steps=1, opt="adam")
        lt, _ = self._run(img, msk, tp=True, steps=1, opt="adam")
        assert abs(l1[0] - lt[0]) < 1e-5

    def test_eval_on_tp_state(self, devices):
        img, msk = anomaly_batch(seed=6)
        _, st = self._run(img, msk, tp=True, steps=1)
        mesh = make_mesh(n_data=2, n_space=1, n_model=4)
        ev = make_anomaly_eval_step()
        b = shard_batch(mesh, {"i": img, "m": msk})
        out = ev(st, b["i"], b["m"])
        assert np.isfinite(float(out["losses"]["total_loss"]))

    def test_tp_seg_step_with_dropout(self, devices):
        """SegmentationUNet adds bottleneck dropout + CM contraction; TP must
        reproduce the unsharded step (same dropout key => same mask)."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
        lbl = rng.integers(0, 4, (8, 32, 32), dtype=np.uint8)
        step = make_seg_train_step(num_classes=4, aug_cfg=FAST_AUG,
                                   donate_state=False)

        def run(tp):
            model = SegmentationUNet(n_classes=4, base_features=8)
            tx = make_optimizer("sgd", 1e-2, 0.0)
            state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
            bi, bl = img, lbl
            if tp:
                mesh = make_mesh(n_data=2, n_space=1, n_model=4)
                state = shard_state(mesh, state, tp=True)
                b = shard_batch(mesh, {"i": img, "l": lbl})
                bi, bl = b["i"], b["l"]
            state, ld, cm = step(state, bi, bl, jax.random.key(1))
            return float(ld["total_loss"]), np.asarray(cm)

        l1, cm1 = run(False)
        lt, cmt = run(True)
        assert abs(l1 - lt) < 1e-5
        np.testing.assert_array_equal(cm1, cmt)


class TestCLIWiring:
    @pytest.mark.slow
    def test_seg_train_cli_3d_mesh(self, devices, tmp_path):
        """--n_model reaches the placement through the real seg trainer on the
        full 2x2x2 data x space x model mesh."""
        from tests.test_data import make_gear
        from tpu_unet.cli.train_gear import main as train_main

        root = make_gear(str(tmp_path / "gear"), n_per_split=8, size=32)
        out = train_main([
            "--data_root", root, "--image_size", "32", "--epochs", "1",
            "--batch_size", "8", "--val_freq", "1", "--num_workers", "2",
            "--save_dir", str(tmp_path / "out"), "--base_features", "8",
            "--precision", "f32", "--n_devices", "2", "--n_space", "2",
            "--n_model", "2",
        ])
        assert out is not None


class TestMesh3D:
    def test_three_axis_mesh(self, devices):
        mesh = make_mesh(n_data=2, n_space=2, n_model=2)
        assert mesh.devices.shape == (2, 2, 2)
        assert mesh.axis_names == ("data", "space", "model")

    def test_two_axis_default_unchanged(self, devices):
        mesh = make_mesh(n_data=4, n_space=2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "space")

    def test_oversubscription_raises(self, devices):
        with pytest.raises(ValueError):
            make_mesh(n_data=4, n_space=2, n_model=2)

    def test_defaulted_data_axis_oversubscription_raises(self, devices):
        # n_model larger than the device count with n_data defaulted used to
        # floor n_data to 0 and build an empty mesh that failed later with a
        # cryptic XLA error; now it's a clear up-front ValueError.
        with pytest.raises(ValueError, match="devices"):
            make_mesh(n_model=16)

    def test_nonpositive_axis_sizes_raise(self, devices):
        for kw in ({"n_model": 0}, {"n_space": 0}, {"n_data": 0},
                   {"n_model": -1}):
            with pytest.raises(ValueError, match=">= 1"):
                make_mesh(**kw)

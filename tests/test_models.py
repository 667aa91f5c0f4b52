"""Model family tests: shapes, param-count parity with the reference, dtypes.

Golden parameter counts are the reference's torch counts (SURVEY.md §2.2, computed
from /root/reference/src/model.py): UNet(3,1,transposed)=31,037,633;
SegmentationUNet(4 classes)=31,037,828; AnomalyUNet=43,228,228.
"""

import jax
import jax.numpy as jnp
import pytest

from tpu_unet.core.precision import BF16_POLICY
from tpu_unet.models import UNet, SegmentationUNet, AnomalyUNet, build_model


def n_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def init_model(model, shape=(1, 64, 64, 3), train=False):
    variables = model.init(jax.random.key(0), jnp.zeros(shape, jnp.float32), train=train)
    return variables


class TestParamCounts:
    @pytest.mark.slow
    def test_unet_transposed(self):
        v = init_model(UNet(n_channels=3, n_classes=1, bilinear=False))
        assert n_params(v["params"]) == 31_037_633

    @pytest.mark.slow
    def test_segmentation_unet(self):
        v = init_model(SegmentationUNet(n_channels=3, n_classes=4, dropout=0.1))
        assert n_params(v["params"]) == 31_037_828

    def test_anomaly_unet(self):
        v = init_model(AnomalyUNet(n_channels=3))
        assert n_params(v["params"]) == 43_228_228


class TestShapes:
    def test_unet_output_shape(self):
        m = UNet(n_classes=1)
        v = init_model(m)
        out = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 64, 64, 1)
        assert out.dtype == jnp.float32

    def test_unet_bilinear_output_shape(self):
        m = UNet(n_classes=1, bilinear=True)
        v = init_model(m)
        out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
        assert out.shape == (1, 64, 64, 1)

    def test_seg_unet_output_shape(self):
        m = SegmentationUNet(n_classes=4)
        v = init_model(m)
        out = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 64, 64, 4)

    def test_anomaly_unet_output_shapes_and_range(self):
        m = AnomalyUNet()
        v = init_model(m)
        recon, amap = m.apply(v, jnp.ones((1, 64, 64, 3)), train=False)
        assert recon.shape == (1, 64, 64, 3)
        assert amap.shape == (1, 64, 64, 1)
        assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0
        assert float(amap.min()) >= 0.0 and float(amap.max()) <= 1.0

    def test_elongated_input(self):
        # KolektorSDD's 1024x512 aspect; use a small non-square stand-in.
        m = SegmentationUNet(n_classes=3)
        v = init_model(m)
        out = m.apply(v, jnp.zeros((1, 128, 64, 3)), train=False)
        assert out.shape == (1, 128, 64, 3)

    def test_non_pow2_input_pads_in_up(self):
        # Odd sizes exercise the pad-to-skip path in Up.
        m = UNet(n_classes=1)
        v = init_model(m, shape=(1, 48, 48, 3))
        out = m.apply(v, jnp.zeros((1, 50, 50, 3)), train=False)
        assert out.shape == (1, 50, 50, 1)


class TestTrainMode:
    def test_batch_stats_updated(self):
        m = UNet(n_classes=1)
        v = init_model(m, train=True)
        x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
        out, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 64, 64, 1)
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(old, new))

    def test_dropout_needs_rng_and_is_stochastic(self):
        m = SegmentationUNet(n_classes=4, dropout=0.5)
        v = init_model(m, train=False)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        out1, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(2)})
        out2, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(3)})
        assert float(jnp.abs(out1 - out2).max()) > 0

    def test_eval_deterministic(self):
        m = SegmentationUNet(n_classes=4, dropout=0.5)
        v = init_model(m)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        out1 = m.apply(v, x, train=False)
        out2 = m.apply(v, x, train=False)
        assert jnp.array_equal(out1, out2)


class TestPolicy:
    @pytest.mark.slow
    def test_bf16_policy_param_dtype_stays_f32(self):
        m = UNet(n_classes=1, policy=BF16_POLICY)
        v = init_model(m)
        for leaf in jax.tree_util.tree_leaves(v["params"]):
            assert leaf.dtype == jnp.float32
        out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
        assert out.dtype == jnp.float32  # outputs cast back for losses/metrics


def test_build_model():
    assert isinstance(build_model("unet"), UNet)
    assert isinstance(build_model("anomaly_unet"), AnomalyUNet)
    assert isinstance(build_model("seg_unet", n_classes=4), SegmentationUNet)
    with pytest.raises(ValueError):
        build_model("nope")

"""Fused int8 Pallas conv (ops/pallas/int8_conv.py): bit-exactness vs the
unfused XLA conv+requant path it replaces (interpret mode on CPU; the on-chip
equivalence + speed measurements live in tools/bench_int8_conv.py)."""

import numpy as np
import pytest

from tpu_unet.ops.pallas.int8_conv import (conv3x3_int8_fused,
                                           conv3x3_int8_reference)


@pytest.mark.parametrize("shape,row_tile", [
    ((2, 8, 8, 16, 24), 4),     # Cin != Cout
    ((1, 16, 24, 8, 8), 8),     # non-square spatial
    ((3, 8, 16, 32, 16), 8),    # row_tile == H
])
@pytest.mark.parametrize("relu", [True, False])
def test_fused_matches_unfused_bitwise(shape, row_tile, relu):
    n, h, w, cin, cout = shape
    rng = np.random.default_rng(hash((shape, relu)) % 2**32)
    x = rng.integers(-127, 128, (n, h, w, cin)).astype(np.int8)
    k = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout) * 1e-3 + 1e-4).astype(np.float32)
    bias = (rng.standard_normal(cout) * 0.1).astype(np.float32)
    s_out = np.float32(0.05)

    got = np.asarray(conv3x3_int8_fused(x, k, scale, bias, s_out, relu=relu,
                                        row_tile=row_tile, interpret=True))
    ref = np.asarray(conv3x3_int8_reference(x, k, scale, bias, s_out, relu=relu))
    np.testing.assert_array_equal(got, ref)
    assert got.dtype == np.int8
    if relu:
        assert got.min() >= 0


def test_edge_values_saturate():
    """All-max inputs must clip to 127, not wrap (int32 accumulation headroom)."""
    n, h, w, c = 1, 8, 8, 8
    x = np.full((n, h, w, c), 127, np.int8)
    k = np.full((3, 3, c, c), 127, np.int8)
    scale = np.full(c, 1.0, np.float32)
    bias = np.zeros(c, np.float32)
    got = np.asarray(conv3x3_int8_fused(x, k, scale, bias, np.float32(1.0),
                                        relu=True, row_tile=4, interpret=True))
    ref = np.asarray(conv3x3_int8_reference(x, k, scale, bias, np.float32(1.0)))
    np.testing.assert_array_equal(got, ref)
    assert got.max() == 127


def test_w2_packed_weights_exact():
    """The width-fold packed conv (free NHWC reshape + pack_weights_w2) is
    exactly the original 3x3 conv — the C<128 serving path depends on it."""
    import jax.numpy as jnp

    from tpu_unet.ops.pallas.int8_conv import pack_weights_w2

    rng = np.random.default_rng(7)
    n, h, w, c, co = 2, 8, 12, 16, 8
    x = rng.integers(-127, 128, (n, h, w, c)).astype(np.int8)
    k = rng.integers(-127, 128, (3, 3, c, co)).astype(np.int8)
    scale = (rng.random(co) * 1e-3 + 1e-4).astype(np.float32)
    bias = (rng.standard_normal(co) * 0.1).astype(np.float32)
    s_out = np.float32(0.05)

    ref = np.asarray(conv3x3_int8_reference(x, k, scale, bias, s_out))

    xp = jnp.asarray(x).reshape(n, h, w // 2, 2 * c)
    k2 = pack_weights_w2(jnp.asarray(k))
    got = conv3x3_int8_fused(xp, k2, np.tile(scale, 2), np.tile(bias, 2),
                             s_out, row_tile=4, interpret=True)
    got = np.asarray(got).reshape(n, h, w, co)
    np.testing.assert_array_equal(got, ref)

"""Attention U-Net: additive attention gates on the skip connections.

Beyond-reference architecture option for the defect-segmentation workloads
(the reference, /root/reference/src/model.py, has only the plain-skip UNet
family). Implements Oktay et al., "Attention U-Net: Learning Where to Look
for the Pancreas" (arXiv:1804.03999 §3.1): before each decoder concat, the
skip tensor x is reweighted by a learned per-pixel gate

    alpha = sigmoid( psi( relu( W_g g + W_x x ) ) ),   x_gated = x * alpha

where g is the decoder feature for that stage. All three projections are
1x1 convs; W_g/W_x map to an intermediate width F_int (= skip channels / 2,
the paper's convention) and psi maps to one channel.

The gate is computed at the COARSE resolution — the paper's published
formulation: g is the decoder tensor BEFORE its upsample (wide channels,
half the spatial extent), W_x strides by 2 to meet it, psi runs at the
coarse grid, and the 1-channel attention map alpha is bilinearly resized
back to the skip's extent. This is also the measured-right choice on TPU:
the alternative stride-1 gate at the skip's full resolution costs 17% train
throughput (62.1 vs 72.8 img/s, 512² b8 on v5e-1; 75.1 vs 62.5 GB/step HBM
traffic — the step is bandwidth-bound, and full-res gate tensors are pure
extra traffic), while computing the gate's BNs in bf16 instead of f32
recovers nothing (62.5; the f32 norm bytes were never the lever). A/B:
tools/bench_attn_variants.py.

TPU-first naming (deliberate, load-bearing):
- The W_g / W_x projections live in child scopes ``g`` / ``x`` with layers
  named ``conv1``/``bn1``, and psi is ``conv2``/``bn2`` on the gate module
  itself. The generic conv{i}/bn{i} walkers therefore cover the gate with
  zero new code: inference BN folding (ops/fold_bn.py) folds all three BNs,
  and the Megatron tensor-parallel rules (parallel/tensor.py) column-shard
  W_g/W_x over F_int, run their BNs per channel slice locally, and row-shard
  psi's F_int contraction — one all-reduce per gate, the communication
  minimum, with psi's 1-channel BN replicated.
- BatchNorm after each projection (the paper places them there too) keeps
  the additive attention well-scaled under the bf16 compute policy; the
  sigmoid and the alpha resize run in the f32 norm dtype (a 1-channel map —
  negligible bytes).

The model class mirrors SegmentationUNet (bottleneck channel dropout,
NHWC, policy-cast I/O) so every seg-family subsystem — train/eval steps,
confusion-matrix contraction, serving engines, checkpoints — works
unchanged; only ``attention=True`` on the decoder's Up blocks differs.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.core.precision import Policy, DEFAULT_POLICY
from tpu_unet.ops.resize import resize_bilinear_align_corners


class _GateProj(nn.Module):
    """One gate input projection: 1x1 conv (no bias) -> BatchNorm.

    Named conv1/bn1 so the generic conv{i}/bn{i} BN-folding walker and the
    tensor-parallel column rule apply without gate-specific cases. ``strides``
    is (2, 2) for W_x — the skip projection meets the coarse gating signal at
    its own resolution (arXiv:1804.03999 §3.1).
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False

    @nn.compact
    def __call__(self, v: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        v = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            strides=self.strides,
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv1",
        )(v)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.policy.norm_dtype,
            param_dtype=self.policy.param_dtype,
            axis_name=("data" if (self.sync_batch_stats and train) else None),
            name="bn1",
        )(v)


class AttentionGate(nn.Module):
    """Additive attention gate: x * resize(sigmoid(psi(relu(W_g g + W_x x)))).

    ``g`` is the gating/decoder feature at the COARSE (pre-upsample)
    resolution — spatially ~half of ``x``, channel count free; ``x`` is the
    full-resolution skip. W_x strides by 2 to meet g (cropped to g's extent
    when x has an odd dimension), the gate math runs on the coarse grid, and
    the 1-channel alpha map is bilinearly resized to x's extent (exact for
    any shape — no separate pad step). Returns the gated skip in the policy
    compute dtype. ``f_int`` is the intermediate projection width.
    """

    f_int: int
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        kw = dict(policy=self.policy, sync_batch_stats=self.sync_batch_stats)
        gp = _GateProj(self.f_int, name="g", **kw)(g, train=train)
        xp = _GateProj(self.f_int, strides=(2, 2), name="x", **kw)(x, train=train)
        # Odd x extents make the SAME-padded stride-2 conv one row/col larger
        # than g (ceil vs floor); crop — static at trace time, identity for
        # the power-of-two sizes all three workloads use.
        xp = xp[:, : gp.shape[1], : gp.shape[2], :]
        a = nn.relu(gp + xp).astype(self.policy.compute_dtype)
        a = nn.Conv(
            1,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv2",
        )(a)
        a = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.policy.norm_dtype,
            param_dtype=self.policy.param_dtype,
            axis_name=("data" if (self.sync_batch_stats and train) else None),
            name="bn2",
        )(a)
        # f32 norm dtype; a 1-channel map, so the resize is negligible bytes.
        alpha = resize_bilinear_align_corners(nn.sigmoid(a), x.shape[1], x.shape[2])
        return (x * alpha).astype(self.policy.compute_dtype)


from tpu_unet.models.unet import SegmentationUNet


class AttentionUNet(SegmentationUNet):
    """SegmentationUNet with attention-gated skips (arXiv:1804.03999).

    Same encoder/decoder ladder, bottleneck channel dropout, and logits head
    as SegmentationUNet (models/unet.py) — literally the same module body,
    with ``attention=True`` so each decoder Up gates its skip through an
    AttentionGate (named ``att`` inside the Up block) before the concat.
    Returns logits of shape (N, H, W, n_classes).
    """

    attention: bool = True

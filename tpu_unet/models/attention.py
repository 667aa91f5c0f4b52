"""Attention U-Net: additive attention gates on the skip connections.

Beyond-reference architecture option for the defect-segmentation workloads
(the reference, /root/reference/src/model.py, has only the plain-skip UNet
family). Implements Oktay et al., "Attention U-Net: Learning Where to Look
for the Pancreas" (arXiv:1804.03999 §3): before each decoder concat, the
skip tensor x is reweighted by a learned per-pixel gate

    alpha = sigmoid( psi( relu( W_g g + W_x x ) ) ),   x_gated = x * alpha

where g is the decoder feature for that stage. All three projections are
1x1 convs; W_g/W_x map to an intermediate width F_int (= skip channels / 2,
the paper's convention) and psi maps to one channel. We gate at the SKIP's
resolution — g is the already-upsampled decoder tensor produced inside
``blocks.Up`` (after its pad-to-skip), so every projection is stride-1 and
the gate adds no resampling of its own. The paper's original formulation
strides W_x by 2 to meet g at the coarse resolution and bilinearly resamples
alpha back up; at these feature widths the two are equivalent attention
mechanisms, and the stride-1 form keeps the whole gate fusable into the
surrounding concat/DoubleConv XLA program with no extra resize op.

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
  sigmoid runs in the f32 norm dtype.

The model class mirrors SegmentationUNet (bottleneck channel dropout,
NHWC, policy-cast I/O) so every seg-family subsystem — train/eval steps,
confusion-matrix contraction, serving engines, checkpoints — works
unchanged; only ``attention=True`` on the decoder's Up blocks differs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.core.precision import Policy, DEFAULT_POLICY


class _GateProj(nn.Module):
    """One gate input projection: 1x1 conv (no bias) -> BatchNorm.

    Named conv1/bn1 so the generic conv{i}/bn{i} BN-folding walker and the
    tensor-parallel column rule apply without gate-specific cases.
    """

    features: int
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False

    @nn.compact
    def __call__(self, v: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        v = nn.Conv(
            self.features,
            kernel_size=(1, 1),
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
    """Additive attention gate: x * sigmoid(psi(relu(W_g g + W_x x))).

    ``g`` (the gating/decoder feature) and ``x`` (the skip) must share
    spatial dims; channel counts may differ. Returns the gated skip in the
    policy compute dtype. ``f_int`` is the intermediate projection width.
    """

    f_int: int
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        kw = dict(policy=self.policy, sync_batch_stats=self.sync_batch_stats)
        a = (_GateProj(self.f_int, name="g", **kw)(g, train=train)
             + _GateProj(self.f_int, name="x", **kw)(x, train=train))
        a = nn.relu(a).astype(self.policy.compute_dtype)
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
        alpha = nn.sigmoid(a)  # f32 norm dtype; broadcasts over x's channels
        return (x * alpha).astype(self.policy.compute_dtype)


class AttentionUNet(nn.Module):
    """SegmentationUNet with attention-gated skips (arXiv:1804.03999).

    Same encoder/decoder ladder, bottleneck channel dropout, and logits head
    as SegmentationUNet (models/unet.py); each decoder Up gates its skip
    through an AttentionGate (named ``att`` inside the Up block) before the
    concat. Returns logits of shape (N, H, W, n_classes).
    """

    n_channels: int = 3
    n_classes: int = 4
    bilinear: bool = False
    dropout: float = 0.1
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    base_features: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # Imported here to avoid a models/unet.py <-> models/attention.py
        # import cycle (unet.build_model imports this module lazily too).
        from tpu_unet.models.blocks import OutConv
        from tpu_unet.models.unet import _Decoder, _Encoder

        x = self.policy.cast_to_compute(x)
        x1, x2, x3, x4, x5 = _Encoder(
            policy=self.policy, bilinear=self.bilinear,
            base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, name="encoder",
        )(x, train=train)
        if self.dropout > 0:
            # Channel dropout (torch Dropout2d semantics): broadcast over H, W.
            x5 = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=(1, 2),
                deterministic=not train,
                name="bottleneck_dropout",
            )(x5)
        x = _Decoder(
            policy=self.policy, bilinear=self.bilinear,
            base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, attention=True,
            name="decoder",
        )((x1, x2, x3, x4, x5), train=train)
        return OutConv(self.n_classes, policy=self.policy, name="outc")(x)

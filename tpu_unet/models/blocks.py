"""UNet building blocks as Flax linen modules, NHWC, mixed-precision aware.

Capability parity with the reference blocks (/root/reference/src/model.py:6-75):
DoubleConv = (Conv3x3 pad1 no-bias -> BatchNorm -> ReLU) x2 with optional mid width;
Down = MaxPool2x2 -> DoubleConv; Up = (bilinear-align-corners upsample | ConvTranspose
k2s2) -> pad-to-skip -> concat(skip, x) -> DoubleConv; OutConv = 1x1 conv head.

TPU-first differences from the reference:
- NHWC layout (channels-last) so XLA tiles convs directly onto the MXU.
- Convolutions run in the policy compute dtype (bf16 by default on TPU);
  BatchNorm statistics stay in float32.
- All shape arithmetic (the pad-to-skip in Up) is static at trace time, so the whole
  forward compiles to one fused XLA program with no data-dependent control flow.

BatchNorm matches torch defaults: eps=1e-5, running-average momentum 0.1 in torch
convention, which is flax ``momentum=0.9`` (flax: ra = m*ra + (1-m)*batch).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from tpu_unet.core.precision import Policy, DEFAULT_POLICY
from tpu_unet.ops.resize import upsample2x_bilinear_align_corners


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) twice, optionally with a narrower mid width."""

    features: int
    mid_features: Optional[int] = None
    policy: Policy = DEFAULT_POLICY
    # Cross-replica (sync-BN) statistics for the EXPLICIT-SPMD path only: the
    # train step must run under shard_map with a 'data' mesh axis bound
    # (tests/test_shard_map.py). Under plain jit/GSPMD leave this False — batch
    # stats over a 'data'-sharded N axis are already global there, and an
    # unbound axis_name would fail tracing.
    sync_batch_stats: bool = False
    # Tag every intermediate with jax.ad_checkpoint.checkpoint_name so a
    # jax.checkpoint(policy=save_anything_except_these_names(tag)) around the
    # forward rematerializes this block's activations in the backward instead
    # of saving them (targeted remat of the full-resolution rows — the bytes
    # live there). No effect unless the train step opts in; identical numerics.
    remat_tag: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        mid = self.mid_features if self.mid_features is not None else self.features
        axis_name = "data" if self.sync_batch_stats else None
        for i, feats in enumerate((mid, self.features)):
            x = nn.Conv(
                feats,
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name=f"conv{i + 1}",
            )(x)
            if self.remat_tag:
                x = checkpoint_name(x, self.remat_tag)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.policy.norm_dtype,
                param_dtype=self.policy.param_dtype,
                axis_name=axis_name if train else None,
                name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
            x = x.astype(self.policy.compute_dtype)
            if self.remat_tag:
                x = checkpoint_name(x, self.remat_tag)
        return x


class Down(nn.Module):
    """2x2 max-pool (stride 2) followed by DoubleConv."""

    features: int
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    remat_tag: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(
            self.features,
            policy=self.policy,
            sync_batch_stats=self.sync_batch_stats,
            remat_tag=self.remat_tag,
            name="conv",
        )(x, train=train)


class Up(nn.Module):
    """Upsample x (2x), pad to the skip's spatial dims, concat(skip, x), DoubleConv.

    ``in_features`` is the channel count of the low-resolution input; the transposed
    conv halves it (so concat with the skip restores ``in_features`` total channels),
    mirroring /root/reference/src/model.py:40-66.

    ``attention=True`` gates the skip through an additive attention gate
    (models/attention.py, arXiv:1804.03999) before the concat; the gating
    signal is the PRE-upsample decoder tensor — the gate math runs at the
    coarse resolution and only the 1-channel alpha map is resized up.
    """

    in_features: int
    features: int
    bilinear: bool = False
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    attention: bool = False
    remat_tag: Optional[str] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.attention:
            from tpu_unet.models.attention import AttentionGate

            # Gate at the COARSE resolution (the paper's formulation, and 17%
            # faster on the bandwidth-bound train step — models/attention.py):
            # the gating signal is x1 BEFORE its upsample.
            x2 = AttentionGate(
                f_int=max(1, x2.shape[-1] // 2),  # paper: F_int = F_l / 2
                policy=self.policy,
                sync_batch_stats=self.sync_batch_stats,
                name="att",
            )(x1, x2, train=train)

        if self.bilinear:
            x1 = upsample2x_bilinear_align_corners(x1)
            conv = DoubleConv(
                self.features,
                mid_features=self.in_features // 2,
                policy=self.policy,
                sync_batch_stats=self.sync_batch_stats,
                remat_tag=self.remat_tag,
                name="conv",
            )
        else:
            x1 = nn.ConvTranspose(
                self.in_features // 2,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name="up",
            )(x1)
            if self.remat_tag:
                x1 = checkpoint_name(x1, self.remat_tag)
            conv = DoubleConv(
                self.features,
                policy=self.policy,
                sync_batch_stats=self.sync_batch_stats,
                remat_tag=self.remat_tag,
                name="conv",
            )

        # Pad x1 up to x2's spatial extent (static at trace time; identically zero for
        # the power-of-two resolutions all three workloads use, so XLA compiles it away).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))

        x = jnp.concatenate([x2.astype(x1.dtype), x1], axis=-1)
        if self.remat_tag:
            # The concat is the widest tensor of the block (skip + up channels);
            # name it so the backward rebuilds it instead of saving it.
            x = checkpoint_name(x, self.remat_tag)
        return conv(x, train=train)


class OutConv(nn.Module):
    """1x1 convolution head. Outputs are cast to the policy output dtype (f32)."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv",
        )(x)
        return self.policy.cast_to_output(x)

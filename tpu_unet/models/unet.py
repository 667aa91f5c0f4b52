"""The UNet model family (Flax linen, NHWC).

Capability parity with /root/reference/src/model.py:78-210:
- ``UNet(n_channels=3, n_classes=1, bilinear=False)`` — encoder 64/128/256/512/1024
  with 4 skip-connected decoder stages and a 1x1 head; 31,037,633 params at
  n_classes=1 transposed-conv mode (matches the reference's torch param count).
- ``SegmentationUNet`` — UNet plus channel-dropout applied to the bottleneck only
  (reference :130,146); 31,037,828 params at 4 classes.
- ``AnomalyUNet`` — shared encoder, two full decoders (reconstruction -> 3-ch sigmoid,
  segmentation -> 1-ch sigmoid); 43,228,228 params.

All modules take/return NHWC tensors. ``train=True`` enables BatchNorm batch
statistics (and dropout for SegmentationUNet, which additionally needs a ``dropout``
PRNG stream).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.core.precision import Policy, DEFAULT_POLICY
from tpu_unet.models.blocks import DoubleConv, Down, Up, OutConv


class _Encoder(nn.Module):
    """Shared 5-stage encoder: inc B, downs to 16B//factor (B=64 in the reference)."""

    policy: Policy = DEFAULT_POLICY
    bilinear: bool = False
    sync_batch_stats: bool = False
    base_features: int = 64
    # Tag the full-/half-resolution rows (inc, down1) for targeted remat: a
    # train step built with remat='full_res' recomputes their activations in
    # the backward instead of saving them (see train/steps.py).
    remat_full_res: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        kw = dict(policy=self.policy, sync_batch_stats=self.sync_batch_stats)
        tag = "full_res" if self.remat_full_res else None
        b = self.base_features
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(b, name="inc", remat_tag=tag, **kw)(x, train=train)
        x2 = Down(2 * b, name="down1", remat_tag=tag, **kw)(x1, train=train)
        x3 = Down(4 * b, name="down2", **kw)(x2, train=train)
        x4 = Down(8 * b, name="down3", **kw)(x3, train=train)
        x5 = Down(16 * b // factor, name="down4", **kw)(x4, train=train)
        return x1, x2, x3, x4, x5


class _Decoder(nn.Module):
    """4-stage skip-connected decoder ending at 64 channels (no head).

    ``attention=True`` gates each skip through an attention gate inside the
    Up blocks (models/attention.py)."""

    policy: Policy = DEFAULT_POLICY
    bilinear: bool = False
    sync_batch_stats: bool = False
    prefix: str = "up"
    base_features: int = 64
    attention: bool = False
    remat_full_res: bool = False  # tag the half-/full-res rows (up3, up4)

    @nn.compact
    def __call__(self, skips, *, train: bool):
        x1, x2, x3, x4, x5 = skips
        kw = dict(policy=self.policy, bilinear=self.bilinear,
                  sync_batch_stats=self.sync_batch_stats,
                  attention=self.attention)
        tag = "full_res" if self.remat_full_res else None
        b = self.base_features
        factor = 2 if self.bilinear else 1
        x = Up(16 * b, 8 * b // factor, name=f"{self.prefix}1", **kw)(x5, x4, train=train)
        x = Up(8 * b, 4 * b // factor, name=f"{self.prefix}2", **kw)(x, x3, train=train)
        x = Up(4 * b, 2 * b // factor, name=f"{self.prefix}3", remat_tag=tag,
               **kw)(x, x2, train=train)
        x = Up(2 * b, b, name=f"{self.prefix}4", remat_tag=tag,
               **kw)(x, x1, train=train)
        return x


class UNet(nn.Module):
    """Standard UNet; returns logits of shape (N, H, W, n_classes)."""

    n_channels: int = 3
    n_classes: int = 1
    bilinear: bool = False
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    base_features: int = 64  # reference ladder: 64/128/256/512/1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = self.policy.cast_to_compute(x)
        skips = _Encoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, name="encoder",
        )(x, train=train)
        x = _Decoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, name="decoder",
        )(skips, train=train)
        return OutConv(self.n_classes, policy=self.policy, name="outc")(x)


class SegmentationUNet(nn.Module):
    """UNet with channel dropout on the bottleneck; for multi-class segmentation.

    Matches the reference's nn.Dropout2d applied only to x5
    (/root/reference/src/model.py:130,146): whole feature channels are dropped, which
    in NHWC means broadcasting the dropout mask over the two spatial axes.
    """

    n_channels: int = 3
    n_classes: int = 4
    bilinear: bool = False
    dropout: float = 0.1
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    base_features: int = 64
    # attention=True gates each decoder skip (models/attention.py). The param
    # tree is unchanged when False (the att submodules only exist when gated),
    # so the reference-pinned counts hold; AttentionUNet is the =True subclass.
    attention: bool = False
    remat_full_res: bool = False  # targeted-remat tags (see AnomalyUNet)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = self.policy.cast_to_compute(x)
        x1, x2, x3, x4, x5 = _Encoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, name="encoder",
            remat_full_res=self.remat_full_res,
        )(x, train=train)
        if self.dropout > 0:
            # Channel dropout (torch Dropout2d): broadcast over H and W.
            x5 = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=(1, 2),
                deterministic=not train,
                name="bottleneck_dropout",
            )(x5)
        x = _Decoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, attention=self.attention,
            name="decoder", remat_full_res=self.remat_full_res,
        )((x1, x2, x3, x4, x5), train=train)
        return OutConv(self.n_classes, policy=self.policy, name="outc")(x)


class AnomalyUNet(nn.Module):
    """Dual-decoder UNet for anomaly detection.

    Returns ``(reconstruction, anomaly_map)``: sigmoid-activated (N,H,W,3) and
    (N,H,W,1), from a shared encoder and two independent decoders
    (/root/reference/src/model.py:156-210).
    """

    n_channels: int = 3
    bilinear: bool = False
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    base_features: int = 64
    # Tag the full-/half-res rows for targeted remat (param tree unchanged;
    # only effective under a train step built with remat='full_res').
    remat_full_res: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = self.policy.cast_to_compute(x)
        skips = _Encoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, name="encoder",
            remat_full_res=self.remat_full_res,
        )(x, train=train)

        recon = _Decoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, prefix="up_recon", name="decoder_recon",
            remat_full_res=self.remat_full_res,
        )(skips, train=train)
        reconstruction = nn.sigmoid(OutConv(self.n_channels, policy=self.policy, name="outc_recon")(recon))

        seg = _Decoder(
            policy=self.policy, bilinear=self.bilinear, base_features=self.base_features,
            sync_batch_stats=self.sync_batch_stats, prefix="up_seg", name="decoder_seg",
            remat_full_res=self.remat_full_res,
        )(skips, train=train)
        anomaly_map = nn.sigmoid(OutConv(1, policy=self.policy, name="outc_seg")(seg))

        return reconstruction, anomaly_map


def build_model(name: str, *, n_channels: int = 3, n_classes: int = 1,
                bilinear: bool = False, dropout: float = 0.1,
                policy: Policy = DEFAULT_POLICY, sync_batch_stats: bool = False,
                base_features: int = 64, deep_supervision: bool = False,
                heads: int = 4):
    """Build a model by CLI name ('unet' | 'anomaly_unet' | 'seg_unet' |
    'unetpp' | 'attn_unet'). ``heads`` selects the UNet++ deep-supervision
    inference mode (4 = averaged accurate mode; k<4 = the pruned fast-mode
    head X[0][k], whose unused deeper columns XLA DCEs out of the compiled
    program)."""
    name = name.lower()
    is_unetpp = name in ("unetpp", "unet++", "nested_unet")
    if deep_supervision and not is_unetpp:
        # Silently training a plain UNet while the user believes deep
        # supervision is on would only surface (if ever) as a param-structure
        # mismatch at serve/eval time — reject at construction instead.
        raise ValueError(
            f"deep_supervision is only supported by --model unetpp, got {name!r}")
    if heads != 4 and not (is_unetpp and deep_supervision):
        raise ValueError(
            "heads selects a UNet++ deep-supervision inference head; it "
            f"requires --model unetpp with deep_supervision (got model={name!r}, "
            f"deep_supervision={deep_supervision})")
    if is_unetpp:
        from tpu_unet.models.unetpp import UNetPlusPlus

        return UNetPlusPlus(n_channels=n_channels, n_classes=n_classes,
                            bilinear=bilinear, dropout=dropout,
                            deep_supervision=deep_supervision, heads=heads,
                            policy=policy, sync_batch_stats=sync_batch_stats,
                            base_features=base_features)
    if name == "unet":
        return UNet(n_channels=n_channels, n_classes=n_classes, bilinear=bilinear,
                    policy=policy, sync_batch_stats=sync_batch_stats,
                    base_features=base_features)
    if name == "anomaly_unet":
        return AnomalyUNet(n_channels=n_channels, bilinear=bilinear,
                           policy=policy, sync_batch_stats=sync_batch_stats,
                           base_features=base_features)
    if name in ("seg_unet", "segmentation_unet"):
        return SegmentationUNet(n_channels=n_channels, n_classes=n_classes,
                                bilinear=bilinear, dropout=dropout,
                                policy=policy, sync_batch_stats=sync_batch_stats,
                                base_features=base_features)
    if name in ("attn_unet", "attention_unet", "attunet"):
        from tpu_unet.models.attention import AttentionUNet

        return AttentionUNet(n_channels=n_channels, n_classes=n_classes,
                             bilinear=bilinear, dropout=dropout,
                             policy=policy, sync_batch_stats=sync_batch_stats,
                             base_features=base_features)
    raise ValueError(f"Unknown model: {name!r}")

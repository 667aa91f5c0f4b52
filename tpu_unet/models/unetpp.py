"""UNet++ (nested UNet) for multi-class defect segmentation.

An EXTENSION beyond the reference (which ships only the plain UNet family,
/root/reference/src/model.py) — added because redesigned skip connections are
the established upgrade for exactly these workloads (UNet++, Zhou et al.,
arXiv:1912.05074, retrieved in PAPERS.md): nested dense skip pathways close
the semantic gap between encoder and decoder features before fusion, which
helps small-structure defect masks (Gear pitting, KolektorSDD cracks).

Architecture: encoder nodes X[i][0] on the usual b*2^i channel ladder; nested
decoder nodes X[i][j] = DoubleConv(concat(X[i][0..j-1], up(X[i+1][j-1]))),
each at b*2^i channels. ``deep_supervision=True`` attaches a 1x1 head to every
top-row node X[0][1..L] — training averages the per-head losses; inference
with ``heads=4`` averages the head LOGITS (the paper's "accurate mode") while
``heads=k<4`` returns the single head X[0][k] (the paper's pruned "fast mode"
at level k, arXiv:1912.05074 §V): columns deeper than k feed nothing, so XLA
dead-code-eliminates them from the compiled eval/serving program — heads=1 is
the pruned L1 branch at genuinely L1 cost.

TPU-first notes:
- Reuses ``DoubleConv`` (NHWC, bf16 compute / f32 BN, MXU-ladder widths), so
  the tensor-parallel path rules in parallel/tensor.py (conv1 C_out column /
  conv2 C_in row / bn1 channel slices) apply to every nested node unchanged.
- Upsampling between pyramid levels is the same ConvTranspose-k2s2 (or
  align-corners bilinear) used by ``Up`` — all static shapes, one XLA program.
- The dense grid holds more live activations than plain UNet; compose with
  ``--grad_accum`` / ``--n_space`` when memory-bound (docs/SCALING.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu_unet.core.precision import Policy, DEFAULT_POLICY
from tpu_unet.models.blocks import DoubleConv, OutConv
from tpu_unet.ops.resize import upsample2x_bilinear_align_corners


class UNetPlusPlus(nn.Module):
    """Nested UNet (UNet++), depth 5 (4 down/up levels), NHWC."""

    n_channels: int = 3
    n_classes: int = 4
    bilinear: bool = False
    deep_supervision: bool = False
    # Inference head selection when deep_supervision (1..4): 4 = average all
    # top-row head logits (the paper's accurate mode); k<4 = the single head
    # X[0][k] (pruned fast mode) — unused deeper columns are DCE'd from the
    # compiled program.
    heads: int = 4
    dropout: float = 0.0
    policy: Policy = DEFAULT_POLICY
    sync_batch_stats: bool = False
    base_features: int = 32  # paper default; 64 matches the UNet ladder

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if not 1 <= self.heads <= 4:
            raise ValueError(f"heads must be in 1..4, got {self.heads}")
        b = self.base_features
        kw = dict(policy=self.policy, sync_batch_stats=self.sync_batch_stats)
        x = self.policy.cast_to_compute(x)

        def up(t, features, name):
            if self.bilinear:
                return upsample2x_bilinear_align_corners(t)
            return nn.ConvTranspose(
                features, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype, name=name,
            )(t)

        # Encoder column X[i][0] at b * 2^i channels.
        grid = {}
        t = x
        for i in range(5):
            if i > 0:
                t = nn.max_pool(t, window_shape=(2, 2), strides=(2, 2))
            t = DoubleConv(b * 2 ** i, name=f"x{i}_0", **kw)(t, train=train)
            grid[(i, 0)] = t

        if self.dropout > 0:
            # Channel dropout on the bottleneck, as SegmentationUNet does.
            grid[(4, 0)] = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1, 2),
                deterministic=not train, name="bottleneck_dropout",
            )(grid[(4, 0)])

        # Nested decoder: X[i][j] fuses the full dense row X[i][0..j-1] with
        # the upsampled X[i+1][j-1].
        for j in range(1, 5):
            for i in range(0, 5 - j):
                below = up(grid[(i + 1, j - 1)], b * 2 ** i, name=f"up{i}_{j}")
                row = [grid[(i, k)] for k in range(j)]
                # Pad the level-up to the row's spatial extent (static; zero for
                # the /16-divisible sizes the workloads use) — odd encoder rows
                # halve to floor(H/2), so 2*floor(H/2) can be one short. Same
                # diff//2 split as blocks.Up.
                dh = row[0].shape[1] - below.shape[1]
                dw = row[0].shape[2] - below.shape[2]
                if dh or dw:
                    below = jnp.pad(below, ((0, 0), (dh // 2, dh - dh // 2),
                                            (dw // 2, dw - dw // 2), (0, 0)))
                cat = jnp.concatenate(
                    [r.astype(below.dtype) for r in row] + [below], axis=-1)
                grid[(i, j)] = DoubleConv(b * 2 ** i, name=f"x{i}_{j}",
                                          **kw)(cat, train=train)

        if not self.deep_supervision:
            return OutConv(self.n_classes, policy=self.policy,
                           name="outc")(grid[(0, 4)])

        logits = tuple(
            OutConv(self.n_classes, policy=self.policy, name=f"outc_{j}")(
                grid[(0, j)])
            for j in range(1, 5))
        if train:
            return logits  # per-head losses, averaged by the train step
        if self.heads == 4:
            return sum(logits) / 4  # accurate mode: average all head logits
        # Pruned fast mode at level k: the single head X[0][k] (the paper's
        # mode selection, arXiv:1912.05074 §V) — columns deeper than k feed
        # nothing, so XLA DCEs their convs out of the compiled eval program.
        return logits[self.heads - 1]


def unetpp_param_count(n_classes: int = 4, base_features: int = 32,
                       deep_supervision: bool = False) -> int:
    """Reference param count for tests (computed once, pinned there)."""
    import jax

    from tpu_unet.train.state import create_train_state
    import optax

    model = UNetPlusPlus(n_classes=n_classes, base_features=base_features,
                         deep_supervision=deep_supervision)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               optax.sgd(1e-2))
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))

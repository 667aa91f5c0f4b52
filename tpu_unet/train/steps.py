"""Jitted train/eval step factories for the anomaly and segmentation tasks.

The hot path, redesigned TPU-first (vs the reference's per-batch Python loop,
/root/reference/src/train_utils.py:107-152):

- Each step is one XLA program: device-side augmentation (paired geometry +
  photometry on uint8 inputs), forward, loss, backward, optimizer update, and (for
  segmentation) the confusion-matrix contraction — no host sync inside the epoch.
- Batches arrive as uint8 NHWC sharded over the 'data' mesh axis; parameters are
  replicated. Under GSPMD the gradient all-reduce and the *global* BatchNorm batch
  statistics are emitted automatically as psum collectives — multi-chip training
  keeps single-replica numerics.
- ``donate_state=True`` donates the input state buffers so the update is in-place
  in HBM (the 43M-param AnomalyUNet state is ~0.5 GB with Adam moments in f32).

Loss configs are Python dataclasses closed over at trace time (static), so changing
weights recompiles once per config, never per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_unet.losses.anomaly import combined_anomaly_loss
from tpu_unet.losses.segmentation import combined_segmentation_loss
from tpu_unet.metrics.anomaly import anomaly_error_map, anomaly_score
from tpu_unet.metrics.confusion import confusion_matrix_batch
from tpu_unet.ops.augment import eval_transform, train_transform
from tpu_unet.ops.seg_head import sliced_argmax
from tpu_unet.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    degrees: float = 10.0
    p_flip: float = 0.5
    brightness: float = 0.1
    contrast: float = 0.1
    saturation: float = 0.1
    hue: float = 0.05
    # 'per_batch_shear' (default): one shared angle per batch applied as MXU shear
    # matmuls — 41% faster training than 'per_sample' (reference semantics,
    # per-image gather-based rotation; TPU gathers are slow). Marginal angle
    # distribution across steps is identical; see ops/rotate_shear.py.
    rotation_mode: str = "per_batch_shear"
    # torchvision randomizes the ColorJitter op order per call; True reproduces
    # that (24-way lax.switch) at ~35% step cost — fixed order is the default
    # (README "Deviations"; ops/augment.py::color_jitter has the measurements).
    color_jitter_random_order: bool = False

    def kwargs(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class AnomalyLossConfig:
    recon_weight: float = 1.0
    seg_weight: float = 1.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    recon_loss_type: str = "mse"  # 'mse' | 'ssim' (--use_ssim)

    def kwargs(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class SegLossConfig:
    ce_weight: float = 1.0
    dice_weight: float = 1.0
    focal_weight: float = 0.0
    class_weights: Optional[Tuple[float, ...]] = None
    ignore_index: Optional[int] = None

    def kwargs(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Anomaly detection (AnomalyUNet / UNet on MVTec)
# ---------------------------------------------------------------------------

def _microbatch_split(arrays, batch: int, grad_accum: int, what: str):
    """Reshape each (B, ...) array to (G, B/G, ...) for the accumulation scan."""
    if batch % grad_accum != 0:
        raise ValueError(
            f"{what}: batch size {batch} is not divisible by "
            f"grad_accum={grad_accum}")
    return [a.reshape((grad_accum, batch // grad_accum) + a.shape[1:])
            for a in arrays]


def _maybe_remat(fwd, remat: str):
    """Wrap a forward fn in jax.checkpoint per the remat mode.

    'none': off. 'full_res': recompute ONLY the tensors the model tagged with
    checkpoint_name('full_res') — the full-/half-resolution DoubleConv rows
    when the model was built with remat_full_res=True (models/unet.py); every
    other residual is saved as usual. 'full': recompute the whole forward
    (jax.remat default policy — the r2-measured loser, kept for A/B).
    """
    if remat == "none":
        return fwd
    if remat == "full_res":
        return jax.checkpoint(
            fwd,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "full_res"))
    if remat == "full":
        return jax.checkpoint(fwd)
    raise ValueError(f"remat must be 'none'|'full_res'|'full', got {remat!r}")


def make_anomaly_train_step(loss_cfg: AnomalyLossConfig = AnomalyLossConfig(),
                            aug_cfg: AugmentConfig = AugmentConfig(),
                            donate_state: bool = True,
                            dual_decoder: bool = True,
                            grad_accum: int = 1,
                            remat: str = "none"):
    """Returns jitted ``step(state, images_u8, masks, key) -> (state, loss_dict)``.

    images_u8: (N,H,W,3) uint8; masks: (N,H,W,1) float32 in [0,1], or uint8
    {0,1} (exact for binarized masks and 4x less host->device traffic — the
    MVTec train loader ships u8; cast to f32 happens on device after the
    nearest-sampled geometric augment).

    dual_decoder=False trains a plain UNet as a focal-loss segmenter
    (sigmoid(logits) as the anomaly map; the input stands in as reconstruction so
    the recon term is zero). The reference's --model unet path crashes its own
    train_epoch (it tuple-unpacks a single tensor, /root/reference/src/
    train_utils.py:122 with src/model.py:97-108); this implements the evident
    intent, mirroring the reference's own eval-time fallback (src/test.py:88-93).

    grad_accum=G splits the batch into G sequential microbatches inside the ONE
    jitted program (``lax.scan``): per-microbatch gradients are averaged into a
    single optimizer update, BatchNorm running stats chain through the scan
    (torch-accumulation semantics: each microbatch normalizes by its own batch
    statistics), and the augmentation key is split per microbatch. Peak
    activation memory is that of B/G — the measured per-image throughput knee at
    batch>16 (spill regime, docs/ARCHITECTURE.md) makes this the way to reach
    large effective batches. Loss scalars are the mean over microbatches
    (= the full-batch mean, sizes being equal).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def loss_fn(state, params, stats, img, msk):
        def fwd(params, stats, img):
            return state.apply_fn(
                {"params": params, "batch_stats": stats},
                img, train=True, mutable=["batch_stats"],
            )

        out, mut = _maybe_remat(fwd, remat)(params, stats, img)
        if dual_decoder:
            recon, amap = out
        else:
            amap = jax.nn.sigmoid(out)
            recon = img
        losses = combined_anomaly_loss(recon, amap, img, msk, **loss_cfg.kwargs())
        return losses["total_loss"], (losses, mut["batch_stats"])

    def step(state: TrainState, images_u8, masks, key):
        img, msk = train_transform(images_u8, masks, key, **aug_cfg.kwargs())
        # Masks may ship as uint8 {0,1} (4x less host->device traffic than f32;
        # MVTec train masks are binary by construction) — the geometric augment
        # is nearest/integral on masks, so casting after it is exact.
        msk = msk.astype(jnp.float32)
        grads, (losses, new_stats) = jax.grad(loss_fn, argnums=1, has_aux=True)(
            state, state.params, state.batch_stats, img, msk)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, losses

    def step_accum(state: TrainState, images_u8, masks, key):
        imgs, msks = _microbatch_split([images_u8, masks], images_u8.shape[0],
                                       grad_accum, "anomaly train step")
        keys = jax.random.split(key, grad_accum)

        def micro(carry, xs):
            stats, gsum = carry
            img_u8, msk, k = xs
            img, m = train_transform(img_u8, msk, k, **aug_cfg.kwargs())
            m = m.astype(jnp.float32)  # masks may ship as uint8 {0,1}
            grads, (losses, stats) = jax.grad(loss_fn, argnums=1, has_aux=True)(
                state, state.params, stats, img, m)
            return (stats, jax.tree.map(jnp.add, gsum, grads)), losses

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, gsum), losses = jax.lax.scan(
            micro, (state.batch_stats, zeros), (imgs, msks, keys))
        state = state.apply_gradients(
            grads=jax.tree.map(lambda g: g / grad_accum, gsum))
        state = state.replace(batch_stats=new_stats)
        return state, jax.tree.map(lambda x: x.mean(0), losses)

    fn = step if grad_accum == 1 else step_accum
    return jax.jit(fn, donate_argnums=(0,) if donate_state else ())


def make_anomaly_eval_step(loss_cfg: AnomalyLossConfig = AnomalyLossConfig(),
                           dual_decoder: bool = True):
    """Returns jitted ``step(state, images_u8, masks) -> outputs dict``.

    dual_decoder=False reproduces the reference's plain-UNet fallback
    (/root/reference/src/test.py:88-93): sigmoid(logits) as the anomaly map and the
    input itself as a dummy reconstruction.

    ``valid`` (optional (N,) bool/float): marks real rows of a padded final batch;
    loss scalars are computed over valid rows only (metrics were always masked on
    host; this keeps the loss scalars unpolluted too).
    """

    def step(state: TrainState, images_u8, masks, valid=None):
        img = eval_transform(images_u8)
        masks = masks.astype(jnp.float32)  # masks may ship as uint8 {0,1}
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if dual_decoder:
            recon, amap = state.apply_fn(variables, img, train=False)
        else:
            logits = state.apply_fn(variables, img, train=False)
            amap = jax.nn.sigmoid(logits)
            recon = img
        losses = combined_anomaly_loss(recon, amap, img, masks,
                                       sample_weight=valid, **loss_cfg.kwargs())
        return {
            "losses": losses,
            "score": anomaly_score(recon, img),            # (N,) image-level
            "error_map": anomaly_error_map(recon, img),    # (N,H,W) pixel-level
            "anomaly_map": amap[..., 0],                   # (N,H,W)
            "reconstruction": recon,
            "image": img,
        }

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Semantic segmentation (SegmentationUNet on Gear / KolektorSDD)
# ---------------------------------------------------------------------------

def make_seg_train_step(num_classes: int,
                        loss_cfg: SegLossConfig = SegLossConfig(),
                        aug_cfg: AugmentConfig = AugmentConfig(),
                        with_confusion: bool = True,
                        donate_state: bool = True,
                        grad_accum: int = 1,
                        remat: str = "none"):
    """Returns jitted ``step(state, images_u8, labels, key) -> (state, loss_dict, cm)``.

    labels: (N,H,W) int32. The (C,C) confusion matrix for the batch is computed on
    device (replacing the reference's per-step .cpu() -> sklearn sync,
    /root/reference/src/metrics.py:30-45).

    grad_accum=G scans G sequential microbatches inside the one jitted program —
    averaged gradients, one optimizer update, BN stats and the dropout/augment
    keys per microbatch, confusion matrices summed. Peak activation memory is
    that of B/G; see make_anomaly_train_step for the semantics note.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def forward(state, params, stats, images_u8, labels, key):
        labels = labels.astype(jnp.int32)  # masks ship as uint8 (4x less traffic)
        k_aug, k_drop = jax.random.split(key)
        img, lbl = train_transform(images_u8, labels[..., None], k_aug,
                                   **aug_cfg.kwargs())
        lbl = lbl[..., 0]

        def loss_fn(params):
            def fwd(params, stats, img):
                return state.apply_fn(
                    {"params": params, "batch_stats": stats},
                    img, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k_drop},
                )

            logits, mut = _maybe_remat(fwd, remat)(params, stats, img)
            if isinstance(logits, (tuple, list)):
                # Deep supervision (UNet++): one loss per head, averaged —
                # every head gets equal gradient weight (arXiv:1912.05074);
                # preds/CM report the deepest head.
                per = [combined_segmentation_loss(l, lbl, **loss_cfg.kwargs())
                       for l in logits]
                losses = {k: sum(p[k] for p in per) / len(per) for k in per[0]}
                logits = logits[-1]
            else:
                losses = combined_segmentation_loss(logits, lbl,
                                                    **loss_cfg.kwargs())
            return losses["total_loss"], (losses, mut["batch_stats"], logits)

        grads, (losses, new_stats, logits) = jax.grad(loss_fn, has_aux=True)(params)
        cm = None
        if with_confusion:
            preds = sliced_argmax(logits)
            cm = confusion_matrix_batch(preds, lbl.astype(jnp.int32), num_classes,
                                        loss_cfg.ignore_index)
        return grads, losses, new_stats, cm

    def step(state: TrainState, images_u8, labels, key):
        grads, losses, new_stats, cm = forward(
            state, state.params, state.batch_stats, images_u8, labels, key)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, losses, cm

    def step_accum(state: TrainState, images_u8, labels, key):
        imgs, lbls = _microbatch_split([images_u8, labels], images_u8.shape[0],
                                       grad_accum, "seg train step")
        keys = jax.random.split(key, grad_accum)

        def micro(carry, xs):
            stats, gsum = carry
            img_u8, lbl, k = xs
            grads, losses, stats, cm = forward(
                state, state.params, stats, img_u8, lbl, k)
            return (stats, jax.tree.map(jnp.add, gsum, grads)), (losses, cm)

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, gsum), (losses, cms) = jax.lax.scan(
            micro, (state.batch_stats, zeros), (imgs, lbls, keys))
        state = state.apply_gradients(
            grads=jax.tree.map(lambda g: g / grad_accum, gsum))
        state = state.replace(batch_stats=new_stats)
        cm = cms.sum(axis=0) if with_confusion else None
        return state, jax.tree.map(lambda x: x.mean(0), losses), cm

    fn = step if grad_accum == 1 else step_accum
    return jax.jit(fn, donate_argnums=(0,) if donate_state else ())


def make_seg_eval_step(num_classes: int,
                       loss_cfg: SegLossConfig = SegLossConfig()):
    """Returns jitted ``step(state, images_u8, labels[, valid]) -> (loss_dict, preds, cm)``.

    ``valid`` (optional (N,) bool/float) masks padded rows out of the loss scalars.
    """

    def step(state: TrainState, images_u8, labels, valid=None):
        labels = labels.astype(jnp.int32)  # masks ship as uint8 (4x less traffic)
        img = eval_transform(images_u8)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False,
        )
        losses = combined_segmentation_loss(logits, labels, sample_weight=valid,
                                            **loss_cfg.kwargs())
        preds = sliced_argmax(logits)
        cm = confusion_matrix_batch(preds, labels.astype(jnp.int32), num_classes,
                                    loss_cfg.ignore_index)
        return losses, preds, cm

    return jax.jit(step)

"""Explicit-SPMD path: shard_map train step with cross-replica (sync) BatchNorm.

GSPMD (jit + shardings) is the production path — it derives the collectives
automatically and is what the CLIs use. This test exercises the EXPLICIT
alternative: ``shard_map`` with per-device batches, ``axis_name``-based sync
BatchNorm (models' ``sync_batch_stats=True``), and a manual ``psum`` gradient
all-reduce — and verifies it reproduces the GSPMD/global-batch numerics exactly.
"""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_unet.losses.segmentation import combined_segmentation_loss
from tpu_unet.models import SegmentationUNet
from tpu_unet.ops.augment import eval_transform
from tpu_unet.parallel import make_mesh, replicate
from tpu_unet.train import create_train_state, make_optimizer


@pytest.mark.slow
def test_shardmap_syncbn_matches_global_batch(devices):
    mesh = make_mesh(n_data=8)
    n_classes = 3

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, n_classes, (16, 32, 32)).astype(np.int32)

    # --- Reference: single logical program, global batch statistics. ---
    ref_model = SegmentationUNet(n_classes=n_classes, base_features=4, dropout=0.0)
    tx = make_optimizer("sgd", 1e-2, 0.0)
    ref_state = create_train_state(ref_model, jax.random.key(0), (1, 32, 32, 3), tx)

    def global_loss(params, batch_stats, img, lbl):
        logits, mut = ref_model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, train=True, mutable=["batch_stats"])
        return combined_segmentation_loss(logits, lbl)["total_loss"], mut["batch_stats"]

    img_f = eval_transform(jnp.asarray(images))
    (ref_loss, ref_stats), ref_grads = jax.value_and_grad(
        global_loss, has_aux=True)(ref_state.params, ref_state.batch_stats,
                                   img_f, jnp.asarray(labels))

    # --- Explicit SPMD: shard_map over 'data', sync-BN via axis_name + psum grads. ---
    sync_model = SegmentationUNet(n_classes=n_classes, base_features=4, dropout=0.0,
                                  sync_batch_stats=True)
    # Same init: parameter structure/values are identical across the two models.
    sync_state = create_train_state(sync_model, jax.random.key(0), (1, 32, 32, 3), tx)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(sync_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params = replicate(mesh, sync_state.params)
    batch_stats = replicate(mesh, sync_state.batch_stats)
    img_sh = jax.device_put(np.asarray(img_f), NamedSharding(mesh, P("data")))
    lbl_sh = jax.device_put(labels, NamedSharding(mesh, P("data")))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P(), P(), P()))
    def spmd_step(params, batch_stats, img, lbl):
        def local_loss(p):
            logits, mut = sync_model.apply(
                {"params": p, "batch_stats": batch_stats},
                img, train=True, mutable=["batch_stats"])
            local = combined_segmentation_loss(logits, lbl)["total_loss"]
            # pmean INSIDE the differentiated function: with sync-BN the local
            # losses are coupled through the shared statistics, so the correct
            # global gradient is grad(pmean(local_loss)) — AD routes the
            # cross-device cotangents through the statistics' psum.
            return jax.lax.pmean(local, "data"), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(local_loss, has_aux=True)(params)
        return loss, grads, new_stats

    loss, grads, stats = jax.jit(spmd_step)(params, batch_stats, img_sh, lbl_sh)

    # Loss parity with the global-batch program.
    assert abs(float(loss) - float(ref_loss)) < 5e-5  # f32 reduction-order tolerance

    # Sync-BN batch statistics equal the global-batch statistics.
    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # pmean'd gradients equal... the global gradients only where the loss is a
    # plain mean over samples; CE/dice are, so check a representative leaf closely.
    ga = jax.tree_util.tree_leaves(ref_grads)[0]
    gb = jax.tree_util.tree_leaves(grads)[0]
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=5e-4)

"""Checkpoint save/load/resume semantics (Orbax-backed)."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.models import UNet
from tpu_unet.train import (
    create_train_state,
    find_best_checkpoint,
    load_checkpoint,
    make_anomaly_train_step,
    make_optimizer,
    save_checkpoint,
)


def make_state(seed=0):
    model = UNet(n_classes=1, base_features=4)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    return create_train_state(model, jax.random.key(seed), (1, 32, 32, 3), tx)


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    state = make_state(0)
    path = os.path.join(tmp_path, "checkpoints", "best_model")
    save_checkpoint(state, epoch=7, loss=0.123, path=path)

    fresh = make_state(1)  # different init
    restored, epoch, loss = load_checkpoint(fresh, path)
    assert epoch == 7 and abs(loss - 0.123) < 1e-9

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                    jax.tree_util.tree_leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_optimizer_state_roundtrip(tmp_path):
    # Take a step so Adam moments are non-trivial, then round-trip them.
    from tests.test_train_steps import FAST_AUG, anomaly_batch  # reuse helpers

    from tpu_unet.models import AnomalyUNet
    model = AnomalyUNet(base_features=4)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
    step = make_anomaly_train_step(aug_cfg=FAST_AUG, donate_state=False)
    img, msk = anomaly_batch()
    state, _ = step(state, img, msk, jax.random.key(0))

    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(state, epoch=1, loss=1.0, path=path)
    fresh = create_train_state(model, jax.random.key(2), (1, 32, 32, 3), tx)
    restored, _, _ = load_checkpoint(fresh, path)

    a = jax.tree_util.tree_leaves(state.opt_state)
    b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    # Training continues identically from the restored state.
    s1, l1 = step(state, img, msk, jax.random.key(9))
    s2, l2 = step(restored, img, msk, jax.random.key(9))
    assert abs(float(l1["total_loss"]) - float(l2["total_loss"])) < 1e-7


def test_find_best_checkpoint(tmp_path):
    exp = str(tmp_path)
    ckpts = os.path.join(exp, "checkpoints")
    os.makedirs(os.path.join(ckpts, "checkpoint_epoch_3"))
    os.makedirs(os.path.join(ckpts, "checkpoint_epoch_10"))
    assert find_best_checkpoint(exp).endswith("checkpoint_epoch_10")
    os.makedirs(os.path.join(ckpts, "best_model"))
    assert find_best_checkpoint(exp).endswith("best_model")
    assert find_best_checkpoint(os.path.join(exp, "nope")) is None


@pytest.mark.slow
def test_async_writer_roundtrip(tmp_path):
    """CheckpointWriter: async saves (incl. same-path overwrite) flush on close
    and load back bitwise; sync mode delegates to save_checkpoint."""
    from tpu_unet.train import CheckpointWriter

    state = make_state(0)
    path = os.path.join(tmp_path, "checkpoints", "best_model")
    with CheckpointWriter() as w:
        w.save(state, epoch=1, loss=1.0, path=path)
        w.save(state, epoch=2, loss=0.5, path=path)  # overwrite while in flight
        w.wait()
    restored, epoch, loss = load_checkpoint(make_state(1), path)
    assert epoch == 2 and abs(loss - 0.5) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sync_path = os.path.join(tmp_path, "checkpoints", "epoch_3")
    with CheckpointWriter(async_save=False) as w:
        w.save(state, epoch=3, loss=0.25, path=sync_path)
    _, epoch, loss = load_checkpoint(make_state(2), sync_path)
    assert epoch == 3 and abs(loss - 0.25) < 1e-9


def test_crash_window_recovery(tmp_path):
    """A kill between the swap's two renames leaves best_model.old — it must be
    discoverable, loadable, and cleaned up by the next successful save."""
    from tpu_unet.train import CheckpointWriter

    state = make_state(0)
    exp = str(tmp_path)
    path = os.path.join(exp, "checkpoints", "best_model")

    # Simulate the crash window: only the renamed-aside backup exists.
    save_checkpoint(state, epoch=4, loss=0.9, path=path + ".old")
    found = find_best_checkpoint(exp)
    assert found == path + ".old"
    _, epoch, _ = load_checkpoint(make_state(1), found)
    assert epoch == 4

    # Next async save swaps a fresh checkpoint in and drops the stale backup.
    with CheckpointWriter() as w:
        w.save(state, epoch=5, loss=0.8, path=path)
    assert os.path.isdir(path) and not os.path.isdir(path + ".old")
    assert not os.path.isdir(path + ".staging")
    assert find_best_checkpoint(exp) == path
    _, epoch, loss = load_checkpoint(make_state(2), path)
    assert epoch == 5 and abs(loss - 0.8) < 1e-9

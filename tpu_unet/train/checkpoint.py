"""Orbax checkpointing with the reference's file-layout semantics.

Parity with /root/reference/src/utils.py:37-58 and the trainers' policies:
- ``best_model`` saved whenever the tracked validation metric improves;
- periodic ``checkpoint_epoch_N`` every --save_freq epochs;
- ``--resume <path>`` restores params/opt_state/batch_stats and continues at
  epoch+1.

Each checkpoint is an Orbax directory (atomic rename on completion — the crash
recovery model SURVEY.md §5 prescribes) storing
{epoch, loss, params, batch_stats, opt_state}. Works for replicated and sharded
states alike (Orbax handles multi-host arrays natively).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from tpu_unet.train.state import TrainState


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def _barrier(name: str) -> None:
    """Cross-process barrier (no-op in single-process runs)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _payload(state: TrainState, epoch: int, loss: float) -> dict:
    return {
        "epoch": epoch,
        "loss": float(loss),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(state: TrainState, epoch: int, loss: float, path: str) -> None:
    """Save a training checkpoint to ``path`` (a directory; overwritten if present)."""
    path = os.path.abspath(path)
    with _checkpointer() as ckptr:
        ckptr.save(path, _payload(state, epoch, loss), force=True)
    if jax.process_index() == 0:
        print(f"Checkpoint saved to {path}")


class CheckpointWriter:
    """Asynchronous checkpoint writer: ``save()`` snapshots device state and
    returns while the serialization/file write overlaps the next training epoch
    (Orbax AsyncCheckpointer).

    The reference blocks training for every torch.save
    (/root/reference/src/train.py:261-270); here the chip keeps stepping. At most
    one write is in flight (a new save waits for the previous one), and ``wait()``
    must be called before reading a just-written checkpoint or exiting.

    Overwrite safety: Orbax's ``force=True`` deletes the existing directory when
    the save STARTS, which with an async write would leave no valid checkpoint
    on disk for the whole overlapped epoch. Instead each save writes to a
    staging sibling (``<path>.staging``) and the previous staging dir is swapped
    into place once its write has finished. The swap renames the old checkpoint
    aside (``<path>.old``) before renaming staging into place, so at every
    instant a complete checkpoint exists under either ``path`` or ``path.old``
    — a crash mid-epoch loses at most the in-flight checkpoint, never the last
    completed one.

    Multi-host safety: Orbax's AsyncCheckpointer coordinates the staging WRITE
    across processes itself, but on a shared filesystem the swap must happen
    exactly once. ``_finish_pending`` therefore barriers all processes after
    ``wait_until_finished``, performs the rename dance on process 0 only, and
    barriers again before anyone may read the final path.
    """

    def __init__(self, async_save: bool = True):
        self._ck = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                    if async_save else None)
        self._pending = None  # (staging_path, final_path) of the in-flight save
        self._swap_count = 0  # unique barrier names across repeated swaps

    def _finish_pending(self) -> None:
        if self._ck is None or self._pending is None:
            return
        self._ck.wait_until_finished()  # Orbax-coordinated across processes
        staging, final = self._pending
        self._pending = None
        self._swap_count += 1
        _barrier(f"ckpt_write_done:{self._swap_count}:{final}")
        if jax.process_index() == 0:
            old = final + ".old"
            if os.path.isdir(final):
                if os.path.isdir(old):  # stale leftover from an earlier crash
                    shutil.rmtree(old)
                os.rename(final, old)
            os.rename(staging, final)
            if os.path.isdir(old):  # a complete ckpt now sits at final; drop backup
                shutil.rmtree(old)
            print(f"Checkpoint saved to {final}")
        _barrier(f"ckpt_swap_done:{self._swap_count}:{final}")

    def save(self, state: TrainState, epoch: int, loss: float, path: str) -> None:
        if self._ck is None:
            save_checkpoint(state, epoch, loss, path)
            return
        path = os.path.abspath(path)
        self._finish_pending()  # at most one outstanding write
        staging = path + ".staging"
        self._ck.save(staging, _payload(state, epoch, loss), force=True)
        self._pending = (staging, path)
        if jax.process_index() == 0:
            print(f"Checkpoint save started (async): {path}")

    def wait(self) -> None:
        self._finish_pending()

    def close(self) -> None:
        if self._ck is not None:
            self._finish_pending()
            self._ck.close()
            self._ck = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_checkpoint(state: TrainState, path: str,
                    restore_optimizer: bool = True) -> Tuple[TrainState, int, float]:
    """Restore ``state`` from ``path``; returns (state, epoch, loss)."""
    path = os.path.abspath(path)
    template = {
        "epoch": 0,
        "loss": 0.0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    # Restore with the TARGET state's shardings, not the topology recorded in the
    # checkpoint — a run trained on N chips must restore onto any mesh (e.g.
    # single-chip eval of a multi-chip training checkpoint).
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    with _checkpointer() as ckptr:
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=template, restore_args=restore_args))
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"] if restore_optimizer else state.opt_state,
    )
    epoch = int(restored["epoch"])
    loss = float(restored["loss"])
    if jax.process_index() == 0:
        print(f"Checkpoint loaded from {path}, epoch {epoch}, loss {loss:.4f}")
    return state, epoch, loss


def load_params(state: TrainState, path: str) -> TrainState:
    """Restore model variables only (for test/visualize CLIs)."""
    state, _, _ = load_checkpoint(state, path, restore_optimizer=False)
    return state


def find_best_checkpoint(experiment_dir: str) -> Optional[str]:
    """Locate best_model (or the newest epoch checkpoint) under an experiment dir,
    mirroring run_pipeline.sh's discovery (/root/reference/run_pipeline.sh:158-173)."""
    ckpt_dir = os.path.join(experiment_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    best = os.path.join(ckpt_dir, "best_model")
    if os.path.isdir(best):
        return best
    # Crash recovery: a kill between the swap's two renames leaves the last
    # completed checkpoint under best_model.old — still fully loadable.
    if os.path.isdir(best + ".old"):
        return best + ".old"
    epochs = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_epoch_"):
            try:
                epochs.append((int(name.rsplit("_", 1)[1]), name))
            except ValueError:
                continue
    if epochs:
        return os.path.join(ckpt_dir, max(epochs)[1])
    return None

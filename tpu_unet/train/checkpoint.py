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
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from tpu_unet.train.state import TrainState


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


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
    into place (rmtree old + rename, sub-second) once its write has finished —
    a crash mid-epoch loses at most the in-flight checkpoint, never the last
    completed one.
    """

    def __init__(self, async_save: bool = True):
        self._ck = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                    if async_save else None)
        self._pending = None  # (staging_path, final_path) of the in-flight save

    def _finish_pending(self) -> None:
        if self._ck is None or self._pending is None:
            return
        self._ck.wait_until_finished()
        staging, final = self._pending
        self._pending = None
        if os.path.isdir(final):
            import shutil
            shutil.rmtree(final)
        os.rename(staging, final)
        print(f"Checkpoint saved to {final}")

    def save(self, state: TrainState, epoch: int, loss: float, path: str) -> None:
        if self._ck is None:
            save_checkpoint(state, epoch, loss, path)
            return
        path = os.path.abspath(path)
        self._finish_pending()  # at most one outstanding write
        staging = path + ".staging"
        self._ck.save(staging, _payload(state, epoch, loss), force=True)
        self._pending = (staging, path)
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

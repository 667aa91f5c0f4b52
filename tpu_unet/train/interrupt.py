"""Preemption-tolerant training: SIGTERM -> checkpoint -> clean exit.

Preemptible TPU VMs, kubelet evictions, and ``docker stop`` all deliver
SIGTERM with a short grace window before SIGKILL. The reference loses all
progress since the last periodic checkpoint on any such kill
(/root/reference/src/train.py:267-270 — torch.save only every --save_freq
epochs). Here the trainers install a flag-only SIGTERM handler around the
epoch loop; the epoch drivers poll it between steps and the CLI then saves a
``checkpoint_interrupt`` whose epoch field points at the last COMPLETED
epoch, so ``--resume outputs/<exp>/checkpoints/checkpoint_interrupt`` replays
the interrupted epoch from its start and continues.

Multi-host: a mid-epoch break must happen on EVERY process at the SAME step
or the lockstep collective schedule deadlocks (process A stops stepping while
B blocks in an all-reduce). Per-step cross-host agreement would add a blocking
host collective to every step, so multi-process runs poll only at epoch
boundaries (``poll_global`` all-gathers the flag); single-process runs get
step-granular stops.

Exit code 75 (EX_TEMPFAIL) marks the run requeueable for orchestrators.
"""

from __future__ import annotations

import os
import signal
from typing import Callable, Optional

# sysexits.h EX_TEMPFAIL: "temporary failure, retry later" — the conventional
# requeue-me exit status.
INTERRUPT_EXIT_CODE = 75

# Checkpoint directory name the trainers write on interruption.
INTERRUPT_CHECKPOINT = "checkpoint_interrupt"


class GracefulInterrupt:
    """Context manager: latch SIGTERM into a flag instead of dying.

    >>> with GracefulInterrupt() as intr:
    ...     for epoch in range(epochs):
    ...         train_epoch(..., should_stop=intr.step_poll())
    ...         if intr.poll_global():
    ...             save_interrupt_checkpoint(); break

    The previous signal disposition is restored on exit. The handler only sets
    a flag (async-signal-safe); all checkpoint/IO work happens at the next
    poll point on the main thread.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous = {}
        self._triggered = False

    # -- signal plumbing ------------------------------------------------------

    def _handler(self, signum, frame):
        self._triggered = True

    def install(self) -> "GracefulInterrupt":
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handler)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()

    def __enter__(self) -> "GracefulInterrupt":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- polling --------------------------------------------------------------

    @property
    def triggered(self) -> bool:
        """This process's local flag (no cross-host agreement)."""
        return self._triggered

    def step_poll(self) -> Optional[Callable[[], bool]]:
        """Per-step ``should_stop`` callable for the epoch drivers.

        Returns None in multi-process runs: processes must not break out of an
        epoch independently (see module docstring), so multi-host stops are
        epoch-granular via :meth:`poll_global`.
        """
        import jax

        if jax.process_count() > 1:
            return None
        return lambda: self._triggered

    def poll_global(self) -> bool:
        """True if ANY process has latched a signal (epoch-boundary check).

        Single-process: the local flag. Multi-process: an all-gather so every
        process takes the same branch even when only one host was signalled.
        """
        import jax

        if jax.process_count() == 1:
            return self._triggered
        import numpy as np

        from tpu_unet.parallel.collectives import all_gather_host_values

        flags = all_gather_host_values(
            np.asarray([1.0 if self._triggered else 0.0]))
        return bool(flags.any())


def interrupt_checkpoint_path(checkpoints_dir: str) -> str:
    return os.path.join(checkpoints_dir, INTERRUPT_CHECKPOINT)

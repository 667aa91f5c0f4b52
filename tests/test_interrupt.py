"""Preemption tolerance: SIGTERM -> checkpoint_interrupt -> exit 75 -> --resume.

Covers the signal latch (unit), the epoch drivers' should_stop breaks (loop
level), and the real CLI behavior under a real SIGTERM (subprocess e2e for both
trainer families), including the resume leg.
"""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from tests.test_data import make_kolektorsdd, make_mvtec

# Whole-file slow tier: e2e/CLI/multiprocess tests (see pyproject markers).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Unit: the signal latch
# ---------------------------------------------------------------------------

def test_latch_and_restore_disposition():
    from tpu_unet.train.interrupt import GracefulInterrupt

    before = signal.getsignal(signal.SIGTERM)
    with GracefulInterrupt() as intr:
        assert not intr.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.monotonic() + 5.0
        while not intr.triggered and time.monotonic() < deadline:
            time.sleep(0.001)
        assert intr.triggered
        # Single-process: step_poll is a live callable, poll_global == local.
        assert intr.step_poll()() is True
        assert intr.poll_global() is True
    assert signal.getsignal(signal.SIGTERM) is before


def test_untriggered_polls_are_false():
    from tpu_unet.train.interrupt import GracefulInterrupt

    with GracefulInterrupt() as intr:
        assert intr.step_poll()() is False
        assert intr.poll_global() is False


# ---------------------------------------------------------------------------
# Loop level: should_stop breaks an epoch between steps
# ---------------------------------------------------------------------------

def _fake_batches(n, b=2):
    return [{"image": np.zeros((b, 8, 8, 3), np.uint8),
             "mask": np.zeros((b, 8, 8, 1), np.uint8)} for _ in range(n)]


def test_anomaly_epoch_should_stop():
    import jax.numpy as jnp

    from tpu_unet.train.loop import train_anomaly_epoch

    calls = []

    def step_fn(state, images, masks, key):
        calls.append(1)
        return state, {"total_loss": jnp.float32(1.0),
                       "recon_loss": jnp.float32(0.5),
                       "seg_loss": jnp.float32(0.5)}

    state, out = train_anomaly_epoch(
        "state", step_fn, _fake_batches(5), jax.random.key(0), 0,
        should_stop=lambda: len(calls) >= 2)
    assert len(calls) == 2  # stopped before the 3rd step
    assert out["total_loss"] == pytest.approx(1.0)


def test_seg_epoch_should_stop():
    import jax.numpy as jnp

    from tpu_unet.train.loop import train_seg_epoch

    calls = []

    def step_fn(state, images, masks, key):
        calls.append(1)
        cm = jnp.zeros((3, 3), jnp.int32)
        return state, {"total_loss": jnp.float32(1.0)}, cm

    state, out, metrics = train_seg_epoch(
        "state", step_fn, _fake_batches(5), jax.random.key(0), 0, 3,
        should_stop=lambda: len(calls) >= 3)
    assert len(calls) == 3
    assert out["total_loss"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# e2e: real CLI subprocess, real SIGTERM
# ---------------------------------------------------------------------------

def _cli_env():
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "TPU_UNET_DATA_CACHE": ""})
    return env


def _run_until_step_then_sigterm(cmd, timeout_s=600):
    """Launch a trainer, wait for the first intra-epoch progress line, SIGTERM it.

    Returns (returncode, full stdout). --progress_every 1 guarantees a 'step'
    line early in epoch 0 (printed after the signal handler is installed).
    """
    proc = subprocess.Popen(cmd, cwd=REPO, env=_cli_env(), text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    lines = []
    deadline = time.monotonic() + timeout_s
    try:
        for line in proc.stdout:
            lines.append(line)
            if "step " in line:
                proc.send_signal(signal.SIGTERM)
                break
            if time.monotonic() > deadline:
                raise AssertionError("no progress line before deadline:\n"
                                     + "".join(lines)[-4000:])
        out, _ = proc.communicate(timeout=timeout_s)
        lines.append(out or "")
    finally:
        if proc.poll() is None:
            proc.kill()
    return proc.returncode, "".join(lines)


def _read_ckpt_epoch(path):
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return int(restored["epoch"])


def test_train_mvtec_sigterm_checkpoint_then_resume(tmp_path):
    from tpu_unet.train.interrupt import INTERRUPT_EXIT_CODE

    root = make_mvtec(str(tmp_path / "mvtec"), n_train=8, n_test_good=2,
                      n_broken=2, size=32)
    save_dir = str(tmp_path / "outputs")
    base = [sys.executable, "-u", "-m", "tpu_unet.cli.train_mvtec",
            "--data_root", root, "--category", "bottle", "--image_size", "32",
            "--batch_size", "4", "--val_freq", "50", "--save_freq", "100",
            "--num_workers", "2", "--save_dir", save_dir,
            "--base_features", "4", "--precision", "f32", "--device", "cpu",
            "--n_devices", "2", "--progress_every", "1"]
    rc, out = _run_until_step_then_sigterm(base + ["--epochs", "300"])
    assert rc == INTERRUPT_EXIT_CODE, out[-4000:]
    assert "interrupted" in out.lower()

    exps = sorted(os.listdir(save_dir))
    assert len(exps) == 1
    exp = os.path.join(save_dir, exps[0])
    ipath = os.path.join(exp, "checkpoints", "checkpoint_interrupt")
    assert os.path.isdir(ipath), out[-4000:]
    with open(os.path.join(exp, "results", "training_results.json")) as f:
        results = json.load(f)
    assert results["interrupted"] is True

    # The checkpoint's epoch field is the last COMPLETED epoch; --resume replays
    # the interrupted one. Run exactly one more epoch and finish cleanly.
    last_done = _read_ckpt_epoch(ipath)
    res = subprocess.run(
        base + ["--epochs", str(last_done + 2), "--resume", ipath],
        cwd=REPO, env=_cli_env(), text=True, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert res.returncode == 0, res.stdout[-4000:]
    exps2 = [d for d in sorted(os.listdir(save_dir)) if d not in exps]
    assert len(exps2) == 1
    with open(os.path.join(save_dir, exps2[0], "results",
                           "training_results.json")) as f:
        resumed = json.load(f)
    assert resumed["interrupted"] is False
    assert len(resumed["train_losses"]) == 1  # exactly the one remaining epoch


def test_train_kolektorsdd_sigterm_checkpoint(tmp_path):
    from tpu_unet.train.interrupt import INTERRUPT_EXIT_CODE

    root = make_kolektorsdd(str(tmp_path / "ksdd"), n_folders=4, per_folder=3,
                            h=64, w=32)
    save_dir = str(tmp_path / "outputs")
    cmd = [sys.executable, "-u", "-m", "tpu_unet.cli.train_kolektorsdd",
           "--data_root", root, "--image_height", "64", "--image_width", "32",
           "--epochs", "300", "--batch_size", "2", "--val_freq", "50",
           "--save_freq", "100", "--num_workers", "2", "--save_dir", save_dir,
           "--base_features", "4", "--precision", "f32", "--device", "cpu",
           "--n_devices", "2", "--progress_every", "1"]
    rc, out = _run_until_step_then_sigterm(cmd)
    assert rc == INTERRUPT_EXIT_CODE, out[-4000:]

    exps = sorted(os.listdir(save_dir))
    assert len(exps) == 1
    exp = os.path.join(save_dir, exps[0])
    assert os.path.isdir(os.path.join(exp, "checkpoints", "checkpoint_interrupt"))
    with open(os.path.join(exp, "results", "training_results.json")) as f:
        results = json.load(f)
    assert results["interrupted"] is True

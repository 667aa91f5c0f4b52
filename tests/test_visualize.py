"""Visualization CLI smoke tests (headless rendering on tiny checkpoints)."""

import os

import jax
import pytest

from tests.test_data import make_gear, make_mvtec
from tpu_unet.models import AnomalyUNet, SegmentationUNet
from tpu_unet.train import create_train_state, make_optimizer, save_checkpoint


def make_ckpt(tmp_path, model, hw):
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(model, jax.random.key(0), (1, *hw, 3), tx)
    exp = os.path.join(tmp_path, "outputs", "bottle_anomaly_unet_20260101_000000")
    path = os.path.join(exp, "checkpoints", "best_model")
    save_checkpoint(state, 0, 1.0, path)
    return exp, path


def test_visualize_mvtec(tmp_path):
    from tpu_unet.cli.visualize_mvtec import discover_checkpoint, main

    root = make_mvtec(os.path.join(tmp_path, "data"), size=32)
    exp, ckpt = make_ckpt(tmp_path, AnomalyUNet(base_features=4), (32, 32))

    # Checkpoint auto-discovery walks the outputs dir.
    assert discover_checkpoint(os.path.join(tmp_path, "outputs"), "bottle") == ckpt

    # Newest-by-mtime, model-filtered: an OLD plain-unet experiment sorts
    # lexicographically AFTER anomaly_unet ('u' > 'a') but must not win, and
    # with model given the matching architecture is preferred outright.
    import time

    stale = os.path.join(tmp_path, "outputs", "bottle_unet_20250101_000000")
    stale_ckpt = os.path.join(stale, "checkpoints", "best_model")
    os.makedirs(os.path.dirname(stale_ckpt))
    import shutil
    shutil.copytree(ckpt, stale_ckpt)
    old = time.time() - 3600
    os.utime(stale, (old, old))
    outputs = os.path.join(tmp_path, "outputs")
    assert discover_checkpoint(outputs, "bottle") == ckpt  # newest wins
    assert discover_checkpoint(outputs, "bottle", "anomaly_unet") == ckpt
    assert discover_checkpoint(outputs, "bottle", "unet") == stale_ckpt

    out = main([
        "--data_root", root, "--category", "bottle", "--image_size", "32",
        "--outputs_dir", os.path.join(tmp_path, "outputs"),
        "--output_dir", os.path.join(tmp_path, "viz"),
        "--batch_size", "4", "--num_workers", "2", "--max_samples", "3",
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    assert out is not None
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert pngs, "expected rendered panels"


def test_visualize_mvtec_interactive_browser(tmp_path):
    """--interactive returns the Previous/Next/Info browser; navigation wraps and
    Info prints sample metadata (reference AnomalyVisualizer parity, headless-driven)."""
    from tpu_unet.cli.visualize_mvtec import main

    root = make_mvtec(os.path.join(tmp_path, "data"), size=32)
    exp, ckpt = make_ckpt(tmp_path, AnomalyUNet(base_features=4), (32, 32))

    browser = main([
        "--data_root", root, "--category", "bottle", "--image_size", "32",
        "--checkpoint", ckpt, "--output_dir", os.path.join(tmp_path, "viz"),
        "--batch_size", "4", "--num_workers", "2", "--max_samples", "3",
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
        "--interactive",
    ])
    assert browser is not None and len(browser.records) == 3
    assert browser.idx == 0
    browser.next()
    assert browser.idx == 1
    browser.prev()
    browser.prev()
    assert browser.idx == 2  # wraps backwards
    browser.next()
    assert browser.idx == 0  # wraps forwards
    title = browser.fig._suptitle.get_text()
    assert "Sample 1/3" in title and "score=" in title
    browser.info()  # prints metadata; must not raise
    assert {"image", "mask", "anomaly_map", "reconstruction", "error_map",
            "score", "label", "anomaly_type", "image_path"} <= set(browser.records[0])


def test_visualize_seg_gear(tmp_path):
    from tpu_unet.cli.visualize_seg import main

    root = make_gear(os.path.join(tmp_path, "data"), n_per_split=3, size=32)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(SegmentationUNet(n_classes=4, base_features=4),
                               jax.random.key(0), (1, 32, 32, 3), tx)
    ckpt = os.path.join(tmp_path, "exp", "checkpoints", "best_model")
    save_checkpoint(state, 0, 1.0, ckpt)

    out = main([
        "--dataset", "gear", "--data_root", root, "--image_size", "32",
        "--checkpoint", ckpt, "--batch_size", "4", "--num_workers", "2",
        "--max_samples", "2", "--base_features", "4", "--precision", "f32",
        "--n_devices", "2",
    ])
    assert out is not None
    files = os.listdir(out)
    # Reference artifact names (visualize.py:385,412,437): per-sample panels,
    # predictions grid, class distribution.
    assert any(f.startswith("prediction_") and f.endswith(".png") for f in files)
    assert "predictions_grid.png" in files
    assert "class_distribution.png" in files


def test_visualize_seg_unetpp_deep_supervision(tmp_path):
    """--model unetpp --deep_supervision must rebuild the multi-head params
    before restore — a plain build would have one 'outc' vs the checkpoint's
    outc_1..outc_4 and crash (or restore garbage heads)."""
    from tpu_unet.cli.visualize_seg import main
    from tpu_unet.models import UNetPlusPlus

    root = make_gear(os.path.join(tmp_path, "data"), n_per_split=3, size=32)
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = create_train_state(
        UNetPlusPlus(n_classes=4, base_features=4, deep_supervision=True),
        jax.random.key(0), (1, 32, 32, 3), tx)
    ckpt = os.path.join(tmp_path, "exp", "checkpoints", "best_model")
    save_checkpoint(state, 0, 1.0, ckpt)

    out = main([
        "--dataset", "gear", "--data_root", root, "--image_size", "32",
        "--checkpoint", ckpt, "--batch_size", "4", "--num_workers", "2",
        "--max_samples", "1", "--base_features", "4", "--precision", "f32",
        "--model", "unetpp", "--deep_supervision", "--n_devices", "2",
    ])
    assert out is not None and "predictions_grid.png" in os.listdir(out)


def test_demo_cli(tmp_path, monkeypatch):
    from tpu_unet.cli.demo import main

    monkeypatch.chdir(tmp_path)
    assert main(["--image_size", "32", "--output", "demo.png"]) is True
    assert os.path.exists("demo.png")


@pytest.mark.slow
def test_dryrun_multichip(devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally on finite loss + replication

"""End-to-end segmentation slices: Gear and KolektorSDD train+eval CLIs on
synthetic data at tiny scale."""

import json
import os

import pytest

from tests.test_data import make_gear, make_kolektorsdd

# Whole-file slow tier: e2e/CLI/multiprocess tests (see pyproject markers).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def gear_root(tmp_path_factory):
    return make_gear(str(tmp_path_factory.mktemp("gear")), n_per_split=4, size=32)


@pytest.fixture(scope="module")
def ksdd_root(tmp_path_factory):
    return make_kolektorsdd(str(tmp_path_factory.mktemp("ksdd")),
                            n_folders=4, per_folder=3, h=64, w=32)


def test_gear_train_then_eval(gear_root, tmp_path):
    from tpu_unet.cli.train_gear import main as train_main
    from tpu_unet.cli.test_gear import main as test_main

    save_dir = os.path.join(tmp_path, "outputs")
    exp_dir = train_main([
        "--data_root", gear_root, "--image_size", "32",
        "--epochs", "2", "--batch_size", "4", "--val_freq", "1",
        "--save_freq", "1", "--num_workers", "2", "--save_dir", save_dir,
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    assert exp_dir is not None and "gear_seg_seg_unet" in os.path.basename(exp_dir)

    results_path = os.path.join(exp_dir, "results", "training_results.json")
    with open(results_path) as f:
        results = json.load(f)
    assert results["num_classes"] == 4
    assert len(results["train_losses"]) == 2

    best = os.path.join(exp_dir, "checkpoints", "best_model")
    assert os.path.isdir(best)

    out_dir = os.path.join(tmp_path, "eval")
    summary = test_main([
        "--data_root", gear_root, "--image_size", "32", "--batch_size", "4",
        "--num_workers", "2", "--checkpoint", best, "--output_dir", out_dir,
        "--base_features", "4", "--precision", "f32", "--n_devices", "2", "--save_predictions",
    ])
    assert summary is not None
    om = summary["overall_metrics"]
    for key in ("pixel_accuracy", "mean_iou", "mean_dice", "mean_f1"):
        assert 0.0 <= om[key] <= 1.0
    assert len(summary["per_class_metrics"]["iou"]) == 4
    assert os.path.exists(os.path.join(out_dir, "evaluation_results.json"))
    assert os.path.exists(os.path.join(out_dir, "confusion_matrix.png"))
    panels = [f for f in os.listdir(out_dir) if f.startswith("prediction_")]
    assert panels, "expected prediction panels"


def test_kolektorsdd_train_then_eval(ksdd_root, tmp_path):
    from tpu_unet.cli.train_kolektorsdd import main as train_main
    from tpu_unet.cli.test_kolektorsdd import main as test_main

    save_dir = os.path.join(tmp_path, "outputs")
    exp_dir = train_main([
        "--data_root", ksdd_root, "--image_height", "64", "--image_width", "32",
        "--epochs", "1", "--batch_size", "4", "--val_freq", "1",
        "--save_freq", "1", "--num_workers", "2", "--save_dir", save_dir,
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    assert exp_dir is not None and "kolektorsdd_seg_unet" in os.path.basename(exp_dir)

    best = os.path.join(exp_dir, "checkpoints", "best_model")
    ckpt = best if os.path.isdir(best) else os.path.join(
        exp_dir, "checkpoints", "checkpoint_epoch_0")

    out_dir = os.path.join(tmp_path, "eval")
    summary = test_main([
        "--data_root", ksdd_root, "--image_height", "64", "--image_width", "32",
        "--batch_size", "4", "--num_workers", "2", "--checkpoint", ckpt,
        "--output_dir", out_dir, "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    assert summary is not None
    assert len(summary["per_class_metrics"]["iou"]) == 3
    assert summary["confusion_matrix"] is not None


def test_kolektorsdd_spatial_train_then_eval(ksdd_root, tmp_path):
    """--n_space 2: the full CLI path (train 1 epoch + eval) over a data x space
    mesh; eval metrics on the same checkpoint must match the unsharded eval
    (GSPMD halo-exchange numerics, f32)."""
    from tpu_unet.cli.test_kolektorsdd import main as test_main
    from tpu_unet.cli.train_kolektorsdd import main as train_main

    save_dir = os.path.join(tmp_path, "outputs_sp")
    exp_dir = train_main([
        "--data_root", ksdd_root, "--image_height", "64", "--image_width", "32",
        "--epochs", "1", "--batch_size", "4", "--val_freq", "1",
        "--save_freq", "1", "--num_workers", "2", "--save_dir", save_dir,
        "--base_features", "4", "--precision", "f32",
        "--n_devices", "2", "--n_space", "2",
    ])
    assert exp_dir is not None
    best = os.path.join(exp_dir, "checkpoints", "best_model")
    ckpt = best if os.path.isdir(best) else os.path.join(
        exp_dir, "checkpoints", "checkpoint_epoch_0")

    common = ["--data_root", ksdd_root, "--image_height", "64",
              "--image_width", "32", "--batch_size", "4", "--num_workers", "2",
              "--checkpoint", ckpt, "--base_features", "4", "--precision", "f32"]
    sharded = test_main(common + ["--output_dir", os.path.join(tmp_path, "ev_sp"),
                                  "--n_devices", "2", "--n_space", "2"])
    plain = test_main(common + ["--output_dir", os.path.join(tmp_path, "ev_pl"),
                                "--n_devices", "2"])
    assert sharded is not None and plain is not None
    for key in ("pixel_accuracy", "mean_iou", "mean_dice"):
        assert abs(sharded["overall_metrics"][key]
                   - plain["overall_metrics"][key]) < 1e-5, key

"""run_pipeline.sh end-to-end: train -> discover checkpoint -> test -> visualize
-> serve on synthetic MVTec data, via the actual bash script (the reference's L6
orchestration layer, /root/reference/run_pipeline.sh)."""

import pytest
import json
import os
import shutil
import subprocess

from tests.test_data import make_kolektorsdd, make_mvtec

# Whole-file slow tier: e2e/CLI/multiprocess tests (see pyproject markers).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pipeline_mvtec(tmp_path):
    root = make_mvtec(str(tmp_path / "mvtec"), n_train=8, n_test_good=2,
                      n_broken=2, size=32)
    env = dict(os.environ)
    env.update({
        "TPU_UNET_DATA_CACHE": "",
        "DATASET": "mvtec",
        "DATA_ROOT": root,
        "CATEGORY": "bottle",
        "MODEL": "anomaly_unet",
        "IMAGE_SIZE": "32",
        "EPOCHS": "1",
        "BATCH_SIZE": "4",
        "PRECISION": "f32",
        "SAVE_DIR": os.path.join(tmp_path, "outputs"),
        "TEST_DIR": os.path.join(tmp_path, "test_results"),
        "VIS_DIR": os.path.join(tmp_path, "visualizations"),
        "SERVE_DIR": os.path.join(root, "bottle", "test", "broken"),
        "EXTRA_TRAIN_ARGS": "--base_features 4 --val_freq 1 --save_freq 1 "
                            "--num_workers 2 --device cpu --n_devices 2",
        "EXTRA_TEST_ARGS": "--base_features 4 --device cpu --n_devices 2",
        "EXTRA_VIS_ARGS": "--base_features 4 --device cpu --n_devices 2 "
                          "--max_samples 2 --batch_size 4",
        "EXTRA_SERVE_ARGS": "--base_features 4 --device cpu --batch_size 4",
        "EXPORT_ARTIFACT": os.path.join(tmp_path, "artifact"),
        "BUCKET_SIZES": "1",
    })
    proc = subprocess.run(["bash", os.path.join(REPO, "run_pipeline.sh")],
                          cwd=REPO, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "Pipeline completed" in proc.stdout

    outputs = os.path.join(tmp_path, "outputs")
    assert os.path.exists(os.path.join(outputs, "pipeline_config.txt"))
    exps = [d for d in os.listdir(outputs) if d.startswith("bottle_anomaly_unet")]
    assert len(exps) == 1
    assert os.path.isdir(os.path.join(outputs, exps[0], "checkpoints", "best_model"))

    test_dir = os.path.join(tmp_path, "test_results")
    assert os.path.exists(os.path.join(test_dir, "bottle_test_results",
                                       "test_metrics.json"))
    with open(os.path.join(test_dir, "scores.json")) as f:
        scores = json.load(f)
    assert len(scores["scores"]) == 2  # the 2 broken test images served

    vis_dir = os.path.join(tmp_path, "visualizations")
    assert any(f.endswith(".png") for f in os.listdir(vis_dir))

    # EXPORT_ARTIFACT + BUCKET_SIZES knobs: the serving stage wrote a bucketed
    # (format v2) AOT artifact — one program per ladder size + shared params.
    art = os.path.join(tmp_path, "artifact")
    assert os.path.exists(os.path.join(art, "meta.json"))
    assert os.path.exists(os.path.join(art, "params.npz"))
    assert os.path.exists(os.path.join(art, "program_b1.jaxexport"))
    assert os.path.exists(os.path.join(art, "program_b4.jaxexport"))
    with open(os.path.join(art, "meta.json")) as f:
        assert json.load(f)["bucket_sizes"] == [1, 4]


def test_pipeline_kolektorsdd_int8(tmp_path):
    """KolektorSDD pipeline with QUANTIZE=int8: the serving stage calibrates
    from the kos*/ folders (no images/ subdir — the layout that used to abort
    stage 4 with 'no calibration images') and the annotation rasters are
    filtered out of the calibration set."""
    root = make_kolektorsdd(str(tmp_path / "ksdd"), n_folders=4, per_folder=3,
                            h=64, w=32)
    # A serve dir with images only: pointing --input_dir at a kos*/ folder
    # would also "predict" on the X_label.bmp annotation rasters.
    serve_dir = tmp_path / "serve_inputs"
    serve_dir.mkdir()
    for name in ("Part0.jpg", "Part1.jpg"):
        shutil.copy(os.path.join(root, "kos00", name), serve_dir / name)

    geom = ("--image_height 64 --image_width 32 --base_features 4 "
            "--device cpu --n_devices 2")
    env = dict(os.environ)
    env.update({
        "TPU_UNET_DATA_CACHE": "",
        "DATASET": "kolektorsdd",
        "DATA_ROOT": root,
        "MODEL": "seg_unet",
        "EPOCHS": "1",
        "BATCH_SIZE": "2",
        "PRECISION": "f32",
        "QUANTIZE": "int8",
        "SAVE_DIR": os.path.join(tmp_path, "outputs"),
        "TEST_DIR": os.path.join(tmp_path, "test_results"),
        "VIS_DIR": os.path.join(tmp_path, "visualizations"),
        "SERVE_DIR": str(serve_dir),
        "EXTRA_TRAIN_ARGS": f"{geom} --val_freq 1 --save_freq 1 --num_workers 2",
        "EXTRA_TEST_ARGS": f"{geom} --num_workers 2",
        "EXTRA_VIS_ARGS": f"{geom} --num_workers 2 --max_samples 2",
        # argparse last-wins: overrides the script's hardcoded 1024x512.
        "EXTRA_SERVE_ARGS": f"{geom} --batch_size 2 --calib_samples 4",
    })
    proc = subprocess.run(["bash", os.path.join(REPO, "run_pipeline.sh")],
                          cwd=REPO, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "Pipeline completed" in proc.stdout

    outputs = os.path.join(tmp_path, "outputs")
    exps = [d for d in os.listdir(outputs) if d.startswith("kolektorsdd_seg_unet")]
    assert len(exps) == 1
    assert os.path.isdir(os.path.join(outputs, exps[0], "checkpoints", "best_model"))
    assert os.path.exists(os.path.join(tmp_path, "test_results", "kolektorsdd",
                                       "evaluation_results.json"))
    assert any(f.endswith(".png")
               for f in os.listdir(os.path.join(tmp_path, "visualizations")))

    with open(os.path.join(tmp_path, "test_results", "served_masks",
                           "predictions.json")) as f:
        payload = json.load(f)
    assert payload["quantize"] == "int8"  # stage 4 actually ran quantized
    assert len(payload["predictions"]) == 2
    masks = os.listdir(os.path.join(tmp_path, "test_results", "served_masks"))
    assert sum(m.endswith("_mask.png") for m in masks) == 2

"""run_pipeline.sh end-to-end: train -> discover checkpoint -> test -> visualize
-> serve on synthetic MVTec data, via the actual bash script (the reference's L6
orchestration layer, /root/reference/run_pipeline.sh)."""

import json
import os
import subprocess

from tests.test_data import make_mvtec

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

    # EXPORT_ARTIFACT knob: the serving stage also wrote an AOT artifact.
    art = os.path.join(tmp_path, "artifact")
    assert os.path.exists(os.path.join(art, "meta.json"))
    assert os.path.exists(os.path.join(art, "program.jaxexport"))

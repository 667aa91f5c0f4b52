"""Analysis-tool smoke tests on synthetic fixtures (host-only, fast)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.test_data import make_gear, make_kolektorsdd


def test_analyze_classes(tmp_path, capsys):
    import analyze_classes

    root = make_gear(str(tmp_path))
    totals = analyze_classes.analyze(root)
    # Every fixture file has one polygon per class across 3 splits x 3 files.
    assert totals[0] == 9 and totals[1] == 9 and totals[2] == 9
    out = capsys.readouterr().out
    assert "pitting" in out and "remapping" in out


def test_analyze_class_overlaps(tmp_path):
    import analyze_class_overlaps

    root = make_gear(str(tmp_path))
    report = analyze_class_overlaps.analyze(root, str(tmp_path / "overlap_out"))
    # Fixture polygons overlap pitting/spalling by construction.
    assert any("pitting" in k and "spalling" in k for k in report["total"]["overlap_pixels"])
    assert os.path.exists(tmp_path / "overlap_out" / "overlap_analysis_detailed.json")
    with open(tmp_path / "overlap_out" / "overlap_analysis_detailed.json") as f:
        loaded = json.load(f)
    assert loaded["total"]["class_pixels"]
    # Reference-parity artifacts and report fields (heatmap + bars + rich stats).
    assert os.path.exists(tmp_path / "overlap_out" / "overlap_matrix.png")
    assert os.path.exists(tmp_path / "overlap_out" / "overlap_analysis.png")
    assert loaded["summary"]["total_files_processed"] == 9
    assert loaded["summary"]["files_with_any_overlap"] == 9  # every fixture file overlaps
    assert loaded["summary"]["percentage_files_with_overlap"] == 100.0
    assert loaded["detailed_stats"][0]["overlap_pixels"] >= loaded["detailed_stats"][-1]["overlap_pixels"]
    assert all(0.0 <= d["overlap_ratio_a"] <= 1.0 for d in loaded["detailed_stats"])
    # Both directions of the percentage are reported (% of A and % of B).
    keys = loaded["total"]["overlap_percentages"]
    assert any("% of pitting" in k for k in keys) and any("% of spalling" in k for k in keys)


def test_analyze_kolektorsdd(tmp_path, capsys):
    import analyze_kolektorsdd

    root = make_kolektorsdd(str(tmp_path))
    analyze_kolektorsdd.analyze(root, save_viz=str(tmp_path / "samples.png"))
    out = capsys.readouterr().out
    assert "image/mask pairs" in out
    assert os.path.exists(tmp_path / "samples.png")


def test_find_defects(tmp_path, capsys):
    import find_defects_kolektorsdd

    root = make_kolektorsdd(str(tmp_path))
    defective = find_defects_kolektorsdd.find_defects(root)
    assert len(defective) == 6  # (k+i) % 2 == 0 in a 4x3 grid
    out = capsys.readouterr().out
    assert "contain defects" in out


def test_priority_resolution_tool(tmp_path, monkeypatch, capsys):
    import test_priority_resolution as tool

    root = make_gear(str(tmp_path / "gear"))
    out_dir = str(tmp_path / "samples")
    monkeypatch.setattr(sys, "argv",
                        ["tool", "--data_root", root, "--image_size", "64",
                         "--output_dir", out_dir, "--samples", "2"])
    tool.main()
    out = capsys.readouterr().out
    assert "Priority Resolution Stats" in out
    assert any(f.endswith("_mask.png") for f in os.listdir(out_dir))


def test_make_report(tmp_path):
    import base64

    import make_report

    exp = tmp_path / "exp"
    (exp / "results").mkdir(parents=True)
    (exp / "checkpoints").mkdir()
    with open(exp / "args.json", "w") as f:
        json.dump({"category": "bottle", "epochs": 3, "lr": 1e-3}, f)
    with open(exp / "results" / "training_results.json", "w") as f:
        json.dump({"train_losses": [1.0, 0.5, 0.2], "val_losses": [0.9, 0.4, 0.3],
                   "best_val_loss": 0.3}, f)
    with open(exp / "results" / "test_metrics.json", "w") as f:
        json.dump({"image_metrics": {"auroc": 0.97, "f1_score": 0.8},
                   "pixel_metrics": {"pixel_f1_@0.5": 0.6}, "threshold": 0.42}, f)
    png = base64.b64decode(  # 1x1 black pixel
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNgYGBgAAAABQAB"
        b"h6FO1AAAAABJRU5ErkJggg==")
    with open(exp / "results" / "training_curves.png", "wb") as f:
        f.write(png)

    out = make_report.main(["--experiment_dir", str(exp)])
    html_text = open(out).read()
    assert "Run configuration" in html_text and "Evaluation (anomaly)" in html_text
    assert "auroc" in html_text and "0.97" in html_text
    assert "data:image/png;base64," in html_text
    assert "final train loss <b>0.2</b>" in html_text


@pytest.mark.slow
def test_bench_daemon_smoke(capsys):
    """Daemon benchmark sweeps concurrency levels against the micro-batcher
    and prints one JSON line each (hermetic: CPU, in-process service)."""
    import bench_daemon

    bench_daemon.main(["--clients", "1", "3", "--requests_per_client", "3",
                       "--batch_size", "2", "--base_features", "8",
                       "--height", "32", "--width", "32",
                       "--max_wait_ms", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert [r["clients"] for r in lines] == [1, 3]
    for rec in lines:
        assert rec["requests"] == rec["clients"] * 3
        assert rec["req_per_sec"] > 0
        assert 1.0 <= rec["mean_batch_occupancy"] <= rec["batch_size"]


@pytest.mark.slow
def test_bench_accum_smoke(monkeypatch, capsys):
    """Accumulation A/B runs both tasks at tiny shapes and prints an img/s +
    temp-memory line per (batch, accum) pair (hermetic: CPU, in-process)."""
    import bench_accum

    monkeypatch.setattr(sys, "argv", ["bench_accum.py", "--image_size", "24",
                                      "--pairs", "2x1,4x2", "--steps", "2",
                                      "--base_features", "4",
                                      "--warmup", "0"])  # 0: clamped to 1 warm call
    bench_accum.main()
    out = capsys.readouterr().out
    assert out.count("img/s") == 2 and "accum 2" in out and "temp" in out

    monkeypatch.setattr(sys, "argv", ["bench_accum.py", "--task", "seg",
                                      "--height", "24", "--width", "16",
                                      "--pairs", "2x2", "--steps", "2",
                                      "--base_features", "4",
                                      "--warmup", "1"])
    bench_accum.main()
    out = capsys.readouterr().out
    assert out.count("img/s") == 1 and "micro   1" in out


def test_bench_rotation_smoke(monkeypatch, capsys):
    """Rotation microbench runs all three modes at tiny shapes and prints a
    ms/call line per mode (hermetic: CPU, in-process)."""
    import bench_rotation

    monkeypatch.setattr(sys, "argv", ["bench_rotation.py", "--batch", "2",
                                      "--height", "24", "--width", "24",
                                      "--reps", "2"])
    bench_rotation.main()
    out = capsys.readouterr().out
    for mode in ("per_batch_shear", "per_sample_shear", "per_sample"):
        assert mode in out and "ms/call" in out


@pytest.mark.slow
def test_bench_unetpp_smoke(monkeypatch, capsys):
    """UNet++ seg-train bench runs both models at tiny shapes and prints the
    JSON line with throughput per variant (hermetic: CPU, in-process)."""
    import bench_unetpp

    monkeypatch.setattr(sys, "argv", [
        "bench_unetpp.py", "--image_size", "32", "--batch", "2",
        "--base_features", "4", "--steps", "2", "--warmup", "0",
        "--deep_supervision"])  # warmup 0: clamped to 1, must not crash
    bench_unetpp.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert set(rec["results"]) == {"unetpp_b4", "unetpp_b4_ds", "seg_unet_b4"}
    for v in rec["results"].values():
        assert v["images_per_sec_per_chip"] > 0 and v["params"] > 0


def test_perf_tables_generate_and_apply(tmp_path, capsys):
    """tools/perf_tables.py: parses both bench formats, renders the table,
    and rewrites the marked doc block idempotently (VERDICT r3 #2)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import perf_tables

    bench = {
        "metric": "m", "value": 215.2,
        "infer_images_per_sec_per_chip": 333.1,
        "baseline_configs": {
            "1_unet_focal_256_b16": {"images_per_sec_per_chip": 331.5,
                                     "mfu": 0.476, "hfu": 0.478,
                                     "hbm_bw_fraction": 0.714},
            "5_sweep_per_category": "note",
            "gear_512_b8": {"images_per_sec_per_chip": 82.0, "mfu": 0.477},
        },
    }
    # Raw stdout form (with log noise) and the driver wrapper form.
    raw = tmp_path / "bench_raw.json"
    raw.write_text("WARNING: noise\n" + json.dumps(bench) + "\n")
    wrapped = tmp_path / "BENCH_r99.json"
    wrapped.write_text(json.dumps({"n": 99, "parsed": bench}))
    for p in (raw, wrapped):
        parsed = perf_tables.load_bench(str(p))
        assert parsed["value"] == 215.2

    table = perf_tables.render_baseline_table(bench, "bench_raw.json")
    assert "| 1. UNet + focal, 256² b16 | 331.5 | 0.476 | 0.478 | 0.714 |" in table
    assert "| 5. 15-category sweep | note |" in table
    assert "82.0" in table and "215.2" in table

    doc = tmp_path / "doc.md"
    doc.write_text("before\n" + perf_tables._BEGIN + "\nstale\n"
                   + perf_tables._END + "\nafter\n")
    assert perf_tables.apply_to_doc(str(doc), table) is True
    text = doc.read_text()
    assert "stale" not in text and "331.5" in text
    assert text.startswith("before\n") and text.endswith("after\n")
    # Idempotent: a second apply reports no change.
    assert perf_tables.apply_to_doc(str(doc), table) is False
    # Missing markers is a hard error, not a silent no-op.
    bare = tmp_path / "bare.md"
    bare.write_text("no markers")
    with pytest.raises(SystemExit, match="markers"):
        perf_tables.apply_to_doc(str(bare), table)


def test_perf_tables_repo_docs_current():
    """The committed docs' generated block matches the committed bench
    artifact — catches hand-edits and stale regeneration at test time."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import perf_tables

    repo = os.path.join(os.path.dirname(__file__), "..")
    bench_path = os.path.join(repo, "BENCH_LOCAL.json")
    doc_path = os.path.join(repo, "docs", "ARCHITECTURE.md")
    bench = perf_tables.load_bench(bench_path)
    table = perf_tables.render_baseline_table(bench, "BENCH_LOCAL.json")
    block = f"{perf_tables._BEGIN}\n{table}\n{perf_tables._END}"
    with open(doc_path) as f:
        assert block in f.read(), (
            "docs/ARCHITECTURE.md BASELINE table is stale; run "
            "python tools/perf_tables.py --bench BENCH_LOCAL.json --apply")


@pytest.mark.slow
def test_unetpp_mode_selection_smoke(tmp_path, capsys):
    """tools/unetpp_mode_selection.py --synthetic: the paper's mode-selection
    workflow (train DS once -> evaluate every pruned level) runs end-to-end
    and the compiled-FLOPs ladder strictly decreases with pruning."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import unetpp_mode_selection

    out = unetpp_mode_selection.main([
        "--synthetic", "--epochs", "1", "--serving_batches", "0",
        "--out", os.path.join(tmp_path, "r.json")])
    r = out["results"]
    assert set(r) == {"heads1", "heads2", "heads3", "heads4"}
    assert (r["heads1"]["fwd_gflops"] < r["heads2"]["fwd_gflops"]
            < r["heads3"]["fwd_gflops"] < r["heads4"]["fwd_gflops"])
    for row in r.values():
        assert 0.0 <= row["mean_iou"] <= 1.0
    assert os.path.exists(os.path.join(tmp_path, "r.json"))


def test_crossstack_parity_committed_artifacts():
    """Both committed cross-stack training-parity artifacts (anomaly r3,
    seg r4: tools/crossstack_parity{,_seg}.py run against the ACTUAL
    reference torch trainers) record that the two stacks learn the task
    and agree within the harness tolerances."""
    repo = os.path.join(os.path.dirname(__file__), "..")

    with open(os.path.join(repo, "tools", "crossstack_parity_result.json")) as f:
        anomaly = json.load(f)
    assert anomaly["reference_torch"]["image_auroc"] >= 0.9
    assert anomaly["tpu_unet"]["image_auroc"] >= 0.9
    assert anomaly["auroc_diff"] <= 0.05
    ref_hist = anomaly["reference_torch"]["loss_history"]
    our_hist = anomaly["tpu_unet"]["loss_history"]
    assert ref_hist[-1] < ref_hist[0] and our_hist[-1] < our_hist[0]

    with open(os.path.join(repo, "tools",
                           "crossstack_parity_seg_result.json")) as f:
        seg = json.load(f)
    chance = 0.25  # 4-class mIoU of a random predictor on the synthetic task
    assert seg["reference"]["val_miou"] > 2 * chance
    assert seg["tpu_unet"]["val_miou"] > 2 * chance
    assert seg["miou_diff"] < 0.15
    assert seg["reference"]["loss_history"][-1] < seg["reference"]["loss_history"][0]
    assert seg["tpu_unet"]["loss_history"][-1] < seg["tpu_unet"]["loss_history"][0]


def test_bench_tiled_committed_artifact():
    """The committed tiled-serving chip bench (tools/bench_tiled.py, r5):
    native-resolution throughput scales with batch, the int8 engine was
    measured, and the resize-path context rows are present so the Mpix/s
    comparison in ARCHITECTURE.md has numbers behind it."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "tools", "bench_tiled_result.json")) as f:
        r = json.load(f)
    assert r["tiles_per_image"] == 9  # 3x3 grid: 1024^2 / 512^2 tiles / 64 px
    cfg = r["configs"]
    for mode in ("bf16", "int8"):
        batches = sorted(int(k.rsplit("_b", 1)[1]) for k in cfg
                         if k.startswith(f"tiled_{mode}_b"))
        assert len(batches) >= 2
        rates = [cfg[f"tiled_{mode}_b{b}"]["native_images_per_sec"]
                 for b in batches]
        assert rates[-1] > rates[0]  # batching the tile grid must pay
        resized = [v for k, v in cfg.items() if k.startswith(f"resized_{mode}")]
        assert resized and resized[0]["resized_images_per_sec"] > 0
        # Native-res serving keeps >=half the resize path's pixel rate.
        assert (cfg[f"tiled_{mode}_b{batches[-1]}"]["mpix_per_sec"]
                >= 0.5 * resized[0]["mpix_per_sec"])


def test_accuracy_ab_committed_artifact():
    """The committed seg-family accuracy A/B (tools/accuracy_ab_seg.py,
    VERDICT r4 #2): every model trained with the identical budget learns the
    shape-discrimination task (mIoU >> chance), the baseline comparison field
    is present for each, and the documented conclusion (gates/nested grid win
    or honest negative) has numbers behind it."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "tools", "accuracy_ab_seg_result.json")) as f:
        ab = json.load(f)
    models = ab["models"]
    assert set(models) == {"seg_unet", "attn_unet", "unetpp", "unetpp_ds"}
    chance = 0.25
    for name, r in models.items():
        assert r["val_miou"] > 2 * chance, (name, r)
        assert 0.0 <= r["val_miou"] <= 1.0
        assert len(r["per_class_iou"]) == 4
        assert "vs_seg_unet" in r
    assert models["seg_unet"]["vs_seg_unet"] == 0.0

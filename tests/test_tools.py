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

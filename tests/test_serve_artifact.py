"""jax.export serving artifacts: roundtrip equality with the live engines,
meta contents, and rejection of mesh-sharded engines."""

import json
import os

import jax
import numpy as np
import pytest

from tpu_unet.models import AnomalyUNet, SegmentationUNet
from tpu_unet.serve import AnomalyScorer, SegmentationPredictor
from tpu_unet.serve_artifact import export_artifact, load_artifact
from tpu_unet.train import create_train_state, make_optimizer


def _variables(model, hw):
    state = create_train_state(model, jax.random.key(0), (1,) + hw + (3,),
                               make_optimizer("adam", 1e-3, 0.0))
    return state.params, state.batch_stats


def test_anomaly_artifact_roundtrip(tmp_path):
    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4)
    meta = export_artifact(scorer, str(tmp_path / "art"))
    assert meta["kind"] == "anomaly_scorer"
    art = load_artifact(str(tmp_path / "art"))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)  # ragged: pads
    ref = scorer.score_array(imgs)
    got = art.score_array(imgs)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    with open(tmp_path / "art" / "meta.json") as f:
        disk = json.load(f)
    assert disk["batch_size"] == 4 and disk["image_size_hw"] == [32, 32]
    assert os.path.getsize(tmp_path / "art" / "program.jaxexport") > 1000


@pytest.mark.slow
def test_seg_artifact_roundtrip_nonsquare(tmp_path):
    params, bstats = _variables(
        SegmentationUNet(n_classes=3, base_features=4, dropout=0.0), (32, 16))
    pred = SegmentationPredictor.from_variables(
        params, bstats, num_classes=3, image_size_hw=(32, 16), batch_size=2,
        base_features=4, dropout=0.0)
    export_artifact(pred, str(tmp_path / "art"))
    art = load_artifact(str(tmp_path / "art"))
    assert art.num_classes == 3  # carried through meta.json
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, 32, 16, 3), dtype=np.uint8)
    masks_ref, confs_ref = pred.predict_array(imgs)
    masks, confs = art.predict_array(imgs)
    np.testing.assert_array_equal(masks, masks_ref)
    np.testing.assert_allclose(confs, confs_ref, atol=1e-6)


def test_int8_anomaly_artifact_roundtrip(tmp_path):
    """The quantized program (qparams baked in) exports like the float one."""
    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          quantize="int8", calib_images=calib)
    meta = export_artifact(scorer, str(tmp_path / "art"))
    assert meta["quantize"] == "int8"
    art = load_artifact(str(tmp_path / "art"))
    assert art.quantize == "int8"
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    np.testing.assert_allclose(art.score_array(imgs), scorer.score_array(imgs),
                               atol=1e-6)


def test_mesh_engine_rejected(tmp_path, devices):
    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          n_devices=2)
    with pytest.raises(ValueError, match="per-chip"):
        export_artifact(scorer, str(tmp_path / "art"))


def test_load_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="meta.json"):
        load_artifact(str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "meta.json").write_text(json.dumps({"format_version": 99}))
    with pytest.raises(ValueError, match="format_version"):
        load_artifact(str(bad))
    # meta.json present but the program file missing: curated error, not a
    # bare open() traceback.
    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "meta.json").write_text(json.dumps({"format_version": 1,
                                                   "kind": "anomaly_scorer"}))
    with pytest.raises(FileNotFoundError, match="program.jaxexport"):
        load_artifact(str(partial))


@pytest.mark.slow
def test_unetpp_pruned_artifact_roundtrip(tmp_path):
    """A heads=2 (pruned fast mode) UNet++ deep-supervision engine exports
    and reloads serving the SAME pruned program — the artifact captures the
    DCE'd compiled forward, checkpoint-/model-code-free."""
    from tpu_unet.models.unetpp import UNetPlusPlus

    params, bstats = _variables(
        UNetPlusPlus(n_classes=4, base_features=4, deep_supervision=True),
        (32, 32))
    pred = SegmentationPredictor.from_variables(
        params, bstats, num_classes=4, image_size_hw=(32, 32), batch_size=2,
        base_features=4, model_name="unetpp", deep_supervision=True, heads=2)
    export_artifact(pred, str(tmp_path / "art"))
    art = load_artifact(str(tmp_path / "art"))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    masks_ref, confs_ref = pred.predict_array(imgs)
    masks, confs = art.predict_array(imgs)
    np.testing.assert_array_equal(masks, masks_ref)
    np.testing.assert_allclose(confs, confs_ref, atol=1e-6)
    # And the pruned program differs from the accurate mode's output.
    pred4 = SegmentationPredictor.from_variables(
        params, bstats, num_classes=4, image_size_hw=(32, 32), batch_size=2,
        base_features=4, model_name="unetpp", deep_supervision=True)
    masks4, _ = pred4.predict_array(imgs)
    assert not np.array_equal(masks4, masks)

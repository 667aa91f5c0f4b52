"""Serving engine (tpu_unet/serve.py) + serve CLI + quantized test-CLI path.

Trains one tiny AnomalyUNet checkpoint on the synthetic MVTec fixture, then
drives the deployment surfaces against it: AnomalyScorer (bf16 + int8),
score_paths decode pipelining/padding, the serve CLI artifact, and the test
CLI's --quantize int8 mode.
"""

import json
import os

import numpy as np
import pytest

from tests.test_data import make_mvtec


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """(mvtec_root, checkpoint_dir) for a 2-epoch tiny training run."""
    root = make_mvtec(str(tmp_path_factory.mktemp("mvtec")), n_train=8,
                      n_test_good=3, n_broken=3, size=32)
    from tpu_unet.cli.train_mvtec import main as train_main
    save_dir = str(tmp_path_factory.mktemp("outputs"))
    exp_dir = train_main([
        "--data_root", root, "--category", "bottle",
        "--image_size", "32", "--epochs", "2", "--batch_size", "4",
        "--val_freq", "1", "--save_freq", "1", "--num_workers", "2",
        "--save_dir", save_dir, "--base_features", "4", "--precision", "f32",
        "--n_devices", "2",
    ])
    return root, os.path.join(exp_dir, "checkpoints", "best_model")


def test_scorer_matches_eval_step(trained):
    import jax

    from tpu_unet.serve import AnomalyScorer
    from tpu_unet.train import make_anomaly_eval_step
    from tpu_unet.train.checkpoint import load_params
    from tpu_unet.train.optim import make_optimizer
    from tpu_unet.train.state import create_train_state
    from tpu_unet.core.precision import get_policy
    from tpu_unet.models import build_model

    root, ckpt = trained
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)

    scorer = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                           precision="f32", base_features=4)
    scores = scorer.score_array(images)  # 5 images, batch 4 -> padded final batch
    assert scores.shape == (5,) and np.isfinite(scores).all()

    model = build_model("anomaly_unet", policy=get_policy("f32"), base_features=4)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    state = load_params(state, ckpt)
    step = make_anomaly_eval_step()
    ref = np.asarray(step(state, images,
                          np.zeros((5, 32, 32, 1), np.float32))["score"])
    # BN folding is the only numeric difference on the score path.
    np.testing.assert_allclose(scores, ref, rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_scorer_int8_tracks_float(trained):
    from tpu_unet.serve import AnomalyScorer

    root, ckpt = trained
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    images = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)

    f = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                      precision="f32", base_features=4)
    q = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                      quantize="int8", calib_images=calib,
                                      base_features=4)
    sf, sq = f.score_array(images), q.score_array(images)
    assert np.isfinite(sq).all()
    # int8 scores track the float scores in relative terms.
    rel = np.abs(sq - sf) / (np.abs(sf) + 1e-9)
    assert float(np.median(rel)) < 0.3, (sf, sq)

    with pytest.raises(ValueError, match="calib_images"):
        AnomalyScorer.from_checkpoint(ckpt, image_size=32, quantize="int8",
                                      base_features=4)


@pytest.mark.slow
def test_scorer_multichip_matches_single(trained):
    """DP serving: batches sharded over a 4-device 'data' mesh reproduce the
    single-device scores (bf16 and int8)."""
    from tpu_unet.serve import AnomalyScorer

    root, ckpt = trained
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)

    for kw in ({"precision": "f32"}, {"quantize": "int8", "calib_images": calib}):
        one = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                            base_features=4, **kw)
        multi = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                              base_features=4, n_devices=4, **kw)
        np.testing.assert_allclose(multi.score_array(images),
                                   one.score_array(images), rtol=2e-5, atol=1e-8)

    with pytest.raises(ValueError, match="divisible"):
        AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=6,
                                      base_features=4, n_devices=4)


def test_score_paths_and_empty(trained, tmp_path):
    from PIL import Image

    from tpu_unet.serve import AnomalyScorer

    root, ckpt = trained
    scorer = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                           precision="f32", base_features=4)
    rng = np.random.default_rng(2)
    paths = []
    for i in range(7):  # not a multiple of the batch -> padding + pipelining
        p = os.path.join(tmp_path, f"img_{i}.png")
        Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    scores = scorer.score_paths(paths, num_workers=2)
    assert scores.shape == (7,) and np.isfinite(scores).all()

    # path scores equal array scores for the same pixels
    from tpu_unet.data.transforms import load_image_rgb
    arr = np.stack([load_image_rgb(p, (32, 32)) for p in paths])
    np.testing.assert_allclose(scores, scorer.score_array(arr), rtol=1e-5)

    assert scorer.score_array(np.zeros((0, 32, 32, 3), np.uint8)).shape == (0,)


def test_score_paths_decode_failure_policy(trained, tmp_path):
    """A corrupt file raises a NAMED DecodeError (not a raw pool traceback);
    on_decode_error='skip' logs it and emits NaN for that file only."""
    from PIL import Image

    from tpu_unet.serve import AnomalyScorer, DecodeError

    root, ckpt = trained
    scorer = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=4,
                                           precision="f32", base_features=4)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        p = os.path.join(tmp_path, f"ok_{i}.png")
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    bad = os.path.join(tmp_path, "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    paths.insert(2, bad)

    with pytest.raises(DecodeError) as exc:
        scorer.score_paths(paths, num_workers=2)
    assert "corrupt.png" in str(exc.value) and exc.value.path == bad

    logged = []
    from tpu_unet import serve as serve_mod
    scores, failed = serve_mod._pipelined_batches(
        paths, (32, 32), 4, 2,
        lambda imgs: scorer._score_fn(scorer._params, scorer._put(imgs)),
        on_decode_error="skip", log_fn=logged.append)
    assert failed == [2] and any("corrupt.png" in m for m in logged)

    scores = scorer.score_paths(paths, num_workers=2, on_decode_error="skip")
    assert scores.shape == (7,)
    assert np.isnan(scores[2]) and np.isfinite(np.delete(scores, 2)).all()

    # return_failed exposes the authoritative decode-skip indices (distinct
    # from any NaN the model itself might produce).
    scores2, failed2 = scorer.score_paths(paths, num_workers=2,
                                          on_decode_error="skip",
                                          return_failed=True)
    assert failed2 == [2]
    np.testing.assert_array_equal(np.isnan(scores2), np.isnan(scores))


def test_serve_cli(trained, tmp_path):
    from tpu_unet.cli.serve_mvtec import main as serve_main

    root, ckpt = trained
    test_dir = os.path.join(root, "bottle", "test")
    out = os.path.join(tmp_path, "scores.json")
    payload = serve_main([
        "--checkpoint", ckpt, "--input_dir", test_dir, "--image_size", "32",
        "--batch_size", "4", "--precision", "f32", "--base_features", "4",
        "--threshold", "0.0", "--output", out,
    ])
    assert payload is not None
    with open(out) as f:
        saved = json.load(f)
    assert len(saved["scores"]) == 6  # 3 good + 3 broken
    assert len(saved["verdicts"]) == 6
    assert saved["throughput_img_per_sec"] > 0

    # int8 mode with calibration from the train split
    out_q = os.path.join(tmp_path, "scores_q.json")
    payload_q = serve_main([
        "--checkpoint", ckpt, "--input_dir", test_dir, "--image_size", "32",
        "--batch_size", "4", "--base_features", "4",
        "--quantize", "int8", "--calib_dir",
        os.path.join(root, "bottle", "train", "good"),
        "--output", out_q,
    ])
    assert payload_q is not None and len(payload_q["scores"]) == 6
    assert all(np.isfinite(list(payload_q["scores"].values())))


def test_serve_cli_heatmap_dir(trained, tmp_path):
    from PIL import Image

    from tpu_unet.cli.serve_mvtec import main as serve_main

    root, ckpt = trained
    test_dir = os.path.join(root, "bottle", "test")
    out = os.path.join(tmp_path, "scores.json")
    hm_dir = os.path.join(tmp_path, "heatmaps")
    payload = serve_main([
        "--checkpoint", ckpt, "--input_dir", test_dir, "--image_size", "32",
        "--batch_size", "4", "--precision", "f32", "--base_features", "4",
        "--heatmap_dir", hm_dir, "--output", out,
    ])
    assert payload["heatmap_dir"] == hm_dir
    assert len(payload["scores"]) == 6
    pngs = sorted(os.listdir(hm_dir))
    assert len(pngs) == 6 and all(p.endswith("_heatmap.png") for p in pngs)
    arr = np.asarray(Image.open(os.path.join(hm_dir, pngs[0])))
    assert arr.shape == (32, 32) and arr.dtype == np.uint8


def test_latency_ms(trained, trained_seg):
    """Batch-1 online-serving latency: both engines return p50/p95/mean ms."""
    from tpu_unet.serve import AnomalyScorer, SegmentationPredictor

    _, ckpt = trained
    scorer = AnomalyScorer.from_checkpoint(ckpt, image_size=32, batch_size=1,
                                           precision="f32", base_features=4)
    lat = scorer.latency_ms(n_iters=5)
    assert set(lat) == {"p50_ms", "p95_ms", "mean_ms"}
    assert 0 < lat["p50_ms"] <= lat["p95_ms"]

    _, seg_ckpt = trained_seg
    pred = SegmentationPredictor.from_checkpoint(
        seg_ckpt, num_classes=4, image_size_hw=(32, 32), batch_size=1,
        precision="f32", base_features=4)
    lat = pred.latency_ms(n_iters=5)
    assert 0 < lat["p50_ms"] <= lat["p95_ms"]


def test_serve_cli_artifact_roundtrip(trained, tmp_path):
    """--export_artifact then --artifact: identical scores without touching the
    checkpoint (or any model code) at load time."""
    from tpu_unet.cli.serve_mvtec import main as serve_main

    root, ckpt = trained
    test_dir = os.path.join(root, "bottle", "test")
    art = os.path.join(tmp_path, "artifact")
    p1 = serve_main([
        "--checkpoint", ckpt, "--input_dir", test_dir, "--image_size", "32",
        "--batch_size", "4", "--precision", "f32", "--base_features", "4",
        "--export_artifact", art,
        "--output", os.path.join(tmp_path, "scores_ckpt.json"),
    ])
    p2 = serve_main([
        "--artifact", art, "--input_dir", test_dir,
        "--n_devices", "1",  # 1 = unsharded, accepted like the checkpoint path
        "--output", os.path.join(tmp_path, "scores_art.json"),
    ])
    assert set(p2["scores"]) == set(p1["scores"])
    for k, v in p1["scores"].items():
        assert abs(p2["scores"][k] - v) < 1e-6
    assert p2["checkpoint"] == art

    # Flag misuse is rejected up front.
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art, "--checkpoint", ckpt,
                    "--input_dir", test_dir])
    with pytest.raises(SystemExit):
        serve_main(["--input_dir", test_dir])
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art, "--input_dir", test_dir,
                    "--n_devices", "2"])
    # ... including export+sharded, BEFORE the engine is built (artifacts are
    # per-chip programs; previously this crashed after the full scoring setup).
    with pytest.raises(SystemExit):
        serve_main(["--checkpoint", ckpt, "--input_dir", test_dir,
                    "--n_devices", "2", "--export_artifact",
                    os.path.join(tmp_path, "nope")])


def test_serve_cli_skip_decode_error_json(trained, tmp_path):
    """--on_decode_error skip: the corrupt file gets a JSON null score and a
    null verdict (NOT 'not anomalous'), is listed in decode_failures, and the
    written JSON contains no bare NaN token (strict parsers reject those)."""
    from PIL import Image

    from tpu_unet.cli.serve_mvtec import main as serve_main

    root, ckpt = trained
    rng = np.random.default_rng(11)
    img_dir = os.path.join(tmp_path, "imgs")
    os.makedirs(img_dir)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, f"ok_{i}.png"))
    with open(os.path.join(img_dir, "corrupt.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")

    out = os.path.join(tmp_path, "scores.json")
    payload = serve_main([
        "--checkpoint", ckpt, "--input_dir", img_dir, "--image_size", "32",
        "--batch_size", "4", "--precision", "f32", "--base_features", "4",
        "--threshold", "0.0", "--on_decode_error", "skip", "--output", out,
    ])
    assert payload["scores"]["corrupt.png"] is None
    assert payload["verdicts"]["corrupt.png"] is None
    assert payload["decode_failures"] == ["corrupt.png"]
    assert all(v is not None for k, v in payload["scores"].items() if k != "corrupt.png")

    with open(out) as f:
        text = f.read()
    assert "NaN" not in text  # bare NaN is not valid JSON
    import json as _json
    saved = _json.loads(text)  # strict parse
    assert saved["scores"]["corrupt.png"] is None


@pytest.mark.slow
def test_seg_cli_quantized(tmp_path):
    """Gear train -> test CLI with --quantize int8 (the seg quantized path)."""
    from tests.test_data import make_gear
    from tpu_unet.cli.train_gear import main as train_main
    from tpu_unet.cli.test_gear import main as test_main

    root = make_gear(os.path.join(tmp_path, "gear"), n_per_split=4, size=32)
    exp_dir = train_main([
        "--data_root", root, "--image_size", "32", "--epochs", "1",
        "--batch_size", "4", "--val_freq", "1", "--save_freq", "1",
        "--num_workers", "2", "--save_dir", os.path.join(tmp_path, "out"),
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    best = os.path.join(exp_dir, "checkpoints", "best_model")
    out_dir = os.path.join(tmp_path, "eval_q")
    summary = test_main([
        "--data_root", root, "--image_size", "32", "--batch_size", "4",
        "--num_workers", "2", "--checkpoint", best, "--output_dir", out_dir,
        "--base_features", "4", "--n_devices", "2",
        "--quantize", "int8", "--calib_samples", "4",
    ])
    assert summary is not None
    assert 0.0 <= summary["overall_metrics"]["pixel_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(out_dir, "evaluation_results.json"))


@pytest.fixture(scope="module")
def trained_seg(tmp_path_factory):
    """(gear_root, checkpoint) from a 1-epoch tiny Gear training run."""
    from tests.test_data import make_gear
    from tpu_unet.cli.train_gear import main as train_main

    root = make_gear(str(tmp_path_factory.mktemp("gear")), n_per_split=4, size=32)
    exp_dir = train_main([
        "--data_root", root, "--image_size", "32", "--epochs", "1",
        "--batch_size", "4", "--val_freq", "1", "--save_freq", "1",
        "--num_workers", "2", "--save_dir", str(tmp_path_factory.mktemp("out")),
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    return root, os.path.join(exp_dir, "checkpoints", "best_model")


def test_serve_seg_cli_artifact_roundtrip(trained_seg, tmp_path, capsys):
    from tpu_unet.cli.serve_seg import main as serve_main

    root, ckpt = trained_seg
    img_dir = os.path.join(root, "images", "test")
    art = os.path.join(tmp_path, "artifact")
    p1 = serve_main([
        "--checkpoint", ckpt, "--input_dir", img_dir, "--num_classes", "4",
        "--image_height", "32", "--image_width", "32", "--batch_size", "2",
        "--precision", "f32", "--base_features", "4",
        "--export_artifact", art,
        "--output_dir", os.path.join(tmp_path, "out_ckpt"),
    ])
    # A contradicting --num_classes is ignored WITH a warning: meta.json wins
    # (passing 3 here also makes the ==4 check distinguish meta from the CLI
    # default, which is 4).
    p2 = serve_main([
        "--artifact", art, "--input_dir", img_dir, "--num_classes", "3",
        "--output_dir", os.path.join(tmp_path, "out_art"),
    ])
    assert "--num_classes" in capsys.readouterr().err
    assert p2["num_classes"] == 4  # from artifact meta, not the CLI flag
    assert set(p2["predictions"]) == set(p1["predictions"])
    for k, rec in p1["predictions"].items():
        assert p2["predictions"][k]["class_pixel_share"] == rec["class_pixel_share"]
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art, "--input_dir", img_dir,
                    "--n_space", "2"])


def test_export_serving_tool(trained_seg, tmp_path):
    """tools/export_serving.py: int8 with a missing --qparams .npz calibrates
    (serve-CLI semantics, not a FileNotFoundError), SAVES the scales, and
    writes a loadable artifact."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_serving

    root, ckpt = trained_seg
    art = os.path.join(tmp_path, "artifact")
    qp = os.path.join(tmp_path, "scales.npz")
    meta = export_serving.main([
        "--engine", "seg", "--checkpoint", ckpt, "--out", art,
        "--num_classes", "4", "--image_height", "32", "--image_width", "32",
        "--batch_size", "2", "--base_features", "4", "--precision", "f32",
        "--quantize", "int8",
        "--calib_dir", os.path.join(root, "images", "train"),
        "--calib_samples", "4", "--qparams", qp,
    ])
    assert meta["kind"] == "segmentation_predictor"
    assert meta["quantize"] == "int8"
    assert os.path.exists(qp)  # calibrated scales persisted for reuse

    from tpu_unet.serve_artifact import load_artifact
    eng = load_artifact(art)
    assert eng.quantize == "int8" and eng.num_classes == 4
    rng = np.random.default_rng(7)
    masks, confs = eng.predict_array(
        rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8))
    assert masks.shape == (3, 32, 32) and masks.max() < 4


def test_seg_predictor_modes_agree(trained_seg):
    """Float/int8/DP/spatial predictors produce consistent masks."""
    from tpu_unet.serve import SegmentationPredictor

    root, ckpt = trained_seg
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    kw = dict(num_classes=4, image_size_hw=(32, 32), batch_size=4,
              base_features=4)

    base = SegmentationPredictor.from_checkpoint(ckpt, precision="f32", **kw)
    masks, confs = base.predict_array(images)
    assert masks.shape == (6, 32, 32) and masks.dtype == np.uint8
    assert masks.max() < 4 and np.all((confs > 0) & (confs <= 1))

    # DP x spatial mesh reproduces single-device masks exactly (f32).
    sharded = SegmentationPredictor.from_checkpoint(
        ckpt, precision="f32", n_devices=2, n_space=2, **kw)
    m2, c2 = sharded.predict_array(images)
    np.testing.assert_array_equal(m2, masks)
    np.testing.assert_allclose(c2, confs, rtol=2e-5)

    # int8 stays close: large majority of pixels agree with the float argmax.
    q = SegmentationPredictor.from_checkpoint(ckpt, quantize="int8",
                                              calib_images=calib, **kw)
    mq, cq = q.predict_array(images)
    assert (mq == masks).mean() > 0.9, (mq == masks).mean()

    # int8 under a DP x spatial mesh matches single-device int8 exactly
    # (integer conv accumulation is associativity-safe).
    q_sharded = SegmentationPredictor.from_checkpoint(
        ckpt, quantize="int8", calib_images=calib, n_devices=2, n_space=2, **kw)
    mq2, _ = q_sharded.predict_array(images)
    np.testing.assert_array_equal(mq2, mq)
    assert q_sharded.throughput(n_batches=2) > 0


def test_serve_seg_cli(trained_seg, tmp_path):
    from tpu_unet.cli.serve_seg import main as serve_main

    root, ckpt = trained_seg
    out_dir = os.path.join(tmp_path, "masks")
    payload = serve_main([
        "--checkpoint", ckpt, "--input_dir", os.path.join(root, "images", "test"),
        "--num_classes", "4", "--image_height", "32", "--image_width", "32",
        "--batch_size", "4", "--precision", "f32", "--base_features", "4",
        "--output_dir", out_dir,
    ])
    assert payload is not None and len(payload["predictions"]) == 4
    masks = [f for f in os.listdir(out_dir) if f.endswith("_mask.png")]
    assert len(masks) == 4
    assert os.path.exists(os.path.join(out_dir, "predictions.json"))
    rec = next(iter(payload["predictions"].values()))
    assert abs(sum(rec["class_pixel_share"]) - 1.0) < 1e-3


def test_serve_cli_qparams_cache(trained, tmp_path):
    """--qparams: first run calibrates and writes the .npz; second run loads it
    (no calib_dir needed) and produces identical scores."""
    from tpu_unet.cli.serve_mvtec import main as serve_main

    root, ckpt = trained
    test_dir = os.path.join(root, "bottle", "test")
    qp = os.path.join(tmp_path, "q.npz")
    common = ["--checkpoint", ckpt, "--input_dir", test_dir,
              "--image_size", "32", "--batch_size", "4", "--base_features", "4",
              "--quantize", "int8", "--qparams", qp]
    first = serve_main(common + [
        "--calib_dir", os.path.join(root, "bottle", "train", "good"),
        "--calib_percentile", "99.9",
        "--output", os.path.join(tmp_path, "a.json"),
    ])
    assert os.path.exists(qp)
    second = serve_main(common + ["--output", os.path.join(tmp_path, "b.json")])
    assert first["scores"].keys() == second["scores"].keys()
    for k in first["scores"]:
        assert abs(first["scores"][k] - second["scores"][k]) < 1e-7


@pytest.mark.slow
def test_ksdd_cli_quantized(tmp_path):
    """KolektorSDD train -> test CLI with --quantize int8 (elongated shapes)."""
    from tests.test_data import make_kolektorsdd
    from tpu_unet.cli.train_kolektorsdd import main as train_main
    from tpu_unet.cli.test_kolektorsdd import main as test_main

    root = make_kolektorsdd(os.path.join(tmp_path, "ksdd"), n_folders=4,
                            per_folder=3, h=64, w=32)
    exp_dir = train_main([
        "--data_root", root, "--image_height", "64", "--image_width", "32",
        "--epochs", "1", "--batch_size", "4", "--val_freq", "1",
        "--save_freq", "1", "--num_workers", "2",
        "--save_dir", os.path.join(tmp_path, "out"),
        "--base_features", "4", "--precision", "f32", "--n_devices", "2",
    ])
    best = os.path.join(exp_dir, "checkpoints", "best_model")
    out_dir = os.path.join(tmp_path, "eval_q")
    summary = test_main([
        "--data_root", root, "--image_height", "64", "--image_width", "32",
        "--batch_size", "4", "--num_workers", "2", "--checkpoint", best,
        "--output_dir", out_dir, "--base_features", "4", "--n_devices", "2",
        "--quantize", "int8", "--calib_samples", "4",
    ])
    assert summary is not None
    assert 0.0 <= summary["overall_metrics"]["pixel_accuracy"] <= 1.0


@pytest.mark.slow
def test_test_cli_quantized(trained, tmp_path):
    from tpu_unet.cli.test_mvtec import main as test_main

    root, ckpt = trained
    out_dir = os.path.join(tmp_path, "test_results")
    evaluation = test_main([
        "--data_root", root, "--category", "bottle",
        "--image_size", "32", "--batch_size", "4", "--num_workers", "2",
        "--checkpoint", ckpt, "--output_dir", out_dir, "--n_devices", "2",
        "--base_features", "4", "--quantize", "int8", "--calib_samples", "8",
    ])
    assert evaluation is not None
    assert "auroc" in evaluation["image_metrics"]
    assert os.path.exists(os.path.join(out_dir, "bottle_test_results",
                                       "test_metrics.json"))


@pytest.mark.slow
def test_serve_seg_cli_tiled(trained_seg, tmp_path):
    """--tile_height/--tile_width: native-resolution serving through the CLI —
    inputs load at the full 48x64 extent, the 32^2-trained model runs on the
    static overlapping tile grid, and masks come back at full resolution."""
    from tpu_unet.cli.serve_seg import main as serve_main

    root, ckpt = trained_seg
    out_dir = os.path.join(tmp_path, "tiled_masks")
    payload = serve_main([
        "--checkpoint", ckpt, "--input_dir", os.path.join(root, "images", "test"),
        "--num_classes", "4", "--image_height", "48", "--image_width", "64",
        "--tile_height", "32", "--tile_width", "32", "--tile_overlap", "16",
        "--batch_size", "2", "--precision", "f32", "--base_features", "4",
        "--output_dir", out_dir,
    ])
    assert payload is not None and payload["image_size_hw"] == [48, 64]
    from PIL import Image
    masks = [f for f in os.listdir(out_dir) if f.endswith("_mask.png")]
    assert len(masks) == 4
    m = np.asarray(Image.open(os.path.join(out_dir, masks[0])))
    assert m.shape == (48, 64) and m.max() < 4
    # Mismatched tile flags fail fast.
    with pytest.raises(SystemExit):
        serve_main(["--checkpoint", ckpt, "--input_dir", root,
                    "--tile_height", "32"])


@pytest.mark.slow
def test_serve_seg_cli_tiled_int8_envelope(trained_seg, tmp_path):
    """int8 PTQ composes with tiling: calibration runs at the TILE shape and
    the quantized tile forward blends identically to the float one up to the
    standard envelope (argmax agreement on the full-resolution masks)."""
    from tpu_unet.cli.serve_seg import main as serve_main

    root, ckpt = trained_seg
    img_dir = os.path.join(root, "images", "test")
    common = [
        "--checkpoint", ckpt, "--input_dir", img_dir, "--num_classes", "4",
        "--image_height", "48", "--image_width", "64",
        "--tile_height", "32", "--tile_width", "32", "--tile_overlap", "16",
        "--batch_size", "2", "--precision", "f32", "--base_features", "4",
    ]
    p_f = serve_main(common + ["--output_dir", os.path.join(tmp_path, "f32")])
    p_q = serve_main(common + [
        "--quantize", "int8", "--calib_dir", img_dir, "--calib_samples", "4",
        "--output_dir", os.path.join(tmp_path, "int8"),
    ])
    assert p_q["quantize"] == "int8"
    from PIL import Image
    agree = []
    for rel, rec in p_f["predictions"].items():
        mf = np.asarray(Image.open(os.path.join(tmp_path, "f32", rec["mask"])))
        mq = np.asarray(Image.open(os.path.join(tmp_path, "int8",
                                                p_q["predictions"][rel]["mask"])))
        agree.append((mf == mq).mean())
    assert float(np.mean(agree)) >= 0.9  # standard int8 envelope bound


@pytest.mark.slow
def test_serve_seg_cli_tiled_artifact_roundtrip(trained_seg, tmp_path):
    """A tiled engine exports/reloads as an AOT artifact: the tile grid and
    blend are baked into the compiled program, so the artifact needs no tile
    flags (or model code) at reload and reproduces the checkpoint masks."""
    from tpu_unet.cli.serve_seg import main as serve_main

    root, ckpt = trained_seg
    img_dir = os.path.join(root, "images", "test")
    art = os.path.join(tmp_path, "tiled_artifact")
    p1 = serve_main([
        "--checkpoint", ckpt, "--input_dir", img_dir, "--num_classes", "4",
        "--image_height", "48", "--image_width", "64",
        "--tile_height", "32", "--tile_width", "32", "--tile_overlap", "16",
        "--batch_size", "2", "--precision", "f32", "--base_features", "4",
        "--export_artifact", art,
        "--output_dir", os.path.join(tmp_path, "out_ckpt"),
    ])
    p2 = serve_main([
        "--artifact", art, "--input_dir", img_dir,
        "--output_dir", os.path.join(tmp_path, "out_art"),
    ])
    assert p2["image_size_hw"] == [48, 64]
    for k, rec in p1["predictions"].items():
        assert p2["predictions"][k]["class_pixel_share"] == rec["class_pixel_share"]

"""Anomaly heatmap serving: engine second program, artifact embedding, daemon
endpoint.

The heatmap is the model's predicted anomaly map (the seg-decoder sigmoid the
eval path exposes as outputs['anomaly_map']) as (H,W) uint8 0..255; the score
rides the same program. Oracle: make_anomaly_eval_step on the same variables.
"""

import base64
import io
import json
import os
import threading

import jax
import numpy as np
import pytest

from tpu_unet.models import AnomalyUNet
from tpu_unet.serve import AnomalyScorer
from tpu_unet.serve_artifact import export_artifact, load_artifact
from tpu_unet.serve_http import ServingService, make_server
from tpu_unet.train import create_train_state, make_anomaly_eval_step, make_optimizer


@pytest.fixture(scope="module")
def variables():
    state = create_train_state(AnomalyUNet(base_features=4), jax.random.key(0),
                               (1, 32, 32, 3), make_optimizer("adam", 1e-3, 0.0))
    return state.params, state.batch_stats, state


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)


@pytest.mark.slow
def test_heatmap_matches_eval_step(variables):
    params, bstats, state = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          precision="f32", with_heatmap=True)
    assert scorer.has_heatmap
    imgs = _images(5)  # ragged: exercises the padded final batch
    scores, maps = scorer.heatmap_array(imgs)
    assert scores.shape == (5,) and maps.shape == (5, 32, 32)
    assert maps.dtype == np.uint8

    step = make_anomaly_eval_step()
    out = step(state, imgs, np.zeros((5, 32, 32, 1), np.float32))
    ref_maps = np.round(np.clip(np.asarray(out["anomaly_map"], np.float32),
                                0, 1) * 255).astype(np.int32)
    # BN folding + fusion-order drift can flip a value sitting exactly on a
    # rounding boundary by one level, never more.
    assert np.abs(maps.astype(np.int32) - ref_maps).max() <= 1
    np.testing.assert_allclose(scores, np.asarray(out["score"]),
                               rtol=2e-3, atol=1e-6)
    # The score-only path agrees with the heatmap program's score output.
    np.testing.assert_allclose(scorer.score_array(imgs), scores,
                               rtol=1e-5, atol=1e-7)


def test_heatmap_requires_flag(variables):
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4)
    assert not scorer.has_heatmap
    with pytest.raises(RuntimeError, match="with_heatmap"):
        scorer.heatmap_array(_images(2))
    with pytest.raises(RuntimeError, match="with_heatmap"):
        scorer.heatmap_paths(["x.png"])


def test_heatmap_paths_skip_policy(variables, tmp_path):
    from PIL import Image
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          precision="f32", with_heatmap=True)
    paths = []
    for i, img in enumerate(_images(3, seed=2)):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    paths.insert(1, bad)

    scores, maps, failed = scorer.heatmap_paths(
        paths, on_decode_error="skip", return_failed=True)
    assert failed == [1]
    assert np.isnan(scores[1]) and (maps[1] == 0).all()
    assert np.isfinite(scores[[0, 2, 3]]).all()
    ref_scores, ref_maps = scorer.heatmap_array(_images(3, seed=2))
    np.testing.assert_array_equal(maps[[0, 2, 3]], ref_maps)
    np.testing.assert_allclose(scores[[0, 2, 3]], ref_scores, atol=1e-6)


@pytest.mark.slow
def test_int8_heatmap_smoke(variables):
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(
        params, bstats, image_size=32, batch_size=4, base_features=4,
        quantize="int8", calib_images=_images(8, seed=3), with_heatmap=True)
    scores, maps = scorer.heatmap_array(_images(4, seed=4))
    assert maps.shape == (4, 32, 32) and maps.dtype == np.uint8
    assert np.isfinite(scores).all()
    np.testing.assert_allclose(scorer.score_array(_images(4, seed=4)), scores,
                               rtol=1e-5, atol=1e-6)


def test_artifact_embeds_heatmap_program(variables, tmp_path):
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          precision="f32", with_heatmap=True)
    meta = export_artifact(scorer, str(tmp_path / "art"))
    assert meta["with_heatmap"] is True
    assert os.path.getsize(tmp_path / "art" / "heatmap.jaxexport") > 1000

    art = load_artifact(str(tmp_path / "art"))
    assert art.has_heatmap
    imgs = _images(5, seed=5)
    ref_scores, ref_maps = scorer.heatmap_array(imgs)
    scores, maps = art.heatmap_array(imgs)
    np.testing.assert_array_equal(maps, ref_maps)
    np.testing.assert_allclose(scores, ref_scores, atol=1e-6)

    # meta says with_heatmap but the program file is gone -> named error
    os.remove(tmp_path / "art" / "heatmap.jaxexport")
    with pytest.raises(FileNotFoundError, match="heatmap.jaxexport"):
        load_artifact(str(tmp_path / "art"))


def test_artifact_without_heatmap_stays_score_only(variables, tmp_path):
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4)
    meta = export_artifact(scorer, str(tmp_path / "art"))
    assert "with_heatmap" not in meta
    art = load_artifact(str(tmp_path / "art"))
    assert not art.has_heatmap
    with pytest.raises(RuntimeError, match="with_heatmap"):
        art.heatmap_array(_images(1))


def _png_bytes(arr_u8):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def test_daemon_heatmap_endpoint(variables):
    import http.client
    from PIL import Image

    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4,
                                          precision="f32", with_heatmap=True)
    svc = ServingService(scorer, max_wait_ms=0, threshold=0.5)
    svc.warmup()
    server = make_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def request(method, path, body=None):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            try:
                conn.request(method, path, body=body)
                resp = conn.getresponse()
                return resp.status, json.loads(resp.read().decode())
            finally:
                conn.close()

        img = _images(1, seed=6)[0]
        status, resp = request("POST", "/v1/heatmap", _png_bytes(img))
        assert status == 200
        ref_scores, ref_maps = scorer.heatmap_array(img[None])
        assert resp["score"] == pytest.approx(float(ref_scores[0]), abs=1e-6)
        assert "anomalous" in resp and resp["threshold"] == 0.5
        png = base64.b64decode(resp["heatmap_png_base64"])
        decoded = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(decoded, ref_maps[0])

        # /v1/score still served by the fast program.
        status, resp = request("POST", "/v1/score", _png_bytes(img))
        assert status == 200
        assert resp["score"] == pytest.approx(float(ref_scores[0]), rel=1e-5)

        status, meta = request("GET", "/healthz")
        assert meta["heatmap"] is True
        assert meta["heatmap_requests_served"] >= 1
        assert meta["heatmap_engine_batches"] >= 1
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_daemon_heatmap_404_without_program(variables):
    params, bstats, _ = variables
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4)
    svc = ServingService(scorer, max_wait_ms=0)
    try:
        assert svc.meta()["heatmap"] is False
        with pytest.raises(ValueError, match="--heatmap"):
            svc.handle("/v1/heatmap", _png_bytes(_images(1)[0]))
    finally:
        svc.close()

"""Online HTTP serving daemon: micro-batcher coalescing semantics, HTTP
endpoint behavior against live tiny engines, and CLI service construction."""

import base64
import http.client
import io
import json
import os
import threading
import time

import jax
import numpy as np
import pytest
from PIL import Image

from tpu_unet.models import AnomalyUNet, SegmentationUNet
from tpu_unet.serve import AnomalyScorer, SegmentationPredictor
from tpu_unet.serve_http import MicroBatcher, ServingService, make_server
from tpu_unet.train import create_train_state, make_optimizer


def _variables(model, hw):
    state = create_train_state(model, jax.random.key(0), (1,) + hw + (3,),
                               make_optimizer("adam", 1e-3, 0.0))
    return state.params, state.batch_stats


def _png_bytes(arr_u8):
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


# -- MicroBatcher ------------------------------------------------------------

def test_microbatcher_coalesces_full_batch():
    calls = []

    def run(imgs):
        calls.append(len(imgs))
        return [float(im.mean()) for im in imgs]

    b = MicroBatcher(run, batch_size=4, max_wait_ms=5000)
    try:
        imgs = [np.full((2, 2, 3), i, np.uint8) for i in range(4)]
        futs = [b.submit(im) for im in imgs]
        got = [f.result(timeout=30) for f in futs]
        # A full batch flushes immediately (no 5 s window wait) as ONE call.
        assert calls == [4]
        assert got == [float(im.mean()) for im in imgs]
        assert b.engine_batches == 1 and b.requests_served == 4
    finally:
        b.close()


def test_microbatcher_zero_window_serves_singletons():
    calls = []

    def run(imgs):
        calls.append(len(imgs))
        return list(np.zeros(len(imgs)))

    b = MicroBatcher(run, batch_size=4, max_wait_ms=0)
    try:
        for _ in range(3):  # sequential: each request resolves before the next
            b.submit(np.zeros((2, 2, 3), np.uint8)).result(timeout=30)
        assert calls == [1, 1, 1]
    finally:
        b.close()


def test_microbatcher_propagates_engine_error_to_all_waiters():
    def run(imgs):
        raise RuntimeError("boom")

    b = MicroBatcher(run, batch_size=2, max_wait_ms=5000)
    try:
        futs = [b.submit(np.zeros((2, 2, 3), np.uint8)) for _ in range(2)]
        for f in futs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=30)
        assert b.engine_batches == 0  # failed executions don't count
    finally:
        b.close()


def test_microbatcher_rejects_after_close():
    b = MicroBatcher(lambda imgs: list(np.zeros(len(imgs))), 2, 0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((2, 2, 3), np.uint8))


def test_microbatcher_close_fails_stranded_futures():
    """A request queued BEHIND the close sentinel must get its future failed
    by the WORKER itself when it consumes the sentinel — not depend on
    close()'s join having succeeded (the engine can be mid-compile for
    minutes, past close()'s 30 s join window; advisor r4/r5). Normally the
    lifecycle lock makes a behind-sentinel item impossible; this simulates a
    regression to prove the defensive drain holds."""
    b = MicroBatcher(lambda imgs: list(np.zeros(len(imgs))), 2, 0)
    # Simulate deterministically: park the worker on a long batch, then
    # enqueue the sentinel followed by a stranded item.
    release = threading.Event()

    def slow_run(imgs):
        release.wait(timeout=30)
        return list(np.zeros(len(imgs)))

    b._run = slow_run
    first = b.submit(np.zeros((2, 2, 3), np.uint8))  # occupies the worker
    time.sleep(0.05)
    b._q.put(None)  # close sentinel enters the queue...
    fut = type(first)()  # a bare Future queued behind the sentinel
    b._q.put((np.zeros((2, 2, 3), np.uint8), fut, None))
    b._closed = True
    release.set()
    # No close() call at all: the worker alone must resolve everything.
    b._worker.join(timeout=30)
    assert not b._worker.is_alive()
    with pytest.raises(RuntimeError, match="closed before"):
        fut.result(timeout=5)
    assert float(first.result(timeout=5)) == 0.0
    b.close()  # idempotent afterwards


# -- HTTP daemon over live engines --------------------------------------------

class _Daemon:
    """Start make_server() on an ephemeral port; yields a connection factory."""

    def __init__(self, service):
        self.service = service
        self.server = make_server(service, port=0)
        self.port = self.server.server_address[1]
        self._t = threading.Thread(target=self.server.serve_forever,
                                   daemon=True)
        self._t.start()

    def request(self, method, path, body=None):
        conn = http.client.HTTPConnection("127.0.0.1", self.port, timeout=120)
        try:
            conn.request(method, path, body=body)
            resp = conn.getresponse()
            return resp.status, json.loads(resp.read().decode())
        finally:
            conn.close()

    def close(self):
        self.server.shutdown()
        self.server.server_close()
        self.service.close()


@pytest.fixture(scope="module")
def anomaly_daemon():
    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=4, base_features=4)
    svc = ServingService(scorer, max_wait_ms=0, threshold=0.5)
    svc.warmup()
    d = _Daemon(svc)
    yield d, scorer
    d.close()


def test_daemon_score_matches_engine(anomaly_daemon):
    d, scorer = anomaly_daemon
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    status, resp = d.request("POST", "/v1/score", _png_bytes(img))
    assert status == 200
    ref = float(scorer.score_array(img[None])[0])
    assert resp["score"] == pytest.approx(ref, abs=1e-6)
    assert resp["anomalous"] == (ref > 0.5) and resp["threshold"] == 0.5


def test_daemon_meta_and_errors(anomaly_daemon):
    d, _ = anomaly_daemon
    status, meta = d.request("GET", "/healthz")
    assert status == 200 and meta["kind"] == "anomaly_scorer"
    assert meta["image_size_hw"] == [32, 32] and meta["batch_size"] == 4
    assert meta["requests_served"] >= 1 and meta["engine_batches"] >= 1

    status, resp = d.request("POST", "/v1/score", b"not an image")
    assert status == 400 and "error" in resp
    status, _ = d.request("POST", "/v1/score", b"")
    assert status == 400
    status, _ = d.request("GET", "/nope")
    assert status == 404
    # Wrong endpoint for the engine kind: curated 404, not a crash.
    status, resp = d.request("POST", "/v1/predict", b"x")
    assert status == 404 and "anomaly" in resp["error"]


def test_daemon_concurrent_requests_all_resolve(anomaly_daemon):
    d, scorer = anomaly_daemon
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            for _ in range(4)]
    results = [None] * 4

    def hit(i):
        results[i] = d.request("POST", "/v1/score", _png_bytes(imgs[i]))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    refs = scorer.score_array(np.stack(imgs))
    for i, (status, resp) in enumerate(results):
        assert status == 200
        assert resp["score"] == pytest.approx(float(refs[i]), abs=1e-6)


def test_daemon_seg_predict_roundtrip():
    params, bstats = _variables(
        SegmentationUNet(n_classes=3, base_features=4, dropout=0.0), (32, 16))
    pred = SegmentationPredictor.from_variables(
        params, bstats, num_classes=3, image_size_hw=(32, 16), batch_size=2,
        base_features=4, dropout=0.0)
    svc = ServingService(pred, max_wait_ms=0)
    d = _Daemon(svc)
    try:
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
        status, resp = d.request("POST", "/v1/predict", _png_bytes(img))
        assert status == 200
        mask = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(resp["mask_png_base64"]))))
        ref_mask, ref_conf = pred.predict_array(img[None])
        np.testing.assert_array_equal(mask, ref_mask[0])
        assert resp["mean_confidence"] == pytest.approx(float(ref_conf[0]),
                                                        abs=1e-6)
        shares = resp["class_pixel_share"]
        assert len(shares) == 3 and sum(shares) == pytest.approx(1.0, abs=1e-4)
        # Anomaly endpoint on a seg engine: curated 404.
        status, resp = d.request("POST", "/v1/score", b"x")
        assert status == 404 and "seg" in resp["error"]
    finally:
        d.close()


def test_daemon_metrics_endpoint(anomaly_daemon):
    """GET /metrics: Prometheus text exposition with request counters, latency
    histograms, and per-program occupancy counters (serve_metrics.py)."""
    d, _ = anomaly_daemon
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    status, _ = d.request("POST", "/v1/score", _png_bytes(img))
    assert status == 200
    status, _ = d.request("POST", "/v1/score", b"not an image")  # error path
    assert status == 400

    conn = http.client.HTTPConnection("127.0.0.1", d.port, timeout=120)
    try:
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/plain")
        text = resp.read().decode()
    finally:
        conn.close()

    assert 'tpu_unet_serving_info{' in text
    assert 'kind="anomaly_scorer"' in text and 'quantize="none"' in text

    def counter(line_prefix):
        for line in text.splitlines():
            if line.startswith(line_prefix):
                return int(line.rsplit(" ", 1)[1])
        raise AssertionError(f"no line starting with {line_prefix!r}:\n{text}")

    ok = counter('tpu_unet_requests_total{endpoint="/v1/score",status="ok"}')
    err = counter('tpu_unet_requests_total{endpoint="/v1/score",status="error"}')
    assert ok >= 1 and err >= 1
    # Errors are timed too: the histogram saw every /v1/score request.
    assert counter(
        'tpu_unet_request_latency_seconds_count{endpoint="/v1/score"}'
    ) == ok + err
    # Program counters mirror the live micro-batcher (occupancy source).
    assert counter('tpu_unet_engine_batches_total{program="main"}') \
        == d.service.batcher.engine_batches
    assert counter('tpu_unet_engine_requests_total{program="main"}') \
        == d.service.batcher.requests_served


# -- CLI service construction --------------------------------------------------

def test_daemon_cli_flag_validation(tmp_path):
    from tpu_unet.cli.serve_daemon import build_service, parse_args

    with pytest.raises(SystemExit, match="--task"):
        args, parser = parse_args(["--checkpoint", "nope"])
        build_service(args, parser)
    with pytest.raises(SystemExit, match="exactly one"):
        args, parser = parse_args([])
        build_service(args, parser)
    # --model/--deep_supervision are seg-engine knobs; silently ignoring them
    # on an anomaly daemon would serve the wrong architecture's checkpoint.
    with pytest.raises(SystemExit, match="--task seg"):
        args, parser = parse_args(["--checkpoint", "nope", "--task", "anomaly",
                                   "--model", "unetpp"])
        build_service(args, parser)
    with pytest.raises(SystemExit, match="--task seg"):
        args, parser = parse_args(["--checkpoint", "nope", "--task", "anomaly",
                                   "--deep_supervision"])
        build_service(args, parser)
    with pytest.raises(SystemExit, match="--task seg"):
        args, parser = parse_args(["--checkpoint", "nope", "--task", "anomaly",
                                   "--heads", "2"])
        build_service(args, parser)


@pytest.mark.slow
def test_daemon_serves_pruned_unetpp(tmp_path):
    """A seg daemon built on a UNet++ deep-supervision checkpoint with
    --heads 1 serves the pruned program end-to-end (engine construction +
    one /v1/segment-equivalent predict through the service batcher)."""
    import jax

    from tpu_unet.cli.serve_daemon import build_service, parse_args
    from tpu_unet.models.unetpp import UNetPlusPlus
    from tpu_unet.train import create_train_state, make_optimizer
    from tpu_unet.train.checkpoint import save_checkpoint

    model = UNetPlusPlus(n_classes=4, base_features=4, deep_supervision=True)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               make_optimizer("adam", 1e-3, 0.0))
    ckpt = os.path.join(tmp_path, "ckpt", "best_model")
    save_checkpoint(state, 0, 1.0, ckpt)
    args, parser = parse_args([
        "--checkpoint", ckpt, "--task", "seg", "--model", "unetpp",
        "--deep_supervision", "--heads", "1", "--num_classes", "4",
        "--image_height", "32", "--image_width", "32", "--batch_size", "2",
        "--base_features", "4", "--precision", "f32"])
    service = build_service(args, parser)
    try:
        assert service.kind == "segmentation_predictor"
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        mask, conf = service.batcher.submit(img).result(timeout=600)
        assert np.asarray(mask).shape == (32, 32)
        assert np.isfinite(float(conf))
    finally:
        service.close()


def test_daemon_sigterm_graceful_shutdown():
    """SIGTERM (docker stop / systemd / kubelet) ends serve_until_signal
    cleanly: the server socket closes, the batcher drains, and an in-flight
    request that landed just before the signal still resolves."""
    import os
    import signal
    import time

    from tpu_unet.cli.serve_daemon import serve_until_signal

    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=2, base_features=4)
    svc = ServingService(scorer, max_wait_ms=0)
    server = make_server(svc, port=0)
    port = server.server_address[1]
    results = {}

    def client():
        time.sleep(0.3)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        try:
            img = np.zeros((32, 32, 3), np.uint8)
            conn.request("POST", "/v1/score", body=_png_bytes(img))
            resp = conn.getresponse()
            results["status"] = resp.status
            results["body"] = json.loads(resp.read().decode())
        finally:
            conn.close()
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    serve_until_signal(server, svc)  # returns (instead of killing the process)
    t.join(timeout=30)
    assert results.get("status") == 200
    assert np.isfinite(results["body"]["score"])
    # The batcher is drained and closed: new submissions are refused.
    with pytest.raises(RuntimeError, match="closed"):
        svc.batcher.submit(np.zeros((32, 32, 3), np.uint8))
    # The previous SIGTERM disposition was restored.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_daemon_cli_from_artifact(tmp_path):
    """--artifact mode: kind + geometry come from meta.json, no --task needed."""
    from tpu_unet.cli.serve_daemon import build_service, parse_args
    from tpu_unet.serve_artifact import export_artifact

    params, bstats = _variables(AnomalyUNet(base_features=4), (32, 32))
    scorer = AnomalyScorer.from_variables(params, bstats, image_size=32,
                                          batch_size=2, base_features=4)
    art = str(tmp_path / "art")
    export_artifact(scorer, art)

    args, parser = parse_args(["--artifact", art, "--max_wait_ms", "0"])
    svc = build_service(args, parser)
    try:
        assert svc.kind == "anomaly_scorer" and svc.size_hw == (32, 32)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        got = svc.handle("/v1/score", _png_bytes(img))
        ref = float(scorer.score_array(img[None])[0])
        assert got["score"] == pytest.approx(ref, abs=1e-5)
    finally:
        svc.close()

"""Serving-daemon overload policy: bounded admission (QueueFullError -> HTTP
503 + Retry-After), deadline-expired requests dropped before the engine call,
and the rejected/expired counters on /healthz and /metrics.

No reference counterpart (the reference stops at offline test scripts); this
is standard production-serving load shedding on top of serve_http.py's
micro-batcher.
"""

import http.client
import io
import json
import threading
import time

import jax
import numpy as np
import pytest
from PIL import Image

from tpu_unet.models import AnomalyUNet
from tpu_unet.serve import AnomalyScorer
from tpu_unet.serve_http import (MicroBatcher, QueueFullError, ServingService,
                                 make_server)
from tpu_unet.train import create_train_state, make_optimizer


def _png_bytes(arr_u8):
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


class _GatedRun:
    """run_batch stub the tests can block: every call waits on ``gate`` and
    records the batch size it actually received."""

    def __init__(self):
        self.gate = threading.Event()
        self.entered = threading.Event()
        self.batch_sizes = []

    def __call__(self, imgs):
        self.entered.set()
        assert self.gate.wait(timeout=30), "test forgot to open the gate"
        self.batch_sizes.append(len(imgs))
        return [float(im.mean()) for im in imgs]


def _img(v=0):
    return np.full((2, 2, 3), v, np.uint8)


def _wait_until(cond, timeout=10.0):
    deadline = time.monotonic() + timeout
    while not cond():
        assert time.monotonic() < deadline, "condition never became true"
        time.sleep(0.005)


# -- MicroBatcher admission bound ---------------------------------------------

def test_microbatcher_rejects_when_queue_full():
    run = _GatedRun()
    b = MicroBatcher(run, batch_size=1, max_wait_ms=0, max_queue=2)
    try:
        f0 = b.submit(_img(0))          # worker dequeues this, blocks in run
        run.entered.wait(timeout=10)
        f1 = b.submit(_img(1))          # queued
        f2 = b.submit(_img(2))          # queued (at the bound)
        with pytest.raises(QueueFullError, match="full"):
            b.submit(_img(3))
        assert b.rejected == 1
        run.gate.set()
        # Everything admitted still resolves; the rejected one never ran.
        assert [f.result(timeout=30) for f in (f0, f1, f2)] == \
            [float(_img(i).mean()) for i in range(3)]
        assert b.requests_served == 3 and sum(run.batch_sizes) == 3
    finally:
        run.gate.set()
        b.close()


def test_microbatcher_unbounded_by_default():
    b = MicroBatcher(lambda imgs: list(np.zeros(len(imgs))), 1, 0)
    try:
        assert b.max_queue is None
        # Far past any plausible implicit bound.
        futs = [b.submit(_img()) for _ in range(512)]
        for f in futs:
            f.result(timeout=60)
        assert b.rejected == 0
    finally:
        b.close()


# -- Deadline expiry ------------------------------------------------------------

def test_expired_requests_dropped_before_engine_call():
    run = _GatedRun()
    b = MicroBatcher(run, batch_size=4, max_wait_ms=50)
    try:
        f0 = b.submit(_img(0))          # occupies the worker once gated
        run.entered.wait(timeout=10)
        dead = b.submit(_img(1), deadline=time.monotonic() - 1.0)
        live = b.submit(_img(2), deadline=time.monotonic() + 60.0)
        run.gate.set()
        assert f0.result(timeout=30) == float(_img(0).mean())
        assert live.result(timeout=30) == float(_img(2).mean())
        with pytest.raises(TimeoutError, match="expired"):
            dead.result(timeout=30)
        assert b.expired == 1
        # The flush after the gated head ran ONLY the live request.
        assert run.batch_sizes == [1, 1]
        assert b.requests_served == 2
    finally:
        run.gate.set()
        b.close()


def test_all_expired_batch_skips_engine_entirely():
    run = _GatedRun()
    b = MicroBatcher(run, batch_size=4, max_wait_ms=0)
    try:
        f0 = b.submit(_img(0))
        run.entered.wait(timeout=10)
        dead = b.submit(_img(1), deadline=time.monotonic() - 1.0)
        run.gate.set()
        f0.result(timeout=30)
        with pytest.raises(TimeoutError, match="expired"):
            dead.result(timeout=30)
        _wait_until(lambda: b.expired == 1)
        assert run.batch_sizes == [1]   # no second engine call
        assert b.engine_batches == 1
    finally:
        run.gate.set()
        b.close()


# -- HTTP layer + service counters ----------------------------------------------

@pytest.fixture(scope="module")
def bounded_daemon():
    state = create_train_state(
        AnomalyUNet(base_features=4), jax.random.key(0), (1, 32, 32, 3),
        make_optimizer("adam", 1e-3, 0.0))
    scorer = AnomalyScorer.from_variables(state.params, state.batch_stats,
                                          image_size=32, batch_size=1,
                                          base_features=4)
    svc = ServingService(scorer, max_wait_ms=0, max_queue=1)
    svc.warmup()
    server = make_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield svc, port
    server.shutdown()
    server.server_close()
    svc.close()


def _request(port, method, path, body=None, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request(method, path, body=body)
        resp = conn.getresponse()
        return resp.status, dict(resp.getheaders()), \
            json.loads(resp.read().decode())
    finally:
        conn.close()


def test_daemon_returns_503_with_retry_after_under_overload(bounded_daemon):
    svc, port = bounded_daemon
    run = _GatedRun()
    orig = svc.batcher._run
    svc.batcher._run = run
    try:
        png = _png_bytes(np.zeros((32, 32, 3), np.uint8))
        results = []

        def hit():
            results.append(_request(port, "POST", "/v1/score", png))

        t1 = threading.Thread(target=hit)   # worker takes it, blocks in run
        t1.start()
        run.entered.wait(timeout=30)
        t2 = threading.Thread(target=hit)   # fills the 1-slot queue
        t2.start()
        _wait_until(lambda: svc.batcher._q.qsize() == 1)

        status, headers, resp = _request(port, "POST", "/v1/score", png)
        assert status == 503
        assert headers.get("Retry-After") == "1"
        assert "full" in resp["error"]

        run.gate.set()
        t1.join(timeout=60)
        t2.join(timeout=60)
        assert [s for s, _, _ in results] == [200, 200]
    finally:
        run.gate.set()
        svc.batcher._run = orig

    # Counters surface on /healthz and /metrics.
    status, _, meta = _request(port, "GET", "/healthz")
    assert status == 200
    assert meta["max_queue"] == 1
    assert meta["requests_rejected"] >= 1
    assert meta["requests_expired"] == 0
    text = svc.metrics_text()
    assert 'tpu_unet_queue_rejected_total{program="main"} ' \
        f"{svc.batcher.rejected}" in text
    assert 'tpu_unet_queue_expired_total{program="main"} 0' in text
    # The 503 was timed as an error by the request metrics.
    assert 'status="error"' in text


def test_daemon_cli_wires_overload_flags(tmp_path):
    from tpu_unet.cli.serve_daemon import build_service, parse_args
    from tpu_unet.serve_artifact import export_artifact

    state = create_train_state(
        AnomalyUNet(base_features=4), jax.random.key(0), (1, 32, 32, 3),
        make_optimizer("adam", 1e-3, 0.0))
    scorer = AnomalyScorer.from_variables(state.params, state.batch_stats,
                                          image_size=32, batch_size=2,
                                          base_features=4)
    art = str(tmp_path / "art")
    export_artifact(scorer, art)

    args, parser = parse_args(["--artifact", art, "--max_wait_ms", "0",
                               "--max_queue", "7",
                               "--request_timeout_s", "9"])
    svc = build_service(args, parser)
    try:
        assert svc.batcher.max_queue == 7
        assert svc.request_timeout_s == 9.0
    finally:
        svc.close()

    with pytest.raises(SystemExit, match="max_queue"):
        args, parser = parse_args(["--artifact", art, "--max_queue", "-1"])
        build_service(args, parser)
    with pytest.raises(SystemExit, match="request_timeout_s"):
        args, parser = parse_args(["--artifact", art,
                                   "--request_timeout_s", "0"])
        build_service(args, parser)

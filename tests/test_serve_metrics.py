"""Unit tests for the Prometheus-style serving metrics registry.

The /metrics HTTP endpoint itself is covered in test_serve_http.py against a
live daemon; these pin the exposition format and counter semantics.
"""

import threading

from tpu_unet.serve_metrics import Histogram, ServingMetrics


def test_histogram_cumulative_buckets():
    h = Histogram(buckets=(0.01, 0.1, 1.0))
    for v in (0.005, 0.05, 0.05, 0.5, 5.0):
        h.observe(v)
    lines = h.render("lat", {"endpoint": "/v1/score"})
    text = "\n".join(lines)
    assert 'lat_bucket{endpoint="/v1/score",le="0.01"} 1' in text
    assert 'lat_bucket{endpoint="/v1/score",le="0.1"} 3' in text
    assert 'lat_bucket{endpoint="/v1/score",le="1.0"} 4' in text
    assert 'lat_bucket{endpoint="/v1/score",le="+Inf"} 5' in text
    assert 'lat_count{endpoint="/v1/score"} 5' in text
    assert 'lat_sum{endpoint="/v1/score"} 5.605' in text


def test_serving_metrics_render():
    m = ServingMetrics(buckets=(0.1, 1.0))
    m.observe("/v1/score", 0.05)
    m.observe("/v1/score", 0.2)
    m.observe("/v1/score", 0.3, ok=False)
    m.observe("/v1/predict", 0.4)
    text = m.render(info={"kind": "anomaly_scorer", "quantize": "int8"},
                    programs={"main": (3, 7), "heatmap": (1, 1)})
    assert 'tpu_unet_serving_info{kind="anomaly_scorer",quantize="int8"} 1' in text
    assert 'tpu_unet_requests_total{endpoint="/v1/score",status="ok"} 2' in text
    assert 'tpu_unet_requests_total{endpoint="/v1/score",status="error"} 1' in text
    assert 'tpu_unet_requests_total{endpoint="/v1/predict",status="ok"} 1' in text
    # Errors are timed too: the /v1/score histogram saw all 3 requests.
    assert ('tpu_unet_request_latency_seconds_count{endpoint="/v1/score"} 3'
            in text)
    assert 'tpu_unet_engine_batches_total{program="main"} 3' in text
    assert 'tpu_unet_engine_requests_total{program="main"} 7' in text
    assert 'tpu_unet_engine_batches_total{program="heatmap"} 1' in text
    assert text.endswith("\n")
    # Every non-comment line is `name{labels} value`.
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            assert " " in line and line.split(" ")[-1] != ""


def test_thread_safety_smoke():
    m = ServingMetrics()

    def work():
        for _ in range(500):
            m.observe("/v1/score", 0.01)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    text = m.render(info={}, programs={})
    assert 'tpu_unet_requests_total{endpoint="/v1/score",status="ok"} 2000' in text
    assert ('tpu_unet_request_latency_seconds_count{endpoint="/v1/score"} 2000'
            in text)

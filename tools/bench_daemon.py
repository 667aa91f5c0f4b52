#!/usr/bin/env python3
"""Online-serving (daemon) benchmark: concurrent clients vs the micro-batcher.

Measures what the batch benchmarks (tools/bench_serving.py) cannot: how the
fixed-shape micro-batcher (tpu_unet/serve_http.py) converts CONCURRENT
single-image traffic into padded XLA program calls — end-to-end request
throughput, per-request latency percentiles, and mean batch occupancy
(requests per program execution) as a function of client concurrency and the
--max_wait_ms coalescing window.

Default is in-process (clients call ServingService.handle directly): that
isolates decode + batching + device time from HTTP socket overhead. --http
adds the real stdlib HTTP layer on a loopback socket. Models are randomly
initialized (serving cost is weight-agnostic, bench_serving.py methodology).

Usage:
  python tools/bench_daemon.py                      # AnomalyUNet 256², b8
  python tools/bench_daemon.py --clients 1 4 16 --max_wait_ms 2
  python tools/bench_daemon.py --task seg --height 512 --width 512
Prints one JSON line per concurrency level.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _percentile(sorted_vals, q):
    if not sorted_vals:
        return float("nan")
    idx = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


def main(argv=None):
    p = argparse.ArgumentParser(description="Micro-batched daemon benchmark")
    p.add_argument("--task", type=str, default="anomaly",
                   choices=["anomaly", "seg"])
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--num_classes", type=int, default=4, help="seg only")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bucket_sizes", type=str, default=None,
                   help="Comma-separated batch-shape ladder (e.g. '1,2,4'): "
                        "part-full flushes pad to the smallest adequate "
                        "compiled bucket — measures the low-concurrency win "
                        "vs always padding to --batch_size")
    p.add_argument("--base_features", type=int, default=64)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "f32"])
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--clients", type=int, nargs="+", default=[1, 4, 8],
                   help="Concurrency levels to sweep")
    p.add_argument("--requests_per_client", type=int, default=20)
    p.add_argument("--http", action="store_true",
                   help="Route through the real HTTP layer (loopback socket) "
                        "instead of in-process ServingService.handle calls")
    p.add_argument("--device", type=str, default=None,
                   help="e.g. cpu to force the host backend")
    args = p.parse_args(argv)

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import numpy as np
    from PIL import Image

    from tpu_unet.cli._artifact_common import parse_bucket_sizes
    from tpu_unet.core.precision import get_policy
    from tpu_unet.models import AnomalyUNet, SegmentationUNet
    from tpu_unet.serve import AnomalyScorer, SegmentationPredictor
    from tpu_unet.serve_http import ServingService, make_server

    buckets = parse_bucket_sizes(args, args.batch_size)
    policy = get_policy(args.precision)
    size_hw = (args.height, args.width)
    if args.task == "anomaly":
        if args.height != args.width:
            raise SystemExit("anomaly engines are square; use --task seg")
        model = AnomalyUNet(base_features=args.base_features, policy=policy)
        v = model.init(jax.random.key(0),
                       np.zeros((1,) + size_hw + (3,), np.float32), train=False)
        engine = AnomalyScorer.from_variables(
            v["params"], v["batch_stats"], image_size=args.height,
            batch_size=args.batch_size, base_features=args.base_features,
            precision=args.precision, bucket_sizes=buckets)
        endpoint = "/v1/score"
    else:
        model = SegmentationUNet(n_classes=args.num_classes,
                                 base_features=args.base_features,
                                 dropout=0.0, policy=policy)
        v = model.init(jax.random.key(0),
                       np.zeros((1,) + size_hw + (3,), np.float32), train=False)
        engine = SegmentationPredictor.from_variables(
            v["params"], v["batch_stats"], num_classes=args.num_classes,
            image_size_hw=size_hw, batch_size=args.batch_size,
            base_features=args.base_features, dropout=0.0,
            precision=args.precision, bucket_sizes=buckets)
        endpoint = "/v1/predict"

    # Pre-encode distinct PNG request bodies so every request pays the real
    # decode (request threads decode concurrently, like production traffic).
    rng = np.random.default_rng(0)
    bodies = []
    for _ in range(8):
        arr = rng.integers(0, 256, size_hw + (3,), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        bodies.append(buf.getvalue())

    for n_clients in args.clients:
        service = ServingService(engine, max_wait_ms=args.max_wait_ms)
        service.warmup()
        server = None
        if args.http:
            import http.client
            server = make_server(service, port=0)
            port = server.server_address[1]
            threading.Thread(target=server.serve_forever, daemon=True).start()

            def send(body):
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=600)
                try:
                    conn.request("POST", endpoint, body=body)
                    resp = conn.getresponse()
                    assert resp.status == 200, resp.read()
                    resp.read()
                finally:
                    conn.close()
        else:
            def send(body):
                service.handle(endpoint, body)

        latencies = [[] for _ in range(n_clients)]
        barrier = threading.Barrier(n_clients + 1)

        def client(idx):
            barrier.wait()
            for r in range(args.requests_per_client):
                t0 = time.perf_counter()
                send(bodies[(idx + r) % len(bodies)])
                latencies[idx].append(time.perf_counter() - t0)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        if server is not None:
            server.shutdown()
            server.server_close()
        lat = sorted(x for client_lat in latencies for x in client_lat)
        n_req = len(lat)
        occupancy = (service.batcher.requests_served
                     / max(1, service.batcher.engine_batches))
        service.close()
        print(json.dumps({
            "task": args.task, "hw": list(size_hw),
            "batch_size": args.batch_size,
            "bucket_sizes": (list(engine.bucket_sizes)
                             if engine.bucket_sizes else None),
            "max_wait_ms": args.max_wait_ms, "http": bool(args.http),
            "clients": n_clients, "requests": n_req,
            "req_per_sec": round(n_req / wall, 2),
            "p50_ms": round(_percentile(lat, 0.50) * 1e3, 2),
            "p95_ms": round(_percentile(lat, 0.95) * 1e3, 2),
            "mean_batch_occupancy": round(occupancy, 2),
        }))


if __name__ == "__main__":
    main()

"""Production anomaly-scoring engine (batched TPU serving).

The deployment-facing counterpart of the experiment CLIs: load a trained
AnomalyUNet once, then score streams of images at full chip throughput. No
reference counterpart (/root/reference stops at per-experiment test scripts);
this is the TPU-native serving layer the framework's BN-folding, score-only
program specialization, and int8 quantization exist for.

Serving-specific optimizations (all measured on v5e-1, 256px, batch 128; live
figures are bench.py's serve_* keys):
- **Score-only program**: the jitted forward returns only the per-image scalar
  score, so XLA dead-code-eliminates the entire segmentation decoder (half the
  model) — ~1580 img/s vs ~990 img/s for the full-output eval step (bf16).
- **int8 PTQ** (``quantize='int8'``): ~1950 img/s (1.24x over bf16 score-only,
  2x the full-output bf16 step). See ops/quantize.py; calibrate once and reuse
  via save_qparams/load_qparams.
- **Pipelined dispatch**: batches are enqueued back-to-back and only the (N,)
  score vectors are fetched, keeping the device busy across the host roundtrip.
- **Fixed shapes**: inputs are padded to the serving batch size so exactly one
  XLA program is compiled. An optional ``bucket_sizes`` ladder (TF-Serving's
  allowed_batch_sizes pattern) compiles a few extra batch shapes so ragged
  chunks — the online daemon's low-concurrency flushes — pad to the smallest
  adequate bucket instead of the full batch.

Usage:
    scorer = AnomalyScorer.from_checkpoint("outputs/exp/checkpoints/best_model",
                                           calib_images=calib_u8)   # or quantize=None
    scores = scorer.score_paths(glob.glob("line_camera/*.png"))
    verdicts = scores > threshold
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.core.precision import get_policy
from tpu_unet.data.transforms import load_image_rgb
from tpu_unet.metrics.anomaly import anomaly_score
from tpu_unet.models import build_model
from tpu_unet.ops.augment import eval_transform
from tpu_unet.ops.fold_bn import fold_batchnorm
from tpu_unet.ops.seg_head import sliced_pred_confidence


def _latency_stats_ms(run_once, n_iters: int) -> dict:
    """p50/p95/mean wall-clock per synchronous ``run_once()`` call, in ms.

    ``run_once`` must block until its result is on host (fetch a scalar). One
    unmeasured warmup call absorbs compilation.
    """
    run_once()
    times = np.empty(max(n_iters, 1))
    for i in range(len(times)):
        t0 = time.perf_counter()
        run_once()
        times[i] = (time.perf_counter() - t0) * 1e3
    return {"p50_ms": round(float(np.percentile(times, 50)), 3),
            "p95_ms": round(float(np.percentile(times, 95)), 3),
            "mean_ms": round(float(times.mean()), 3)}


def _amap_to_u8(amap):
    """(N,H,W,1) sigmoid anomaly map -> (N,H,W) uint8 heatmap (0..255)."""
    a = jnp.clip(amap[..., 0].astype(jnp.float32), 0.0, 1.0)
    return jnp.round(a * 255.0).astype(jnp.uint8)


def _pad_chunk(chunk: np.ndarray, batch_size: int) -> np.ndarray:
    """Zero-pad a ragged final chunk to the fixed serving batch size."""
    if len(chunk) < batch_size:
        pad = np.zeros((batch_size - len(chunk),) + chunk.shape[1:], chunk.dtype)
        chunk = np.concatenate([chunk, pad])
    return chunk


def _normalize_buckets(bucket_sizes, batch_size: int, n_data: int = 1):
    """Validate and canonicalize a serving-batch bucket ladder.

    The ladder (the TF-Serving ``allowed_batch_sizes`` pattern) lets a ragged
    chunk pad to the SMALLEST adequate compiled batch instead of the full
    serving batch — one compiled program per bucket (jit caches per shape),
    so 3 queued requests against ``bucket_sizes=(1, 4, 16)`` cost a 4-image
    program call, not a ``batch_size``-image one. Returns a sorted tuple of
    distinct sizes always ending in ``batch_size`` (the implicit top bucket),
    or None when no ladder was given. Every bucket must stay divisible by the
    data-parallel degree so sharded batches still split evenly.
    """
    if not bucket_sizes:
        return None
    sizes = sorted({int(b) for b in bucket_sizes})
    if sizes[0] < 1:
        raise ValueError(f"bucket sizes must be >= 1, got {sizes[0]}")
    if sizes[-1] > batch_size:
        raise ValueError(f"bucket size {sizes[-1]} exceeds the serving "
                         f"batch_size {batch_size}")
    if sizes[-1] != batch_size:
        sizes.append(batch_size)
    bad = [b for b in sizes if b % n_data]
    if bad:
        raise ValueError(f"bucket sizes {bad} not divisible by the "
                         f"data-parallel degree {n_data}")
    return tuple(sizes)


class DecodeError(RuntimeError):
    """A source image failed to decode; ``.path`` names the offending file."""

    def __init__(self, path: str, cause: BaseException):
        super().__init__(f"failed to decode image {path!r}: {cause!r}")
        self.path = path


def _pipelined_batches(paths: Sequence[str], size_hw, batch_size: int,
                       num_workers: int, fn, on_decode_error: str = "raise",
                       log_fn=print, pad_target=None):
    """Decode path chunks and apply ``fn(padded_uint8_batch)`` to each, streaming.

    A decode pool (``num_workers`` threads, GIL-free inside the native resampler)
    decodes; a SEPARATE single-thread prefetcher overlaps chunk k+1's decode with
    the device work fn enqueues for chunk k. The prefetcher must not share the
    decode pool: load_batch blocks on pool.map, and submitting it to the same
    pool deadlocks at num_workers=1.

    Decode failures (corrupt/truncated files) surface as a named
    :class:`DecodeError` carrying the path — not a raw traceback from deep
    inside the pool. With ``on_decode_error='skip'`` the bad file is replaced by
    a zero image, logged via ``log_fn``, and its global index reported.

    Returns ``(results, failed)``: fn's results one per chunk, plus the sorted
    global path indices that were skipped (always empty in 'raise' mode).
    ``pad_target`` maps a ragged chunk length to its padded batch size
    (default: always ``batch_size``; engines pass their bucket ladder).
    """
    if on_decode_error not in ("raise", "skip"):
        raise ValueError(f"on_decode_error must be 'raise' or 'skip', "
                         f"got {on_decode_error!r}")
    if pad_target is None:
        pad_target = lambda n: batch_size  # noqa: E731
    chunks = [(lo, paths[lo:lo + batch_size])
              for lo in range(0, len(paths), batch_size)]
    if not chunks:
        return [], []
    failed: list = []  # global indices of skipped paths
    decode_pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
    prefetch = ThreadPoolExecutor(max_workers=1)
    try:
        def decode_one(item):
            idx, p = item
            try:
                return load_image_rgb(p, size_hw)
            except Exception as e:  # noqa: BLE001 — named + re-raised/reported
                if on_decode_error == "raise":
                    raise DecodeError(p, e) from e
                failed.append(idx)
                log_fn(f"serve: skipping undecodable image {p!r} ({e!r})")
                return None

        def load_batch(lo: int, batch_paths: Sequence[str]) -> np.ndarray:
            imgs = list(decode_pool.map(decode_one,
                                        list(enumerate(batch_paths, start=lo))))
            filler = np.zeros((size_hw[0], size_hw[1], 3), np.uint8)
            return np.stack([im if im is not None else filler for im in imgs])

        results = []
        next_imgs = load_batch(*chunks[0])
        for i in range(len(chunks)):
            imgs = next_imgs
            future = (prefetch.submit(load_batch, *chunks[i + 1])
                      if i + 1 < len(chunks) else None)
            results.append(fn(_pad_chunk(imgs, pad_target(len(imgs)))))
            if future is not None:
                next_imgs = future.result()
        return results, sorted(failed)
    finally:
        prefetch.shutdown(wait=False)
        decode_pool.shutdown(wait=False)


def _lagged_host_fetch(device_fn):
    """Wrap a batch-enqueue fn so each batch's outputs land on host when the
    NEXT batch is enqueued (one batch of device output buffers in flight).

    Score scans enqueue everything and fetch at the end — fine for (N,) score
    vectors, but mask/heatmap outputs scale with the dataset: an all-enqueue
    scan over 100k images would pin every (B,H,W) output buffer in HBM at
    once. The lag-1 fetch keeps device memory at ~one batch while still
    overlapping batch k+1's decode (prefetch thread) and compute with batch
    k's fetch. Returns ``(run, drain)``: pass ``run`` to _pipelined_batches,
    call ``drain()`` afterwards for the list of per-batch host tuples.
    """
    pending: list = []
    host: list = []

    def _fetch_one():
        host.append(tuple(np.asarray(x) for x in pending.pop()))

    def run(imgs):
        out = device_fn(imgs)
        if pending:
            _fetch_one()
        pending.append(out)
        return None

    def drain():
        if pending:
            _fetch_one()
        return host

    return run, drain


class AnomalyScorer:
    """Batched anomaly scorer over one jitted, score-only program.

    Construct via :meth:`from_checkpoint` (production) or :meth:`from_variables`
    (tests / in-process use).
    """

    def __init__(self, score_fn, params_arg, image_size: int, batch_size: int,
                 mesh=None, quantize: Optional[str] = None, heatmap_fn=None,
                 bucket_sizes: Optional[Sequence[int]] = None):
        self._score_fn = score_fn
        self._heatmap_fn = heatmap_fn  # optional second program (with_heatmap)
        self.image_size = int(image_size)
        self.batch_size = int(batch_size)
        self.quantize = quantize  # advisory: 'int8' or None (bf16/f32 program)
        self._mesh = mesh
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        self.bucket_sizes = _normalize_buckets(bucket_sizes, self.batch_size,
                                               n_data)
        if mesh is not None:
            from tpu_unet.parallel import replicate
            params_arg = replicate(mesh, params_arg)
        self._params = params_arg

    def _put(self, chunk: np.ndarray):
        if self._mesh is None:
            return jnp.asarray(chunk)
        from tpu_unet.parallel import shard_batch
        return shard_batch(self._mesh, chunk)

    def _pad_target(self, n: int) -> int:
        """Smallest compiled batch adequate for ``n`` queued images (the full
        serving batch without a bucket ladder; chunking keeps n <= batch_size)."""
        if self.bucket_sizes is None:
            return self.batch_size
        return next(b for b in self.bucket_sizes if b >= n)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_variables(cls, params, batch_stats, *, image_size: int = 256,
                       batch_size: int = 128, precision: str = "bf16",
                       quantize: Optional[str] = None,
                       calib_images: Optional[np.ndarray] = None,
                       base_features: int = 64, bilinear: bool = False,
                       fold_bn: bool = True,
                       n_devices: Optional[int] = None,
                       qparams: Optional[dict] = None,
                       calib_percentile: Optional[float] = None,
                       with_heatmap: bool = False,
                       bucket_sizes: Optional[Sequence[int]] = None) -> "AnomalyScorer":
        """Build a scorer from an AnomalyUNet's (params, batch_stats).

        ``n_devices > 1`` shards each serving batch over a 'data' mesh (data
        parallelism by GSPMD — one compiled program, psum-free inference); the
        serving batch must be divisible by it. ``qparams`` (from
        ops.quantize.load_qparams) skips calibration entirely;
        ``calib_percentile`` (e.g. 99.9) uses outlier-robust percentile
        calibration instead of abs-max.

        ``with_heatmap=True`` builds a SECOND jitted program returning
        (score, anomaly-map) per image — the model's predicted anomaly map
        (the seg-decoder sigmoid the eval/visualize paths threshold for pixel
        metrics, cf. /root/reference/src/test.py pixel-level evaluation) as a
        (H,W) uint8 0..255 heatmap. The score-only program stays the fast path
        (its seg decoder is DCE'd); use :meth:`heatmap_array` /
        :meth:`heatmap_paths` for "where is the defect" serving.

        ``bucket_sizes`` (e.g. ``(1, 4, 16)``) compiles a LADDER of batch
        shapes: a ragged chunk pads to the smallest adequate bucket instead of
        the full serving batch (TF-Serving's allowed_batch_sizes pattern) —
        the online daemon's low-concurrency win, where a lone request against
        ``batch_size=128`` would otherwise pay a 128-image program call. Costs
        one compile per bucket (see :meth:`warmup`); ``batch_size`` is always
        the implicit top bucket.
        """
        if quantize not in (None, "none", "int8"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        # Validate the ladder BEFORE any expensive calibration/model work.
        _normalize_buckets(bucket_sizes, batch_size,
                           n_devices if n_devices and n_devices > 1 else 1)
        mesh = None
        if n_devices is not None and n_devices > 1:
            from tpu_unet.parallel import make_mesh
            if batch_size % n_devices:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"n_devices {n_devices}")
            mesh = make_mesh(n_data=n_devices)
        if quantize == "int8":
            from tpu_unet.ops.quantize import (chunk_calibration,
                                               make_quantized_forward,
                                               quantize_from_train_state)
            if qparams is None:
                if calib_images is None:
                    raise ValueError("int8 quantization needs calib_images "
                                     "(a (N,H,W,3) uint8 array of in-domain "
                                     "images) or a precomputed qparams tree")
                qparams = quantize_from_train_state(
                    "anomaly_unet", params, batch_stats,
                    chunk_calibration(calib_images, 16),
                    percentile=calib_percentile)
            fwd = make_quantized_forward("anomaly_unet")

            def score_fn(qp, images_u8):
                recon, _ = fwd(qp, images_u8)
                return anomaly_score(recon, eval_transform(images_u8))

            def heatmap_fn(qp, images_u8):
                recon, amap = fwd(qp, images_u8)
                return (anomaly_score(recon, eval_transform(images_u8)),
                        _amap_to_u8(amap))

            return cls(jax.jit(score_fn), qparams, image_size, batch_size,
                       mesh=mesh, quantize="int8",
                       heatmap_fn=jax.jit(heatmap_fn) if with_heatmap else None,
                       bucket_sizes=bucket_sizes)

        policy = get_policy(precision)
        model = build_model("anomaly_unet", bilinear=bilinear, policy=policy,
                            base_features=base_features)
        if fold_bn:
            params, batch_stats = fold_batchnorm(params, batch_stats)
        variables = {"params": params, "batch_stats": batch_stats}

        def score_fn(v, images_u8):
            img = eval_transform(images_u8)
            recon, _ = model.apply(v, img, train=False)  # seg decoder DCE'd
            return anomaly_score(recon, img)

        def heatmap_fn(v, images_u8):
            img = eval_transform(images_u8)
            recon, amap = model.apply(v, img, train=False)
            return anomaly_score(recon, img), _amap_to_u8(amap)

        return cls(jax.jit(score_fn), variables, image_size, batch_size,
                   mesh=mesh,
                   heatmap_fn=jax.jit(heatmap_fn) if with_heatmap else None,
                   bucket_sizes=bucket_sizes)

    @classmethod
    def from_checkpoint(cls, checkpoint: str, *, image_size: int = 256,
                        batch_size: int = 128, precision: str = "bf16",
                        quantize: Optional[str] = None,
                        calib_images: Optional[np.ndarray] = None,
                        base_features: int = 64, bilinear: bool = False,
                        n_devices: Optional[int] = None,
                        qparams: Optional[dict] = None,
                        calib_percentile: Optional[float] = None,
                        with_heatmap: bool = False,
                        bucket_sizes: Optional[Sequence[int]] = None) -> "AnomalyScorer":
        """Load an Orbax checkpoint (best_model / checkpoint_epoch_N layout)."""
        from tpu_unet.train.checkpoint import load_params
        from tpu_unet.train.optim import make_optimizer
        from tpu_unet.train.state import create_train_state

        model = build_model("anomaly_unet", bilinear=bilinear,
                            policy=get_policy(precision),
                            base_features=base_features)
        # The optimizer must match the trainer's so the checkpoint's opt_state
        # template round-trips (its values are discarded; cf. cli/test_mvtec.py).
        state = create_train_state(model, jax.random.key(0),
                                   (1, image_size, image_size, 3),
                                   make_optimizer("adam", 1e-3, 0.0))
        state = load_params(state, checkpoint)
        return cls.from_variables(state.params, state.batch_stats,
                                  image_size=image_size, batch_size=batch_size,
                                  precision=precision, quantize=quantize,
                                  calib_images=calib_images,
                                  base_features=base_features, bilinear=bilinear,
                                  n_devices=n_devices, qparams=qparams,
                                  calib_percentile=calib_percentile,
                                  with_heatmap=with_heatmap,
                                  bucket_sizes=bucket_sizes)

    # -- scoring ------------------------------------------------------------

    def score_array(self, images_u8: np.ndarray) -> np.ndarray:
        """Score a (N,H,W,3) uint8 array; returns (N,) float32 scores.

        Batches are padded to the fixed serving batch and enqueued back-to-back;
        only the score vectors are fetched (forces completion, tiny transfer).
        """
        n = len(images_u8)
        if n == 0:
            return np.zeros((0,), np.float32)
        pending = []
        for lo in range(0, n, self.batch_size):
            raw = np.asarray(images_u8[lo:lo + self.batch_size])
            chunk = _pad_chunk(raw, self._pad_target(len(raw)))
            pending.append(self._score_fn(self._params, self._put(chunk)))
        return np.concatenate([np.asarray(s) for s in pending])[:n]

    def score_paths(self, paths: Sequence[str], num_workers: int = 4,
                    on_decode_error: str = "raise", return_failed: bool = False):
        """Decode, resize, and score image files; returns (N,) scores.

        Decode of batch k+1 overlaps the device scoring of batch k
        (``_pipelined_batches``; the decode pool runs GIL-free inside the
        native resampler).

        A corrupt file raises :class:`DecodeError` naming the path; with
        ``on_decode_error='skip'`` it is logged and its score set to NaN so the
        remaining 999 files of a 1000-file scan still score. With
        ``return_failed=True`` returns ``(scores, failed_indices)`` — the
        authoritative list of decode-skipped positions, distinct from scores the
        MODEL produced as NaN (e.g. a numerics blowup).
        """
        pending, failed = _pipelined_batches(
            paths, (self.image_size, self.image_size), self.batch_size,
            num_workers, lambda imgs: self._score_fn(self._params, self._put(imgs)),
            on_decode_error=on_decode_error, pad_target=self._pad_target)
        if not pending:
            scores = np.zeros((0,), np.float32)
            return (scores, []) if return_failed else scores
        scores = np.concatenate([np.asarray(s) for s in pending])[:len(paths)]
        if failed:
            scores = scores.copy()
            scores[np.asarray(failed)] = np.nan
        return (scores, list(failed)) if return_failed else scores

    @property
    def has_heatmap(self) -> bool:
        """True when the engine was built with ``with_heatmap=True`` (or loaded
        from an artifact that embeds the heatmap program)."""
        return self._heatmap_fn is not None

    def _require_heatmap(self):
        if self._heatmap_fn is None:
            raise RuntimeError(
                "this engine has no heatmap program; rebuild with "
                "with_heatmap=True (or export/load an artifact from one)")

    def heatmap_array(self, images_u8: np.ndarray):
        """(N,H,W,3) uint8 -> (scores (N,) f32, heatmaps (N,H,W) uint8).

        The heatmap is the model's predicted anomaly map scaled to 0..255;
        scores are computed by the same formula as :meth:`score_array` (inside
        the heatmap program, so one device call yields both).
        """
        self._require_heatmap()
        n = len(images_u8)
        hw = self.image_size
        if n == 0:
            return np.zeros((0,), np.float32), np.zeros((0, hw, hw), np.uint8)
        pending = []
        for lo in range(0, n, self.batch_size):
            raw = np.asarray(images_u8[lo:lo + self.batch_size])
            chunk = _pad_chunk(raw, self._pad_target(len(raw)))
            pending.append(self._heatmap_fn(self._params, self._put(chunk)))
        scores = np.concatenate([np.asarray(s) for s, _ in pending])[:n]
        maps = np.concatenate([np.asarray(m) for _, m in pending])[:n]
        return scores, maps

    def heatmap_paths(self, paths: Sequence[str], num_workers: int = 4,
                      on_decode_error: str = "raise", return_failed: bool = False):
        """Decode image files and produce (scores, heatmaps), streaming batch by
        batch with the same pipelined decode + failure policy as
        :meth:`score_paths` (skipped files: score NaN, heatmap zeroed). Heatmap
        outputs are fetched lag-1 so device buffers stay one batch deep (the
        host accumulates the full result)."""
        self._require_heatmap()
        run, drain = _lagged_host_fetch(
            lambda imgs: self._heatmap_fn(self._params, self._put(imgs)))
        _, failed = _pipelined_batches(
            paths, (self.image_size, self.image_size), self.batch_size,
            num_workers, run, on_decode_error=on_decode_error,
            pad_target=self._pad_target)
        pending = drain()
        if not pending:
            hw = self.image_size
            out = (np.zeros((0,), np.float32), np.zeros((0, hw, hw), np.uint8))
            return out + ([],) if return_failed else out
        scores = np.concatenate([s for s, _ in pending])[:len(paths)]
        maps = np.concatenate([m for _, m in pending])[:len(paths)]
        if failed:
            scores, maps = scores.copy(), maps.copy()
            scores[np.asarray(failed)] = np.nan
            maps[np.asarray(failed)] = 0
        if return_failed:
            return scores, maps, list(failed)
        return scores, maps

    def warmup(self) -> None:
        """Compile every serving program shape up front: each bucket in the
        ladder (or just the full serving batch), for the score program and —
        when present — the heatmap program. Idempotent after the first call
        (jit's per-shape cache)."""
        hw = self.image_size
        for b in (self.bucket_sizes or (self.batch_size,)):
            imgs = np.zeros((b, hw, hw, 3), np.uint8)
            self.score_array(imgs)
            if self._heatmap_fn is not None:
                self.heatmap_array(imgs)

    def throughput(self, n_batches: int = 10) -> float:
        """Measured serving throughput (img/s) on synthetic data; warms compile."""
        rng = np.random.default_rng(0)
        imgs = self._put(rng.integers(
            0, 256, (self.batch_size, self.image_size, self.image_size, 3),
            dtype=np.uint8))
        np.asarray(self._score_fn(self._params, imgs))  # compile
        t0 = time.perf_counter()
        out = [self._score_fn(self._params, imgs) for _ in range(n_batches)]
        s = np.concatenate([np.asarray(x) for x in out])
        assert np.isfinite(s).all()
        return self.batch_size * n_batches / (time.perf_counter() - t0)

    def latency_ms(self, n_iters: int = 50) -> dict:
        """Per-request end-to-end latency (host uint8 -> host score), ms.

        Each iteration is synchronous: host->device transfer, the score-only
        program, and the (N,) score fetch. Build the engine with
        ``batch_size=1`` for online (single-image) serving latency; at larger
        batches this is the per-batch latency. Returns {p50_ms, p95_ms, mean_ms}.
        """
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (self.batch_size, self.image_size,
                                     self.image_size, 3), dtype=np.uint8)
        return _latency_stats_ms(
            lambda: np.asarray(self._score_fn(self._params, self._put(imgs))),
            n_iters)


class SegmentationPredictor:
    """Batched mask-prediction engine for the segmentation workloads.

    Same serving design as AnomalyScorer (fixed-shape batches enqueued
    back-to-back; BN folded; optional int8 PTQ), returning per-image class maps
    as uint8 (a 4x smaller fetch than int32 logits argmax would need) plus a
    per-image mean-confidence scalar. Supports non-square inputs (KolektorSDD's
    1024x512) and sharding each batch over a data x space mesh — ``n_space > 1``
    shards the image HEIGHT so one elongated image's convs split across chips
    (XLA inserts the halo exchanges; numerics proven vs unsharded in
    tests/test_spatial_kolektorsdd.py).
    """

    def __init__(self, predict_fn, params_arg, image_size_hw, batch_size: int,
                 mesh=None, spatial: bool = False,
                 num_classes: Optional[int] = None,
                 quantize: Optional[str] = None,
                 bucket_sizes: Optional[Sequence[int]] = None):
        self._predict_fn = predict_fn
        self._params = params_arg
        self.image_size_hw = tuple(int(x) for x in image_size_hw)
        self.batch_size = int(batch_size)
        self.num_classes = num_classes  # advisory (mask values encode classes)
        self.quantize = quantize  # advisory: 'int8' or None (bf16/f32 program)
        self._mesh = mesh
        self._spatial = spatial
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        self.bucket_sizes = _normalize_buckets(bucket_sizes, self.batch_size,
                                               n_data)
        if mesh is not None:
            from tpu_unet.parallel import replicate
            self._params = replicate(mesh, params_arg)

    def _put(self, chunk: np.ndarray):
        if self._mesh is None:
            return jnp.asarray(chunk)
        from tpu_unet.parallel import shard_batch
        return shard_batch(self._mesh, chunk, spatial=self._spatial)

    def _pad_target(self, n: int) -> int:
        """Smallest compiled batch adequate for ``n`` queued images (see
        AnomalyScorer._pad_target; same bucket-ladder semantics)."""
        if self.bucket_sizes is None:
            return self.batch_size
        return next(b for b in self.bucket_sizes if b >= n)

    @classmethod
    def from_variables(cls, params, batch_stats, *, num_classes: int,
                       image_size_hw=(512, 512), batch_size: int = 16,
                       precision: str = "bf16", quantize: Optional[str] = None,
                       calib_images: Optional[np.ndarray] = None,
                       base_features: int = 64, bilinear: bool = False,
                       dropout: float = 0.1, fold_bn: bool = True,
                       n_devices: Optional[int] = None,
                       n_space: int = 1,
                       qparams: Optional[dict] = None,
                       calib_percentile: Optional[float] = None,
                       bucket_sizes: Optional[Sequence[int]] = None,
                       model_name: str = "seg_unet",
                       deep_supervision: bool = False,
                       heads: int = 4,
                       tile_hw: Optional[Sequence[int]] = None,
                       tile_overlap: int = 64) -> "SegmentationPredictor":
        """``heads`` (unetpp deep-supervision checkpoints only): 4 serves the
        averaged accurate mode; k<4 serves the paper's pruned fast mode — the
        single head X[0][k], whose deeper columns XLA DCEs from the compiled
        program, trading accuracy for per-image cost (heads=1 is ~the L1
        sub-UNet).

        ``tile_hw``: serve NATIVE-resolution images by tiling. ``image_size_hw``
        is then the full input extent and the model runs at ``tile_hw`` (its
        training shape); the static tile grid is sliced, batched through one
        fixed-shape program, and blended back with the overlap window
        (ops/tiling.py). Composes with int8/bilinear/unetpp heads; not with
        ``n_space`` (shard the tile BATCH over 'data' instead — a full-res
        image already fills the device via its tiles)."""
        if quantize not in (None, "none", "int8"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        if quantize == "int8" and model_name not in ("seg_unet", "unetpp",
                                                     "attn_unet"):
            raise ValueError(
                f"int8 quantization is implemented for 'seg_unet', 'unetpp' "
                f"and 'attn_unet', not {model_name!r}; serve it in bf16/f32 "
                f"instead")
        if heads != 4 and not (model_name == "unetpp" and deep_supervision):
            raise ValueError(
                "heads selects a UNet++ deep-supervision inference head; it "
                f"requires model_name='unetpp' with deep_supervision (got "
                f"{model_name!r}, deep_supervision={deep_supervision})")
        if heads != 4:
            # r4 semantics change (advisor note): heads=k<4 is the paper's
            # pruned fast mode — the SINGLE head X[0][k] — not an average of
            # the shallowest k heads. Say so where serving is constructed so
            # outputs are never silently non-comparable to older runs.
            # print(), not logging.info: the serve CLIs configure no logging
            # handlers, so an INFO record would be dropped and the notice
            # would be silent exactly where it matters (advisor r5). The CLIs'
            # user-facing convention is stdout (cli/_seg_common.py:314).
            print(f"unetpp pruned fast mode: serving the single head "
                  f"X[0][{heads}] (not a head average; deeper grid columns "
                  f"are DCE'd)", flush=True)
        tiled = None
        if tile_hw is not None:
            from tpu_unet.ops.tiling import make_tiled_logits_fn
            if n_space > 1:
                raise ValueError(
                    "tiled inference does not compose with --n_space spatial "
                    "sharding (the tile batch already fills the device; "
                    "shard it over 'data' with n_devices instead)")
            # Built here (captures image/tile geometry); the tile forward is
            # plugged in per-path below.
            def tiled(tile_apply):
                return make_tiled_logits_fn(tile_apply, image_size_hw, tile_hw,
                                            tile_overlap)
        # Validate the bucket ladder BEFORE any expensive calibration work
        # (semantics: AnomalyScorer.from_variables bucket_sizes docstring).
        _normalize_buckets(bucket_sizes, batch_size,
                           n_devices if n_devices and n_devices > 1 else 1)
        mesh = None
        if (n_devices is not None and n_devices > 1) or n_space > 1:
            from tpu_unet.parallel import make_mesh
            n_data = n_devices if n_devices else 1
            if batch_size % n_data:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"n_devices {n_data}")
            if n_space > 1 and image_size_hw[0] % n_space:
                raise ValueError(f"image height {image_size_hw[0]} not divisible "
                                 f"by n_space {n_space}")
            mesh = make_mesh(n_data=n_data, n_space=n_space)

        if quantize == "int8":
            from tpu_unet.ops.quantize import (chunk_calibration,
                                               make_quantized_forward,
                                               quantize_from_train_state)
            if qparams is None:
                if calib_images is None:
                    raise ValueError("int8 quantization needs calib_images "
                                     "or a precomputed qparams tree")
                # Calibrate the FULL grid (heads=4) on purpose: the resulting
                # qparams cover every pruned level, so a saved --qparams .npz
                # serves any --heads without recalibrating. Only the quantized
                # FORWARD below prunes.
                qparams = quantize_from_train_state(
                    model_name, params, batch_stats,
                    chunk_calibration(calib_images, 8),
                    percentile=calib_percentile,
                    deep_supervision=deep_supervision)
            fwd = make_quantized_forward(model_name,
                                         deep_supervision=deep_supervision,
                                         heads=heads)
            logits_fn = tiled(fwd) if tiled is not None else fwd

            def predict_fn(qp, images_u8):
                logits = logits_fn(qp, images_u8)
                preds, conf = sliced_pred_confidence(logits)
                return preds, jnp.mean(conf, axis=(1, 2))

            return cls(jax.jit(predict_fn), qparams, image_size_hw, batch_size,
                       mesh=mesh, spatial=n_space > 1, num_classes=num_classes,
                       quantize="int8", bucket_sizes=bucket_sizes)

        policy = get_policy(precision)
        model = build_model(model_name, n_classes=num_classes, bilinear=bilinear,
                            dropout=dropout, policy=policy,
                            base_features=base_features,
                            deep_supervision=deep_supervision, heads=heads)
        if fold_bn:
            params, batch_stats = fold_batchnorm(params, batch_stats)
        variables = {"params": params, "batch_stats": batch_stats}

        def apply_logits(v, images_u8):
            return model.apply(v, eval_transform(images_u8), train=False)

        logits_fn = tiled(apply_logits) if tiled is not None else apply_logits

        def predict_fn(v, images_u8):
            preds, conf = sliced_pred_confidence(logits_fn(v, images_u8))
            return preds, jnp.mean(conf, axis=(1, 2))

        return cls(jax.jit(predict_fn), variables, image_size_hw, batch_size,
                   mesh=mesh, spatial=n_space > 1, num_classes=num_classes,
                   bucket_sizes=bucket_sizes)

    @classmethod
    def from_checkpoint(cls, checkpoint: str, *, num_classes: int,
                        image_size_hw=(512, 512), batch_size: int = 16,
                        precision: str = "bf16", quantize: Optional[str] = None,
                        calib_images: Optional[np.ndarray] = None,
                        base_features: int = 64, bilinear: bool = False,
                        dropout: float = 0.1, n_devices: Optional[int] = None,
                        n_space: int = 1,
                        qparams: Optional[dict] = None,
                        calib_percentile: Optional[float] = None,
                        bucket_sizes: Optional[Sequence[int]] = None,
                        model_name: str = "seg_unet",
                        deep_supervision: bool = False,
                        heads: int = 4,
                        tile_hw: Optional[Sequence[int]] = None,
                        tile_overlap: int = 64) -> "SegmentationPredictor":
        from tpu_unet.train.checkpoint import load_params
        from tpu_unet.train.optim import make_optimizer
        from tpu_unet.train.state import create_train_state

        if heads != 4 and not (model_name == "unetpp" and deep_supervision):
            # Fail before the checkpoint load (the same rule from_variables
            # enforces; a mismatched template would otherwise error first with
            # an opaque restore-tree message).
            raise ValueError(
                "heads selects a UNet++ deep-supervision inference head; it "
                f"requires model_name='unetpp' with deep_supervision (got "
                f"{model_name!r}, deep_supervision={deep_supervision})")
        # heads only selects the eval-time return value — UNetPlusPlus builds
        # every grid node/head param unconditionally, so a heads=k init still
        # produces the full tree the checkpoint expects.
        model = build_model(model_name, n_classes=num_classes, bilinear=bilinear,
                            dropout=dropout, policy=get_policy(precision),
                            base_features=base_features,
                            deep_supervision=deep_supervision, heads=heads)
        # Conv/BN param shapes are input-size independent: init at the TILE
        # shape when tiling (the model's actual running shape) so a huge
        # native-resolution image_size_hw doesn't inflate the one-time init.
        h, w = tile_hw if tile_hw is not None else image_size_hw
        state = create_train_state(model, jax.random.key(0), (1, h, w, 3),
                                   make_optimizer("adam", 1e-3, 0.0))
        state = load_params(state, checkpoint)
        return cls.from_variables(state.params, state.batch_stats,
                                  num_classes=num_classes,
                                  image_size_hw=image_size_hw,
                                  batch_size=batch_size, precision=precision,
                                  quantize=quantize, calib_images=calib_images,
                                  base_features=base_features, bilinear=bilinear,
                                  dropout=dropout, n_devices=n_devices,
                                  n_space=n_space, qparams=qparams,
                                  calib_percentile=calib_percentile,
                                  bucket_sizes=bucket_sizes,
                                  model_name=model_name,
                                  deep_supervision=deep_supervision,
                                  heads=heads, tile_hw=tile_hw,
                                  tile_overlap=tile_overlap)

    def predict_array(self, images_u8: np.ndarray):
        """(N,H,W,3) uint8 -> (masks (N,H,W) uint8, mean_confidence (N,) f32)."""
        n = len(images_u8)
        h, w = self.image_size_hw
        if n == 0:
            return np.zeros((0, h, w), np.uint8), np.zeros((0,), np.float32)
        pending = []
        for lo in range(0, n, self.batch_size):
            raw = np.asarray(images_u8[lo:lo + self.batch_size])
            chunk = _pad_chunk(raw, self._pad_target(len(raw)))
            pending.append(self._predict_fn(self._params, self._put(chunk)))
        masks = np.concatenate([np.asarray(p) for p, _ in pending])[:n]
        confs = np.concatenate([np.asarray(c) for _, c in pending])[:n]
        return masks, confs

    def warmup(self) -> None:
        """Compile every serving program shape up front: each bucket in the
        ladder, or just the full serving batch. Idempotent after the first
        call (jit's per-shape cache)."""
        h, w = self.image_size_hw
        for b in (self.bucket_sizes or (self.batch_size,)):
            self.predict_array(np.zeros((b, h, w, 3), np.uint8))

    def throughput(self, n_batches: int = 10) -> float:
        """Device mask-prediction throughput (img/s); completion forced by the
        (N,) confidence fetch so the axon tunnel's MB-scale mask fetch doesn't
        pollute the figure (production hosts fetch masks over local PCIe)."""
        rng = np.random.default_rng(0)
        h, w = self.image_size_hw
        imgs = self._put(rng.integers(0, 256, (self.batch_size, h, w, 3),
                                      dtype=np.uint8))
        m, c = self._predict_fn(self._params, imgs)
        np.asarray(c)  # compile + force
        t0 = time.perf_counter()
        pend = [self._predict_fn(self._params, imgs) for _ in range(n_batches)]
        confs = np.concatenate([np.asarray(c) for _, c in pend])
        assert np.isfinite(confs).all()
        return self.batch_size * n_batches / (time.perf_counter() - t0)

    def latency_ms(self, n_iters: int = 50) -> dict:
        """Per-request latency (host uint8 -> prediction complete), ms.

        Synchronous per iteration: host->device transfer, the predict program,
        and the (N,) confidence fetch (which forces the masks' completion; the
        mask bytes themselves ride local PCIe in production — fetching them over
        the axon dev tunnel would measure the tunnel, not the chip). Build with
        ``batch_size=1`` for online serving latency. Returns
        {p50_ms, p95_ms, mean_ms}.
        """
        rng = np.random.default_rng(0)
        h, w = self.image_size_hw
        imgs = rng.integers(0, 256, (self.batch_size, h, w, 3), dtype=np.uint8)

        def run_once():
            _, c = self._predict_fn(self._params, self._put(imgs))
            np.asarray(c)

        return _latency_stats_ms(run_once, n_iters)

    def predict_paths(self, paths: Sequence[str], num_workers: int = 4,
                      on_decode_error: str = "raise", return_failed: bool = False):
        """Decode+resize image files and predict, streaming batch by batch
        (decode overlaps device work; mask outputs are fetched lag-1 so device
        buffers stay one batch deep — the host accumulates the full result);
        returns (masks (N,H,W) uint8, mean_confidences (N,)).

        A corrupt file raises :class:`DecodeError` naming the path; with
        ``on_decode_error='skip'`` it is logged, its mask zeroed, and its
        confidence set to NaN. With ``return_failed=True`` returns
        ``(masks, confs, failed_indices)`` — the authoritative decode-skip list,
        distinct from confidences the MODEL produced as NaN."""
        run, drain = _lagged_host_fetch(
            lambda imgs: self._predict_fn(self._params, self._put(imgs)))
        _, failed = _pipelined_batches(
            paths, self.image_size_hw, self.batch_size, num_workers, run,
            on_decode_error=on_decode_error, pad_target=self._pad_target)
        pending = drain()
        if not pending:
            h, w = self.image_size_hw
            masks = np.zeros((0, h, w), np.uint8)
            confs = np.zeros((0,), np.float32)
            return (masks, confs, []) if return_failed else (masks, confs)
        masks = np.concatenate([m for m, _ in pending])[:len(paths)]
        confs = np.concatenate([c for _, c in pending])[:len(paths)]
        if failed:
            masks, confs = masks.copy(), confs.copy()
            masks[np.asarray(failed)] = 0
            confs[np.asarray(failed)] = np.nan
        return (masks, confs, list(failed)) if return_failed else (masks, confs)

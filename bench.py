#!/usr/bin/env python3
"""Benchmark: MVTec-bottle AnomalyUNet training throughput on one TPU chip.

The BASELINE.json north-star config: AnomalyUNet dual-decoder, 256px, batch 16,
Adam + combined MSE-recon/focal-seg loss, bf16 compute. Measures the full jitted
training step (device-side augmentation + fwd + loss + bwd + Adam update) on
device-resident synthetic data, so it isolates chip throughput (the input pipeline
is benchmarked separately by the data-layer tests).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": ratio}

vs_baseline compares against the reference PyTorch implementation's single-CPU
training throughput, measured once by tools/measure_reference_baseline.py into
BASELINE_MEASURED.json (the reference publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

BATCH = 16
IMAGE_SIZE = 256
WARMUP = 3
STEPS = 20

# TPU v5e (v5 litepod) public peak: 197 TFLOP/s bf16, 819 GB/s HBM BW per chip.
PEAK_FLOPS_BF16 = float(os.environ.get("TPU_UNET_PEAK_FLOPS", 197e12))
PEAK_HBM_BPS = float(os.environ.get("TPU_UNET_PEAK_HBM_BPS", 819e9))


def _cost(compiled):
    """(flops, bytes_accessed) from an XLA compiled executable, or (None, None)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        return None, None


def _wait_for_tpu(max_wait_s: float, probe_timeout_s: float = 150.0,
                  interval_s: float = 120.0) -> bool:
    """Wait (bounded) for the TPU backend to come up; True when reachable.

    The axon tunnel has observed outages where backend init hangs indefinitely
    (no exception — see CLAUDE.md), which would hang this whole benchmark. Probe
    in a SUBPROCESS with a timeout (jax is preloaded at interpreter startup in
    this environment but the backend is not initialized, so the probe is what
    pays/tests the init), retrying until ``max_wait_s`` — outages have lasted
    an hour+, so the retry window is generous by default.
    """
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        hung = False
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            hung = True  # the probe itself already waited probe_timeout_s
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        # Progress goes to STDERR: stdout is reserved for the one JSON line.
        print(f"bench: TPU backend unreachable (probe {attempt}); retrying for "
              f"up to {remaining / 60:.0f} more min", file=sys.stderr, flush=True)
        if not hung:
            time.sleep(min(interval_s, remaining))


def _make_synth_mvtec_tree(root: str, n_train: int = 512, src_size: int = 320) -> str:
    """Synthetic on-disk MVTec category for the e2e input-pipeline bench
    (tests/test_data.py::make_mvtec pattern, sized for timing): smooth
    low-frequency PNGs so file size / decode cost resemble photographs rather
    than incompressible noise. Idempotent — a marker file skips regeneration,
    so repeat bench runs (and the persistent decoded pack keyed off these
    files) stay warm.
    """
    from PIL import Image

    cat = os.path.join(root, "bottle")
    marker = os.path.join(root, ".complete")
    params = f"n_train={n_train} src={src_size}\n"
    if os.path.exists(marker):
        # The marker must match THESE parameters — otherwise a bench tweak
        # (say n_train=1024) would silently reuse the stale tree and publish
        # a number measured on the old config (advisor r5).
        with open(marker) as f:
            if f.read() == params:
                return root
        import shutil
        shutil.rmtree(root)
    os.makedirs(os.path.join(cat, "train", "good"), exist_ok=True)
    os.makedirs(os.path.join(cat, "test", "good"), exist_ok=True)
    rng = np.random.default_rng(42)
    rep = src_size // 20
    for i in range(n_train):
        low = rng.integers(0, 256, (20, 20, 3)).astype(np.float32)
        img = np.kron(low, np.ones((rep, rep, 1), np.float32))[:src_size, :src_size]
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(cat, "train", "good", f"{i:04d}.png"))
    with open(marker, "w") as f:
        f.write(params)
    return root


def _bench_train_e2e(mesh, n_chips, model, tx):
    """End-to-end training throughput THROUGH the real input pipeline
    (VERDICT r4 #1): synthetic on-disk PNG tree -> MVTecDataset (decode+resize,
    persistent decoded pack) -> DataLoader prefetch threads -> shard_batch
    device upload over the tunnel -> the same jitted train step program as the
    headline figure (jitted fresh here: masks ship u8, a different aval than
    the AOT headline executable), driven by the REAL epoch driver
    train_anomaly_epoch — the fused analogue of the reference's hot loop,
    which includes its torch DataLoader (/root/reference/src/train_utils.py:
    117-146).

    Warm epoch first (builds the decoded pack, pays PNG decode once — the
    reference pays it EVERY epoch), then best/median of 3 timed epochs.

    Cache layout: the synthetic PNG TREE lives under
    ``~/.cache/tpu_unet_bench/e2e_mvtec``; the decoded-sample PACK built from
    it goes to the default data-cache root (``~/.cache/tpu_unet_data``,
    MVTecDataset's ``disk_cache_dir='auto'``) keyed by the PNGs' content
    fingerprint. To force a cold-pipeline measurement, clear BOTH (clearing
    only the tree also invalidates the pack, since regenerated PNGs re-key it
    — but the stale pack entry lingers on disk).
    """
    from tpu_unet.data import MVTecDataset
    from tpu_unet.data.loader import DataLoader
    from tpu_unet.parallel import replicate, shard_batch
    from tpu_unet.train import (AugmentConfig, create_train_state,
                                make_anomaly_train_step)
    from tpu_unet.train.loop import train_anomaly_epoch

    root = _make_synth_mvtec_tree(
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_unet_bench",
                     "e2e_mvtec"))
    ds = MVTecDataset(root, "bottle", "train", IMAGE_SIZE, is_train=True)
    batch = BATCH * n_chips

    def to_device(b):
        # Binarized masks ship as uint8 {0,1}: exact, and 4x less tunnel
        # traffic than f32 (7.3 -> 4.2 MB per b16 batch with the u8 images).
        out = {}
        for k, v in b.items():
            if k == "mask":
                v = v.astype(np.uint8)
            out[k] = shard_batch(mesh, v) if hasattr(v, "shape") else v
        return out

    loader = DataLoader(ds, batch, shuffle=True, seed=0, drop_last=True,
                        num_workers=8, prefetch=4, transform=to_device)
    est = replicate(mesh, create_train_state(
        model, jax.random.key(7), (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx))
    estep = make_anomaly_train_step(aug_cfg=AugmentConfig(), donate_state=True)
    base_key = jax.random.key(0)
    # Warm epoch: decoded-pack build + loader threads spun up + the one step
    # compile for the u8-mask aval (persistent XLA cache across runs).
    est, _ = train_anomaly_epoch(est, estep, loader, base_key, 0)
    n_epoch = (len(ds) // batch) * batch
    trial_ips = []
    for e in range(1, 4):
        t0 = time.perf_counter()
        est, out = train_anomaly_epoch(est, estep, loader, base_key, e)
        dt = time.perf_counter() - t0
        assert np.isfinite(out["total_loss"]), out
        trial_ips.append(round(n_epoch / dt / n_chips, 2))
    return {
        "images_per_sec_per_chip": max(trial_ips),
        "median_images_per_sec_per_chip": round(float(np.median(trial_ips)), 2),
        "trial_images_per_sec": trial_ips,
        "images_per_epoch": n_epoch,
        "pipeline": "on-disk 320^2 PNG -> decoded-pack 256^2 u8 -> loader "
                    "threads (prefetch=4) -> u8 image+mask device upload "
                    "(4.2 MB/b16 batch) -> jitted train step",
    }


def main():
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()

    # Probing only matters when we're pointed at the (outage-prone) TPU tunnel;
    # a CPU run (JAX_PLATFORMS=cpu) initializes locally and can't hang.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" not in platforms.split(","):
        wait_s = float(os.environ.get("TPU_UNET_BENCH_WAIT_S", 2700))
        if not _wait_for_tpu(wait_s):
            print(json.dumps({
                "metric": "mvtec_bottle_anomaly_unet_train_images_per_sec_per_chip",
                "value": None,
                "unit": "images/sec/chip",
                "vs_baseline": None,
                "error": f"TPU backend unreachable (axon tunnel outage); "
                         f"probed for {wait_s / 60:.0f} min",
            }))
            raise SystemExit(1)

    from tpu_unet.core.precision import BF16_POLICY
    from tpu_unet.models import AnomalyUNet
    from tpu_unet.parallel import make_mesh, replicate, shard_batch
    from tpu_unet.train import (
        AugmentConfig,
        create_train_state,
        make_anomaly_train_step,
        make_optimizer,
    )

    mesh = make_mesh()
    n_chips = int(np.prod(mesh.devices.shape))

    model = AnomalyUNet(policy=BF16_POLICY)
    tx = make_optimizer("adam", 1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0),
                               (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx)
    state = replicate(mesh, state)

    step = make_anomaly_train_step(aug_cfg=AugmentConfig(), donate_state=True)  # default: per_batch_shear rotation

    rng = np.random.default_rng(0)
    batch = BATCH * n_chips
    images = shard_batch(mesh, rng.integers(0, 256, (batch, IMAGE_SIZE, IMAGE_SIZE, 3),
                                            dtype=np.uint8))
    masks = shard_batch(mesh, np.zeros((batch, IMAGE_SIZE, IMAGE_SIZE, 1), np.float32))

    # FLOPs/bytes accounting (XLA cost analysis of the exact compiled programs).
    # step_flops covers the FULL training step (augment+fwd+loss+bwd+Adam): the
    # basis for HFU (hardware FLOP utilization). fwd_flops is the model forward
    # alone; MFU uses the conventional 3x-forward model-FLOPs estimate.
    # The timed step is AOT-compiled ONCE and that same executable is both
    # cost-analyzed and run — no second full-step compile on a cold cache.
    step_compiled = step.lower(state, images, masks, jax.random.key(0)).compile()
    step_flops, step_bytes = _cost(step_compiled)
    step = step_compiled
    fwd = jax.jit(lambda p, s, x: state.apply_fn({"params": p, "batch_stats": s}, x,
                                                 train=False))
    x_f32 = shard_batch(mesh, np.zeros((batch, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32))
    fwd_flops, _ = _cost(fwd.lower(state.params, state.batch_stats, x_f32).compile())

    for i in range(WARMUP):
        state, losses = step(state, images, masks, jax.random.key(i))
    float(losses["total_loss"])

    # Epoch-realistic timing: losses stay on device during the loop (exactly what
    # train_anomaly_epoch does) and are ALL fetched at the end — the fetches force
    # the full chain (block_until_ready alone has been observed not to force the
    # donated-state chain under the axon runtime). Best of 3 timed windows: a
    # transient stall on the shared tunnel/chip inside one window must not
    # publish a bogus figure (see bench_config's docstring; round-3 gear case).
    dt = None
    trial_dts = []
    for _trial in range(3):
        t0 = time.perf_counter()
        acc = []
        for i in range(STEPS):
            state, losses = step(state, images, masks, jax.random.key(100 + i))
            acc.append(losses["total_loss"])
        assert all(np.isfinite(float(v)) for v in acc)
        dt_t = time.perf_counter() - t0
        trial_dts.append(dt_t)
        dt = dt_t if dt is None else min(dt, dt_t)

    images_per_sec = batch * STEPS / dt
    per_chip = images_per_sec / n_chips
    # Best-of-3 is the official figure (peak capability; transient tunnel
    # stalls must not publish a bogus number) — the median is reported next to
    # it so sustained throughput is visible too (advisor r4).
    median_per_chip = batch * STEPS / float(np.median(trial_dts)) / n_chips

    # Secondary: inference throughput (BN-folded eval step) at the BASELINE batch
    # (16, per-batch loss fetch — the eval-loop pattern) and serving-style
    # (batch 128, steps enqueued back-to-back, only the tiny (N,) scores fetched —
    # how a deployment would drive the chip; 3.2x the b16 number, which is
    # host-roundtrip-bound over the tunnel).
    from tpu_unet.ops.fold_bn import fold_batchnorm
    from tpu_unet.train import make_anomaly_eval_step
    folded, stats = fold_batchnorm(state.params, state.batch_stats)
    istate = state.replace(params=folded, batch_stats=stats)
    eval_step = make_anomaly_eval_step()
    out = eval_step(istate, images, masks)
    float(out["losses"]["total_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = eval_step(istate, images, masks)
        float(out["losses"]["total_loss"])
    infer_per_chip = batch * STEPS / (time.perf_counter() - t0) / n_chips

    serve_batch = 128 * n_chips
    imgs_s = shard_batch(mesh, rng.integers(0, 256, (serve_batch, IMAGE_SIZE,
                                                     IMAGE_SIZE, 3), dtype=np.uint8))
    msks_s = shard_batch(mesh, np.zeros((serve_batch, IMAGE_SIZE, IMAGE_SIZE, 1),
                                        np.float32))
    out = eval_step(istate, imgs_s, msks_s)
    float(out["losses"]["total_loss"])
    t0 = time.perf_counter()
    scores = []
    for _ in range(STEPS):
        out = eval_step(istate, imgs_s, msks_s)
        scores.append(out["score"])
    s = np.concatenate([np.asarray(x) for x in scores])
    assert np.isfinite(s).all()
    serve_per_chip = serve_batch * STEPS / (time.perf_counter() - t0) / n_chips

    # Serving path (tpu_unet/serve.py): score-only program (seg decoder DCE'd)
    # in bf16 and int8-quantized. Single-chip jit (serving is per-chip replicas).
    from tpu_unet.serve import AnomalyScorer
    serve_bf16 = AnomalyScorer.from_variables(
        state.params, state.batch_stats, image_size=IMAGE_SIZE,
        batch_size=128).throughput(STEPS)
    calib = rng.integers(0, 256, (32, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8)
    serve_int8 = AnomalyScorer.from_variables(
        state.params, state.batch_stats, image_size=IMAGE_SIZE,
        batch_size=128, quantize="int8", calib_images=calib).throughput(STEPS)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = ref.get("train_images_per_sec_cpu")
        if ref_ips:
            vs_baseline = per_chip / ref_ips

    # Also measure the strict reference-semantics augmentation (per-sample rotation).
    state2 = create_train_state(model, jax.random.key(1),
                                (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx)
    state2 = replicate(mesh, state2)
    step_ps = make_anomaly_train_step(
        aug_cfg=AugmentConfig(rotation_mode="per_sample"), donate_state=True)
    for i in range(WARMUP):
        state2, losses2 = step_ps(state2, images, masks, jax.random.key(i))
    float(losses2["total_loss"])
    t0 = time.perf_counter()
    acc2 = []
    for i in range(STEPS):
        state2, losses2 = step_ps(state2, images, masks, jax.random.key(300 + i))
        acc2.append(losses2["total_loss"])
    assert all(np.isfinite(float(v)) for v in acc2)
    per_sample_per_chip = batch * STEPS / (time.perf_counter() - t0) / n_chips

    # ... and the gather-free independent-angles mode (K-tap banded shears).
    step_pss = make_anomaly_train_step(
        aug_cfg=AugmentConfig(rotation_mode="per_sample_shear"), donate_state=True)
    for i in range(WARMUP):
        state2, losses2 = step_pss(state2, images, masks, jax.random.key(i))
    float(losses2["total_loss"])
    t0 = time.perf_counter()
    acc2 = []
    for i in range(STEPS):
        state2, losses2 = step_pss(state2, images, masks, jax.random.key(400 + i))
        acc2.append(losses2["total_loss"])
    assert all(np.isfinite(float(v)) for v in acc2)
    per_sample_shear_per_chip = batch * STEPS / (time.perf_counter() - t0) / n_chips

    steps_per_sec = per_chip / BATCH
    mfu = hfu = hbm_frac = None
    if fwd_flops:
        mfu = 3.0 * fwd_flops * steps_per_sec / (PEAK_FLOPS_BF16 * n_chips)
    if step_flops:
        hfu = step_flops * steps_per_sec / (PEAK_FLOPS_BF16 * n_chips)
    if step_bytes:
        hbm_frac = step_bytes * steps_per_sec / (PEAK_HBM_BPS * n_chips)

    # ------------------------------------------------------------------
    # Remaining BASELINE.md configs (VERDICT r2 #3): throughput + roofline
    # fractions for every config in one JSON line. Config 2 (AnomalyUNet,
    # the headline) is measured above; config 5's per-category step IS
    # config 2's step (the sweep CLI runs it per category).
    # ------------------------------------------------------------------
    from tpu_unet.train import SegLossConfig, make_seg_train_step

    def bench_config(state_fn, step_fn, imgs, lbls, fwd_builder=None, steps=10,
                     fwd_flops_val=None, trials=3):
        """Time a (donated-state) train step; returns throughput + roofline.

        Best-of-``trials`` timed windows: the round-3 driver capture recorded a
        one-off 56 img/s for the gear config (documented/re-measured: 82) that
        never reproduced — a transient stall on the shared axon tunnel/chip
        inside the single timed window. Taking the fastest of three windows
        publishes the machine's capability, not one window's bad luck; the
        per-trial figures are kept for transparency.
        """
        st = state_fn()
        compiled = step_fn.lower(st, imgs, lbls, jax.random.key(0)).compile()
        fl, by = _cost(compiled)
        r = None
        for i in range(WARMUP):
            r = compiled(st, imgs, lbls, jax.random.key(i))
            st = r[0]
        float(r[1]["total_loss"])
        n = imgs.shape[0]
        trial_ips = []
        dt = None
        for t in range(trials):
            t0 = time.perf_counter()
            accl = []
            for i in range(steps):
                r = compiled(st, imgs, lbls, jax.random.key(500 + i))
                st = r[0]
                accl.append(r[1]["total_loss"])
            assert all(np.isfinite(float(v)) for v in accl)
            dt_t = time.perf_counter() - t0
            trial_ips.append(round(n * steps / dt_t / n_chips, 2))
            dt = dt_t if dt is None else min(dt, dt_t)
        pc = n * steps / dt / n_chips
        sps = n * steps / dt / n  # global steps/sec
        out = {"images_per_sec_per_chip": round(pc, 2),
               "median_images_per_sec_per_chip": round(
                   float(np.median(trial_ips)), 2),
               "trial_images_per_sec": trial_ips}
        if fl:
            out["hfu"] = round(fl * sps / (PEAK_FLOPS_BF16 * n_chips), 3)
        if by:
            out["hbm_bw_fraction"] = round(by * sps / (PEAK_HBM_BPS * n_chips), 3)
        ffl = fwd_flops_val
        if ffl is None and fwd_builder is not None:
            ffl, _ = _cost(fwd_builder())
        if ffl:
            out["mfu"] = round(3.0 * ffl * sps / (PEAK_FLOPS_BF16 * n_chips), 3)
        return out

    configs = {}

    # Config 1: standard UNet (single decoder), MVTec 256px b16, focal loss.
    from tpu_unet.models import UNet, SegmentationUNet
    unet = UNet(n_classes=1, policy=BF16_POLICY)

    def unet_state():
        return replicate(mesh, create_train_state(
            unet, jax.random.key(2), (1, IMAGE_SIZE, IMAGE_SIZE, 3), tx))

    ustep = make_anomaly_train_step(aug_cfg=AugmentConfig(), donate_state=True,
                                    dual_decoder=False)
    ust = unet_state()
    configs["1_unet_focal_256_b16"] = bench_config(
        unet_state, ustep, images, masks,
        fwd_builder=lambda: jax.jit(
            lambda p, s, x: unet.apply({"params": p, "batch_stats": s}, x,
                                       train=False)
        ).lower(ust.params, ust.batch_stats, x_f32).compile())
    del ust

    configs["2_anomaly_unet_256_b16"] = {
        "images_per_sec_per_chip": round(per_chip, 2),
        "mfu": round(mfu, 3) if mfu is not None else None,
        "hfu": round(hfu, 3) if hfu is not None else None,
        "hbm_bw_fraction": round(hbm_frac, 3) if hbm_frac is not None else None,
    }

    # Config 3: AnomalyUNet + SSIM reconstruction loss (+cosine schedule — a
    # host-side LR injection with zero step-time effect). Reuses the final
    # primary state (donated into this bench).
    from tpu_unet.train.steps import AnomalyLossConfig
    sstep = make_anomaly_train_step(AnomalyLossConfig(recon_loss_type="ssim"),
                                    AugmentConfig(), donate_state=True)
    # Same model as config 2 -> same forward FLOPs (state is donated into this
    # bench, so its params can't be re-lowered afterwards).
    configs["3_anomaly_unet_ssim_256_b16"] = bench_config(
        lambda: state, sstep, images, masks, fwd_flops_val=fwd_flops)

    # Config 4: KolektorSDD seg training, 1024x512 b8, class weights 1:50:50.
    seg3 = SegmentationUNet(n_classes=3, policy=BF16_POLICY)

    def ksdd_state():
        return replicate(mesh, create_train_state(
            seg3, jax.random.key(3), (1, 1024, 512, 3), tx))

    kstep = make_seg_train_step(3, SegLossConfig(class_weights=(1.0, 50.0, 50.0)),
                                AugmentConfig(degrees=5.0), donate_state=True)
    kb = 8 * n_chips
    kimgs = shard_batch(mesh, rng.integers(0, 256, (kb, 1024, 512, 3),
                                           dtype=np.uint8))
    klbls = shard_batch(mesh, rng.integers(0, 3, (kb, 1024, 512)).astype(np.int32))
    kst = ksdd_state()
    configs["4_kolektorsdd_1024x512_b8"] = bench_config(
        ksdd_state, kstep, kimgs, klbls,
        fwd_builder=lambda: jax.jit(
            lambda p, s, x: seg3.apply({"params": p, "batch_stats": s}, x,
                                       train=False)
        ).lower(kst.params, kst.batch_stats,
                jax.device_put(np.zeros((kb, 1024, 512, 3), np.float32),
                               kimgs.sharding)).compile())
    del kst, kimgs, klbls

    # Config 5 note + Gear (the third workload, same seg step at 512² b8).
    # End-to-end 15-category proof: tools/sweep15_synthetic_result.json
    # (cli/sweep_mvtec over a synthetic 15-category tree; shape pinned in
    # tests/test_e2e_mvtec.py::test_sweep15_committed_artifact_shape).
    configs["5_sweep_per_category"] = "config 2's step per category (sweep CLI)"
    seg4 = SegmentationUNet(n_classes=4, policy=BF16_POLICY)

    def gear_state():
        return replicate(mesh, create_train_state(
            seg4, jax.random.key(4), (1, 512, 512, 3), tx))

    gstep = make_seg_train_step(4, SegLossConfig(), AugmentConfig(
        degrees=10.0, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1),
        donate_state=True)
    gb = 8 * n_chips
    gimgs = shard_batch(mesh, rng.integers(0, 256, (gb, 512, 512, 3),
                                           dtype=np.uint8))
    glbls = shard_batch(mesh, rng.integers(0, 4, (gb, 512, 512)).astype(np.int32))
    gst = gear_state()
    configs["gear_512_b8"] = bench_config(
        gear_state, gstep, gimgs, glbls,
        fwd_builder=lambda: jax.jit(
            lambda p, s, x: seg4.apply({"params": p, "batch_stats": s}, x,
                                       train=False)
        ).lower(gst.params, gst.batch_stats,
                jax.device_put(np.zeros((gb, 512, 512, 3), np.float32),
                               gimgs.sharding)).compile())
    del gst, gimgs, glbls

    # End-to-end training through the REAL input pipeline (VERDICT r4 #1): the
    # fused loader->upload->step epoch at the headline config, published next
    # to the device-resident figure.
    e2e = _bench_train_e2e(mesh, n_chips, model, tx)

    print(json.dumps({
        "metric": "mvtec_bottle_anomaly_unet_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "median_images_per_sec_per_chip": round(median_per_chip, 2),
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        # Fused host->chip epoch (real loader + decoded pack + device upload +
        # the same compiled step); ratio vs the device-resident headline shows
        # the input pipeline's cost on this host/tunnel.
        "train_e2e_images_per_sec_per_chip": e2e["images_per_sec_per_chip"],
        "train_e2e_vs_device_only": round(
            e2e["images_per_sec_per_chip"] / per_chip, 3),
        "train_e2e": e2e,
        "infer_images_per_sec_per_chip": round(infer_per_chip, 2),
        "infer_serving_b128_images_per_sec_per_chip": round(serve_per_chip, 2),
        # tpu_unet/serve.py: score-only program (seg decoder DCE'd) + int8 PTQ
        "serve_score_only_b128_images_per_sec_per_chip": round(serve_bf16, 2),
        "serve_int8_b128_images_per_sec_per_chip": round(serve_int8, 2),
        "train_per_sample_rotation_images_per_sec_per_chip": round(per_sample_per_chip, 2),
        "train_per_sample_shear_rotation_images_per_sec_per_chip": round(per_sample_shear_per_chip, 2),
        "batch": BATCH,
        "image_size": IMAGE_SIZE,
        # Roofline accounting (XLA cost analysis; peaks: v5e 197 TFLOP/s bf16,
        # 819 GB/s HBM). MFU = 3*fwd model FLOPs; HFU = full-step FLOPs.
        "mfu": round(mfu, 3) if mfu is not None else None,
        "hfu": round(hfu, 3) if hfu is not None else None,
        "hbm_bw_fraction": round(hbm_frac, 3) if hbm_frac is not None else None,
        "step_flops": step_flops,
        "fwd_flops": fwd_flops,
        "step_hbm_bytes": step_bytes,
        "peak_flops_bf16": PEAK_FLOPS_BF16,
        # Throughput + roofline for every BASELINE.md config (VERDICT r2 #3).
        "baseline_configs": configs,
    }))


if __name__ == "__main__":
    main()

"""AOT-exported serving artifacts (jax.export): checkpoint-free deployment.

The serving engines (tpu_unet/serve.py) rebuild their XLA program from Flax
model code + an Orbax checkpoint (+ int8 calibration) at every load. An
*artifact* snapshots the finished program instead: :func:`export_artifact`
serializes the engine's jitted serving function — with the trained (BN-folded,
optionally int8-quantized) parameters baked in as constants — to a directory,
and :func:`load_artifact` turns it back into a fully functional engine without
touching model code, checkpoints, or calibration data. The deployable unit
becomes one self-contained directory, immune to model-definition drift.

No reference counterpart (the reference has no serving layer at all,
SURVEY.md §2.9-2.11 stop at per-experiment test scripts); this is the
TPU-native analogue of torch.jit.save/load for the serving path.

Layout: ``<dir>/meta.json`` (engine kind, batch/image geometry, precision,
lowering platforms) + ``<dir>/program.jaxexport`` (the serialized StableHLO
module) + optional ``<dir>/heatmap.jaxexport`` (the anomaly-heatmap program,
present when the engine was built ``with_heatmap=True``). Artifacts are per-chip programs: mesh-sharded engines are rejected —
export a per-chip engine and replicate it across serving processes instead.
Artifacts execute only on the platform family they were lowered for (pass
``platforms=("tpu", "cpu")`` to export a multi-platform module); jax.export
enforces this at call time. Sizes run ~1 byte/param-byte (the params are
embedded) — 124 MB measured for the bf16 AnomalyUNet scorer. Because the
params are constants here (vs jit arguments in the live engine), XLA may
constant-fold slightly differently: measured score drift vs the live engine is
~1e-5 relative (exactly 0 in the f32 unit tests).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from tpu_unet.serve import AnomalyScorer, SegmentationPredictor

_META_NAME = "meta.json"
_PROGRAM_NAME = "program.jaxexport"
_HEATMAP_NAME = "heatmap.jaxexport"  # optional second program (with_heatmap)
_FORMAT_VERSION = 1


def export_artifact(engine: Union[AnomalyScorer, SegmentationPredictor],
                    out_dir: str,
                    platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize a serving engine's compiled-shape program to ``out_dir``.

    ``platforms``: lowering platforms (e.g. ``("tpu", "cpu")``); defaults to
    the current backend. Returns the written meta dict.
    """
    if getattr(engine, "_mesh", None) is not None:
        raise ValueError(
            "artifacts are per-chip programs; export an engine built without "
            "n_devices/n_space and replicate the artifact across processes")
    if isinstance(engine, AnomalyScorer):
        kind = "anomaly_scorer"
        h = w = engine.image_size
        inner = engine._score_fn
    elif isinstance(engine, SegmentationPredictor):
        kind = "segmentation_predictor"
        h, w = engine.image_size_hw
        inner = engine._predict_fn
    else:
        raise TypeError(f"unsupported engine type {type(engine).__name__}")

    params = engine._params  # baked into the exported module as constants
    fn = jax.jit(lambda images_u8: inner(params, images_u8))
    spec = jax.ShapeDtypeStruct((engine.batch_size, h, w, 3), jnp.uint8)
    plats = list(platforms) if platforms is not None else None
    exported = jax.export.export(fn, platforms=plats)(spec)
    heatmap_fn = getattr(engine, "_heatmap_fn", None)
    exported_heatmap = None
    if heatmap_fn is not None:
        hm = jax.jit(lambda images_u8: heatmap_fn(params, images_u8))
        exported_heatmap = jax.export.export(hm, platforms=plats)(spec)

    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": kind,
        "batch_size": engine.batch_size,
        "image_size_hw": [int(h), int(w)],
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    if getattr(engine, "num_classes", None) is not None:
        meta["num_classes"] = int(engine.num_classes)
    if getattr(engine, "quantize", None):
        meta["quantize"] = engine.quantize
    if exported_heatmap is not None:
        meta["with_heatmap"] = True
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM_NAME), "wb") as f:
        f.write(exported.serialize())
    if exported_heatmap is not None:
        with open(os.path.join(out_dir, _HEATMAP_NAME), "wb") as f:
            f.write(exported_heatmap.serialize())
    with open(os.path.join(out_dir, _META_NAME), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_artifact(artifact_dir: str) -> Union[AnomalyScorer, SegmentationPredictor]:
    """Rehydrate an exported artifact into a serving engine.

    The returned engine exposes the full serving surface (score_array /
    predict_array, *_paths with pipelined decode, throughput, latency_ms) —
    backed by the deserialized program, no model code or checkpoint involved.
    """
    meta_path = os.path.join(artifact_dir, _META_NAME)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"not a serving artifact (no {_META_NAME}): "
                                f"{artifact_dir!r}")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported artifact format_version "
                         f"{meta.get('format_version')!r} in {artifact_dir!r}")
    program_path = os.path.join(artifact_dir, _PROGRAM_NAME)
    if not os.path.exists(program_path):
        raise FileNotFoundError(f"corrupt serving artifact (has {_META_NAME} "
                                f"but no {_PROGRAM_NAME}): {artifact_dir!r}")
    with open(program_path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    call = jax.jit(exported.call)

    def fn(_params_unused, images_u8):
        return call(images_u8)

    h, w = meta["image_size_hw"]
    if meta["kind"] == "anomaly_scorer":
        if h != w:
            raise ValueError(f"anomaly_scorer artifacts are square; got {h}x{w}")
        heatmap_fn = None
        if meta.get("with_heatmap"):
            heatmap_path = os.path.join(artifact_dir, _HEATMAP_NAME)
            if not os.path.exists(heatmap_path):
                raise FileNotFoundError(
                    f"corrupt serving artifact (meta says with_heatmap but no "
                    f"{_HEATMAP_NAME}): {artifact_dir!r}")
            with open(heatmap_path, "rb") as f:
                hm_call = jax.jit(jax.export.deserialize(f.read()).call)
            heatmap_fn = lambda _p, images_u8: hm_call(images_u8)  # noqa: E731
        return AnomalyScorer(fn, None, image_size=h,
                             batch_size=meta["batch_size"],
                             quantize=meta.get("quantize"),
                             heatmap_fn=heatmap_fn)
    if meta["kind"] == "segmentation_predictor":
        return SegmentationPredictor(fn, None, (h, w),
                                     batch_size=meta["batch_size"],
                                     num_classes=meta.get("num_classes"),
                                     quantize=meta.get("quantize"))
    raise ValueError(f"unknown artifact kind {meta['kind']!r}")

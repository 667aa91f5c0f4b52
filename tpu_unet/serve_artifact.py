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

Layout (format v1, unbucketed engines): ``<dir>/meta.json`` (engine kind,
batch/image geometry, precision, lowering platforms) +
``<dir>/program.jaxexport`` (the serialized StableHLO module, trained params
baked in as constants) + optional ``<dir>/heatmap.jaxexport`` (the
anomaly-heatmap program, present when the engine was built
``with_heatmap=True``).

Format v2 (engines with a ``bucket_sizes`` ladder, serve.py): the params are
stored ONCE in ``<dir>/params.npz`` and passed to the programs as a runtime
argument — baking them into every bucket's module would multiply the artifact
by the ladder length — with one ``program_b<N>.jaxexport`` (and optional
``heatmap_b<N>.jaxexport``) per ladder size; the loaded engine dispatches each
padded batch to its shape's program. Artifacts are per-chip programs: mesh-sharded engines are rejected —
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
from collections.abc import Mapping
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.serve import AnomalyScorer, SegmentationPredictor

_META_NAME = "meta.json"
_PROGRAM_NAME = "program.jaxexport"
_HEATMAP_NAME = "heatmap.jaxexport"  # optional second program (with_heatmap)
_PARAMS_NAME = "params.npz"          # v2 (bucketed): params stored ONCE
_FORMAT_VERSION = 1                  # single-shape, params baked as constants
_FORMAT_VERSION_BUCKETED = 2         # per-bucket programs + shared params file


def _canonicalize(tree):
    """Rebuild a params pytree from plain dict/list/tuple containers with
    jnp-array leaves — the exact structure :func:`_save_tree`/:func:`_load_tree`
    round-trip, so a v2 program's calling convention (jax.export in_tree)
    matches the tree loaded back from disk (FrozenDict and friends would not)."""
    if isinstance(tree, Mapping):
        return {k: _canonicalize(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_canonicalize(v) for v in tree)
    return jnp.asarray(tree)


def _flatten_tree(tree, leaves: list):
    """Canonical tree -> JSON-able structure spec; arrays appended to ``leaves``."""
    if isinstance(tree, dict):
        return {"kind": "dict",
                "items": {k: _flatten_tree(v, leaves) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"kind": type(tree).__name__,
                "items": [_flatten_tree(v, leaves) for v in tree]}
    leaves.append(np.asarray(tree))
    return {"kind": "leaf", "index": len(leaves) - 1}


def _save_tree(tree, path: str) -> None:
    """Persist a canonical params pytree as one .npz: indexed array leaves plus
    an embedded JSON structure spec (keys may contain any character — the spec
    carries them verbatim, unlike path-joined flat keys)."""
    leaves: list = []
    spec = _flatten_tree(tree, leaves)
    np.savez(path, __spec__=np.asarray(json.dumps(spec)),
             **{f"leaf_{i}": a for i, a in enumerate(leaves)})


def _load_tree(path: str):
    """Inverse of :func:`_save_tree`; returns the tree with jnp leaves."""
    data = np.load(path)
    spec = json.loads(str(data["__spec__"]))

    def build(node):
        if node["kind"] == "dict":
            return {k: build(v) for k, v in node["items"].items()}
        if node["kind"] in ("list", "tuple"):
            items = [build(v) for v in node["items"]]
            return items if node["kind"] == "list" else tuple(items)
        return jnp.asarray(data[f"leaf_{node['index']}"])

    return build(spec)


def _bucket_program_name(stem: str, batch: int) -> str:
    return f"{stem}_b{batch}.jaxexport"


def _shape_dispatch(calls: dict, what: str):
    """fn(params, images) that routes to the compiled program for the batch
    shape; engines only ever call it at ladder sizes (``_pad_target``)."""
    def fn(params, images_u8):
        call = calls.get(int(images_u8.shape[0]))
        if call is None:
            raise ValueError(
                f"this bucketed artifact's {what} program is compiled for "
                f"batch sizes {sorted(calls)}; got a batch of "
                f"{int(images_u8.shape[0])}")
        return call(params, images_u8)

    return fn


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

    heatmap_fn = getattr(engine, "_heatmap_fn", None)
    plats = list(platforms) if platforms is not None else None
    buckets = getattr(engine, "bucket_sizes", None)
    os.makedirs(out_dir, exist_ok=True)

    meta = {
        "format_version": (_FORMAT_VERSION_BUCKETED if buckets
                           else _FORMAT_VERSION),
        "kind": kind,
        "batch_size": engine.batch_size,
        "image_size_hw": [int(h), int(w)],
        "jax_version": jax.__version__,
    }
    if getattr(engine, "num_classes", None) is not None:
        meta["num_classes"] = int(engine.num_classes)
    if getattr(engine, "quantize", None):
        meta["quantize"] = engine.quantize
    if heatmap_fn is not None:
        meta["with_heatmap"] = True

    if buckets is None:
        # v1: one program per function, trained params baked in as constants.
        params = engine._params
        fn = jax.jit(lambda images_u8: inner(params, images_u8))
        spec = jax.ShapeDtypeStruct((engine.batch_size, h, w, 3), jnp.uint8)
        exported = jax.export.export(fn, platforms=plats)(spec)
        meta["platforms"] = list(exported.platforms)
        with open(os.path.join(out_dir, _PROGRAM_NAME), "wb") as f:
            f.write(exported.serialize())
        if heatmap_fn is not None:
            hm = jax.jit(lambda images_u8: heatmap_fn(params, images_u8))
            with open(os.path.join(out_dir, _HEATMAP_NAME), "wb") as f:
                f.write(jax.export.export(hm, platforms=plats)(spec).serialize())
    else:
        # v2 (bucketed): params stored ONCE (params.npz) and passed to the
        # programs as a runtime argument — baking them per bucket would
        # multiply the artifact by the ladder length (params dominate: the
        # bf16 AnomalyUNet scorer's v1 module is ~124 MB of constants).
        params = _canonicalize(engine._params)
        _save_tree(params, os.path.join(out_dir, _PARAMS_NAME))
        params_struct = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
        meta["bucket_sizes"] = [int(b) for b in buckets]
        for b in buckets:
            spec = jax.ShapeDtypeStruct((int(b), h, w, 3), jnp.uint8)
            exported = jax.export.export(inner, platforms=plats)(
                params_struct, spec)
            meta["platforms"] = list(exported.platforms)
            name = _bucket_program_name("program", int(b))
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exported.serialize())
            if heatmap_fn is not None:
                hm = jax.export.export(heatmap_fn, platforms=plats)(
                    params_struct, spec)
                name = _bucket_program_name("heatmap", int(b))
                with open(os.path.join(out_dir, name), "wb") as f:
                    f.write(hm.serialize())

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
    version = meta.get("format_version")
    if version not in (_FORMAT_VERSION, _FORMAT_VERSION_BUCKETED):
        raise ValueError(f"unsupported artifact format_version "
                         f"{version!r} in {artifact_dir!r}")

    def deserialize_program(name: str):
        path = os.path.join(artifact_dir, name)
        if not os.path.exists(path):
            raise FileNotFoundError(f"corrupt serving artifact (has "
                                    f"{_META_NAME} but no {name}): "
                                    f"{artifact_dir!r}")
        with open(path, "rb") as f:
            return jax.jit(jax.export.deserialize(f.read()).call)

    params = None
    buckets = None
    if version == _FORMAT_VERSION:
        call = deserialize_program(_PROGRAM_NAME)
        fn = lambda _p, images_u8: call(images_u8)  # noqa: E731
        heatmap_fn = None
        if meta.get("with_heatmap"):
            hm_call = deserialize_program(_HEATMAP_NAME)
            heatmap_fn = lambda _p, images_u8: hm_call(images_u8)  # noqa: E731
    else:
        # v2 (bucketed): shared params file + one program per ladder size,
        # dispatched by the padded batch shape the engine chose.
        params_path = os.path.join(artifact_dir, _PARAMS_NAME)
        if not os.path.exists(params_path):
            raise FileNotFoundError(f"corrupt serving artifact (bucketed but "
                                    f"no {_PARAMS_NAME}): {artifact_dir!r}")
        params = _load_tree(params_path)
        buckets = [int(b) for b in meta["bucket_sizes"]]
        fn = _shape_dispatch(
            {b: deserialize_program(_bucket_program_name("program", b))
             for b in buckets}, "main")
        heatmap_fn = None
        if meta.get("with_heatmap"):
            heatmap_fn = _shape_dispatch(
                {b: deserialize_program(_bucket_program_name("heatmap", b))
                 for b in buckets}, "heatmap")

    h, w = meta["image_size_hw"]
    if meta["kind"] == "anomaly_scorer":
        if h != w:
            raise ValueError(f"anomaly_scorer artifacts are square; got {h}x{w}")
        return AnomalyScorer(fn, params, image_size=h,
                             batch_size=meta["batch_size"],
                             quantize=meta.get("quantize"),
                             heatmap_fn=heatmap_fn,
                             bucket_sizes=buckets)
    if meta["kind"] == "segmentation_predictor":
        return SegmentationPredictor(fn, params, (h, w),
                                     batch_size=meta["batch_size"],
                                     num_classes=meta.get("num_classes"),
                                     quantize=meta.get("quantize"),
                                     bucket_sizes=buckets)
    raise ValueError(f"unknown artifact kind {meta['kind']!r}")

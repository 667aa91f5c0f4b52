"""Serving-batch bucket ladder (serve.py bucket_sizes): ragged chunks pad to
the smallest adequate compiled batch instead of the full serving batch — the
online daemon's low-concurrency cost lever (TF-Serving allowed_batch_sizes
pattern). Pins: ladder normalization/validation, which batch shapes actually
reach the compiled programs, score/mask equality vs the unbucketed engine,
warmup coverage, daemon meta + flush behavior, and CLI flag validation."""

import numpy as np
import pytest

from tpu_unet.serve import (AnomalyScorer, SegmentationPredictor,
                            _normalize_buckets)


def _variables(kind, hw, **kwargs):
    import jax

    from tpu_unet.models import build_model
    from tpu_unet.train import create_train_state, make_optimizer

    model = build_model(kind, base_features=4, **kwargs)
    state = create_train_state(model, jax.random.key(0), (1,) + hw + (3,),
                               make_optimizer("adam", 1e-3, 0.0))
    return state.params, state.batch_stats


def _record_batches(engine, attr):
    """Wrap a compiled-program attribute to record every batch shape it sees."""
    shapes = []
    orig = getattr(engine, attr)

    def wrapped(p, x):
        shapes.append(int(x.shape[0]))
        return orig(p, x)

    setattr(engine, attr, wrapped)
    return shapes


# -- ladder normalization ------------------------------------------------------

def test_normalize_buckets_rules():
    assert _normalize_buckets(None, 8) is None
    assert _normalize_buckets((), 8) is None
    # sorted, deduped, batch_size appended as the implicit top bucket
    assert _normalize_buckets([4, 1, 4], 8) == (1, 4, 8)
    # an explicit top bucket isn't duplicated
    assert _normalize_buckets([2, 8], 8) == (2, 8)
    with pytest.raises(ValueError, match="exceeds"):
        _normalize_buckets([16], 8)
    with pytest.raises(ValueError, match=">= 1"):
        _normalize_buckets([0, 4], 8)
    with pytest.raises(ValueError, match="divisible"):
        _normalize_buckets([1, 4], 8, n_data=2)
    # divisibility applies to the implicit top bucket too
    with pytest.raises(ValueError, match="divisible"):
        _normalize_buckets([3], 9, n_data=2)


def test_from_variables_validates_ladder_early():
    params, bstats = _variables("anomaly_unet", (16, 16))
    with pytest.raises(ValueError, match="exceeds"):
        AnomalyScorer.from_variables(params, bstats, image_size=16,
                                     batch_size=4, precision="f32",
                                     base_features=4, bucket_sizes=[8])
    with pytest.raises(ValueError, match="divisible"):
        AnomalyScorer.from_variables(params, bstats, image_size=16,
                                     batch_size=8, precision="f32",
                                     base_features=4, n_devices=2,
                                     bucket_sizes=[1])


# -- anomaly engine --------------------------------------------------------------

@pytest.fixture(scope="module")
def anomaly_pair():
    """(bucketed engine, plain engine) over identical tiny variables."""
    params, bstats = _variables("anomaly_unet", (16, 16))
    kw = dict(image_size=16, batch_size=8, precision="f32", base_features=4)
    bucketed = AnomalyScorer.from_variables(params, bstats,
                                            bucket_sizes=(2, 4), **kw)
    plain = AnomalyScorer.from_variables(params, bstats, **kw)
    return bucketed, plain


def test_scorer_pads_to_smallest_bucket(anomaly_pair):
    bucketed, plain = anomaly_pair
    assert bucketed.bucket_sizes == (2, 4, 8)
    assert plain.bucket_sizes is None
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (11, 16, 16, 3), dtype=np.uint8)

    shapes = _record_batches(bucketed, "_score_fn")
    got = bucketed.score_array(imgs)
    # chunking stays at batch_size (8), only the ragged tail buckets: 3 -> 4
    assert shapes == [8, 4]
    np.testing.assert_allclose(got, plain.score_array(imgs), rtol=1e-6)

    shapes.clear()
    one = bucketed.score_array(imgs[:1])
    assert shapes == [2]  # smallest bucket adequate for 1
    np.testing.assert_allclose(one, got[:1], rtol=1e-6)


def test_score_paths_buckets_match_plain(anomaly_pair, tmp_path):
    from PIL import Image

    bucketed, plain = anomaly_pair
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    shapes = _record_batches(bucketed, "_score_fn")
    got = bucketed.score_paths(paths, num_workers=2)
    assert shapes == [4]
    np.testing.assert_allclose(got, plain.score_paths(paths, num_workers=2),
                               rtol=1e-6)


def test_warmup_compiles_every_bucket():
    params, bstats = _variables("anomaly_unet", (16, 16))
    eng = AnomalyScorer.from_variables(params, bstats, image_size=16,
                                       batch_size=8, precision="f32",
                                       base_features=4, bucket_sizes=(1, 4),
                                       with_heatmap=True)
    score_shapes = _record_batches(eng, "_score_fn")
    heat_shapes = _record_batches(eng, "_heatmap_fn")
    eng.warmup()
    assert score_shapes == [1, 4, 8]
    assert heat_shapes == [1, 4, 8]


# -- seg engine ------------------------------------------------------------------

def test_seg_predictor_buckets_match_plain():
    params, bstats = _variables("seg_unet", (16, 16), n_classes=3)
    kw = dict(num_classes=3, image_size_hw=(16, 16), batch_size=8,
              precision="f32", base_features=4)
    bucketed = SegmentationPredictor.from_variables(params, bstats,
                                                    bucket_sizes=(1,), **kw)
    plain = SegmentationPredictor.from_variables(params, bstats, **kw)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    shapes = _record_batches(bucketed, "_predict_fn")
    masks, confs = bucketed.predict_array(imgs)
    assert shapes == [1]
    m_ref, c_ref = plain.predict_array(imgs)
    np.testing.assert_array_equal(masks, m_ref)
    np.testing.assert_allclose(confs, c_ref, rtol=1e-6)

    shapes.clear()
    bucketed.warmup()
    assert shapes == [1, 8]


# -- daemon service ----------------------------------------------------------------

def test_service_meta_and_single_request_bucket(anomaly_pair):
    from tpu_unet.serve_http import ServingService

    bucketed, _ = anomaly_pair
    shapes = _record_batches(bucketed, "_score_fn")
    svc = ServingService(bucketed, max_wait_ms=0)
    try:
        svc.warmup()
        assert shapes[:3] == [2, 4, 8]  # ladder compile sweep
        # the warmup probe + a lone live request both flush as the 2-bucket
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="PNG")
        resp = svc.handle("/v1/score", buf.getvalue())
        assert resp["score"] is not None
        assert shapes[3:] == [2, 2]
        assert svc.meta()["bucket_sizes"] == [2, 4, 8]
    finally:
        svc.close()


# -- bucketed AOT artifacts (format v2) --------------------------------------------

def test_tree_npz_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from tpu_unet.serve_artifact import _load_tree, _save_tree

    tree = {
        "layers": {"conv": np.arange(6, dtype=np.int8).reshape(2, 3),
                   "scale": np.float32(0.5) * np.ones(3, np.float32)},
        # '/'-bearing and empty keys must survive verbatim (qparams scales)
        "scales": {"encoder/inc/relu1": np.float32([2.0]), "": np.int32([7])},
        "stack": [np.ones(2), (np.zeros(1), np.full(2, 3.0))],
    }
    path = str(tmp_path / "t.npz")
    _save_tree(tree, path)
    got = _load_tree(path)
    assert isinstance(got["stack"], list) and isinstance(got["stack"][1], tuple)
    flat_a = jax.tree_util.tree_flatten_with_path(tree)
    flat_b = jax.tree_util.tree_flatten_with_path(got)
    assert flat_a[1] == flat_b[1]  # identical treedefs (incl. key order-insensitive)
    for (pa, va), (pb, vb) in zip(flat_a[0], flat_b[0]):
        assert pa == pb
        assert jnp.asarray(va).dtype == vb.dtype
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def _fresh_bucketed_scorer():
    """Export needs a pristine jitted program — the module fixture's fns get
    wrapped by _record_batches, so artifact tests build their own engine."""
    params, bstats = _variables("anomaly_unet", (16, 16))
    return AnomalyScorer.from_variables(params, bstats, image_size=16,
                                        batch_size=8, precision="f32",
                                        base_features=4, bucket_sizes=(2, 4))


def test_bucketed_artifact_roundtrip(tmp_path):
    import json
    import os

    from tpu_unet.serve_artifact import export_artifact, load_artifact

    bucketed = _fresh_bucketed_scorer()
    out = str(tmp_path / "art")
    meta = export_artifact(bucketed, out)
    assert meta["format_version"] == 2
    assert meta["bucket_sizes"] == [2, 4, 8]
    for b in (2, 4, 8):
        assert os.path.exists(os.path.join(out, f"program_b{b}.jaxexport"))
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert not os.path.exists(os.path.join(out, "program.jaxexport"))

    loaded = load_artifact(out)
    assert loaded.bucket_sizes == (2, 4, 8)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    shapes = _record_batches(loaded, "_score_fn")
    np.testing.assert_allclose(loaded.score_array(imgs),
                               bucketed.score_array(imgs), rtol=1e-6)
    assert shapes == [4]
    # a batch shape outside the ladder names the compiled sizes
    with pytest.raises(ValueError, match="compiled for batch sizes"):
        loaded._score_fn(loaded._params, imgs)  # raw 3 is not a bucket

    # meta.json sanity for ops tooling
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["bucket_sizes"] == [2, 4, 8]


def test_bucketed_artifact_heatmap_and_missing_files(tmp_path):
    import os

    from tpu_unet.serve_artifact import export_artifact, load_artifact

    params, bstats = _variables("anomaly_unet", (16, 16))
    eng = AnomalyScorer.from_variables(params, bstats, image_size=16,
                                       batch_size=4, precision="f32",
                                       base_features=4, bucket_sizes=(1,),
                                       with_heatmap=True)
    out = str(tmp_path / "art")
    meta = export_artifact(eng, out)
    assert meta["with_heatmap"] is True
    loaded = load_artifact(out)
    imgs = np.random.default_rng(4).integers(0, 256, (1, 16, 16, 3),
                                             dtype=np.uint8)
    s_ref, m_ref = eng.heatmap_array(imgs)
    s_got, m_got = loaded.heatmap_array(imgs)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-6)
    np.testing.assert_array_equal(m_got, m_ref)

    os.remove(os.path.join(out, "heatmap_b1.jaxexport"))
    with pytest.raises(FileNotFoundError, match="heatmap_b1.jaxexport"):
        load_artifact(out)
    os.remove(os.path.join(out, "params.npz"))
    with pytest.raises(FileNotFoundError, match="params.npz"):
        load_artifact(out)


def test_bucketed_seg_artifact_roundtrip(tmp_path):
    from tpu_unet.serve_artifact import export_artifact, load_artifact

    params, bstats = _variables("seg_unet", (16, 16), n_classes=3)
    eng = SegmentationPredictor.from_variables(
        params, bstats, num_classes=3, image_size_hw=(16, 16), batch_size=4,
        precision="f32", base_features=4, bucket_sizes=(2,))
    out = str(tmp_path / "art")
    export_artifact(eng, out)
    loaded = load_artifact(out)
    assert loaded.bucket_sizes == (2, 4) and loaded.num_classes == 3
    imgs = np.random.default_rng(5).integers(0, 256, (2, 16, 16, 3),
                                             dtype=np.uint8)
    m_ref, c_ref = eng.predict_array(imgs)
    m_got, c_got = loaded.predict_array(imgs)
    np.testing.assert_array_equal(m_got, m_ref)
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-6)


def test_bucketed_artifact_serves_via_service(tmp_path):
    import io

    from PIL import Image

    from tpu_unet.serve_artifact import export_artifact, load_artifact
    from tpu_unet.serve_http import ServingService

    bucketed = _fresh_bucketed_scorer()
    out = str(tmp_path / "art")
    export_artifact(bucketed, out)
    svc = ServingService(load_artifact(out), max_wait_ms=0)
    try:
        svc.warmup()
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="PNG")
        assert svc.handle("/v1/score", buf.getvalue())["score"] is not None
        assert svc.meta()["bucket_sizes"] == [2, 4, 8]
    finally:
        svc.close()


# -- CLI flag validation --------------------------------------------------------------

def test_daemon_cli_bucket_flag_validation(tmp_path):
    from tpu_unet.cli.serve_daemon import build_service, parse_args

    argv = ["--task", "anomaly", "--checkpoint", str(tmp_path / "nope"),
            "--batch_size", "4"]
    with pytest.raises(SystemExit, match="comma-separated"):
        build_service(*parse_args(argv + ["--bucket_sizes", "1,x"]))
    with pytest.raises(SystemExit, match="exceeds"):
        build_service(*parse_args(argv + ["--bucket_sizes", "8"]))

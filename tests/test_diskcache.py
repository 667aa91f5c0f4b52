"""Persistent decoded-sample pack (tpu_unet/data/diskcache.py)."""

import os

import numpy as np
import pytest

from tests.test_data import make_gear, make_mvtec
from tpu_unet.data.diskcache import PackedStore, fingerprint
from tpu_unet.data.mvtec import MVTecDataset


@pytest.fixture()
def mvtec_root(tmp_path):
    return make_mvtec(str(tmp_path / "mv"), n_train=5, n_test_good=2, n_broken=2,
                      size=48)


def _sample_equal(a, b):
    for k in a:
        if isinstance(a[k], str):
            assert a[k] == b[k], k
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_pack_roundtrip_matches_direct_load(mvtec_root, tmp_path):
    cache = str(tmp_path / "cache")
    plain = MVTecDataset(mvtec_root, "bottle", "test", 32, is_train=False,
                         disk_cache_dir=None)
    packed = MVTecDataset(mvtec_root, "bottle", "test", 32, is_train=False,
                          disk_cache_dir=cache)
    assert packed._pack is not None
    for i in range(len(plain)):
        _sample_equal(plain.load(i), packed.load(i))


def test_pack_reopen_skips_decoding(mvtec_root, tmp_path):
    cache = str(tmp_path / "cache")
    ds1 = MVTecDataset(mvtec_root, "bottle", "train", 32, disk_cache_dir=cache)
    ref = [ds1.load(i) for i in range(len(ds1))]

    ds2 = MVTecDataset(mvtec_root, "bottle", "train", 32, disk_cache_dir=cache)
    # Prove the reopened pack never touches the decode path.
    ds2._load_uncached = None  # would raise if called
    for i, r in enumerate(ref):
        _sample_equal(r, ds2.load(i))


def test_pack_invalidated_by_source_change(mvtec_root, tmp_path):
    cache = str(tmp_path / "cache")
    ds1 = MVTecDataset(mvtec_root, "bottle", "train", 32, disk_cache_dir=cache)
    assert ds1._pack is not None
    packs_before = set(os.listdir(cache))

    # Touch one source file -> new fingerprint -> rebuild, old pack untouched.
    some_img = ds1.samples[0].image_path
    os.utime(some_img, (1234567890, 1234567890))
    ds2 = MVTecDataset(mvtec_root, "bottle", "train", 32, disk_cache_dir=cache)
    assert ds2._pack is not None
    assert set(os.listdir(cache)) > packs_before


def test_fingerprint_sensitivity(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    fp1 = fingerprint("tag", [str(p)])
    assert fingerprint("tag2", [str(p)]) != fp1
    p.write_bytes(b"hello!")
    assert fingerprint("tag", [str(p)]) != fp1


def test_gear_pack_with_polygon_masks(tmp_path):
    from tpu_unet.data.gear import GearDataset
    root = make_gear(str(tmp_path / "gear"), n_per_split=3, size=48)
    cache = str(tmp_path / "cache")
    plain = GearDataset(root, "train", (32, 32), disk_cache_dir=None)
    packed = GearDataset(root, "train", (32, 32), disk_cache_dir=cache)
    for i in range(len(plain)):
        _sample_equal(plain.load(i), packed.load(i))
    assert packed.load(0)["mask"].dtype == np.uint8  # 4x smaller pack than int32


def test_env_default_disabled_in_tests(mvtec_root):
    # conftest sets TPU_UNET_DATA_CACHE="" -> 'auto' resolves to no pack.
    ds = MVTecDataset(mvtec_root, "bottle", "train", 32)
    assert ds._pack is None


def test_build_failure_falls_back(monkeypatch, mvtec_root, tmp_path):
    # A loader that explodes mid-build must leave the dataset usable (no pack).
    store = PackedStore.open_or_build(str(tmp_path / "c"), "deadbeef", 3,
                                      lambda i: (_ for _ in ()).throw(OSError("x")),
                                      log=lambda m: None)
    assert store is None

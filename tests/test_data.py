"""Data layer tests against synthetic on-disk fixtures (the real datasets are not
in the repo; SURVEY.md §4 prescribes tiny generated fixtures)."""

import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.data import (
    DataLoader,
    GearDataset,
    KolektorSDDDataset,
    MVTecDataset,
    get_available_categories,
    rasterize_labelme,
)


# ---------------------------------------------------------------------------
# Fixture builders
# ---------------------------------------------------------------------------

def make_mvtec(root, category="bottle", n_train=6, n_test_good=2, n_broken=3, size=32):
    rng = np.random.default_rng(0)
    base = os.path.join(root, category)
    os.makedirs(os.path.join(base, "train", "good"))
    os.makedirs(os.path.join(base, "test", "good"))
    os.makedirs(os.path.join(base, "test", "broken"))
    os.makedirs(os.path.join(base, "ground_truth", "broken"))

    def save_img(path):
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(path)

    for i in range(n_train):
        save_img(os.path.join(base, "train", "good", f"{i:03d}.png"))
    for i in range(n_test_good):
        save_img(os.path.join(base, "test", "good", f"{i:03d}.png"))
    for i in range(n_broken):
        save_img(os.path.join(base, "test", "broken", f"{i:03d}.png"))
        mask = np.zeros((size, size), np.uint8)
        mask[4:10, 4:10] = 255
        Image.fromarray(mask).save(
            os.path.join(base, "ground_truth", "broken", f"{i:03d}_mask.png"))
    return root


def make_gear(root, n_per_split=3, size=64):
    rng = np.random.default_rng(1)
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(root, "images", split))
        os.makedirs(os.path.join(root, "labels", split))
        for i in range(n_per_split):
            Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(
                os.path.join(root, "images", split, f"{i}.jpg"))
            # Two overlapping polygons: pitting (0) square and spalling (1) square.
            with open(os.path.join(root, "labels", split, f"{i}.txt"), "w") as f:
                f.write("0 0.1 0.1 0.5 0.1 0.5 0.5 0.1 0.5\n")
                f.write("1 0.3 0.3 0.7 0.3 0.7 0.7 0.3 0.7\n")
                f.write("2 0.6 0.6 0.9 0.6 0.9 0.9 0.6 0.9\n")
    return root


def make_kolektorsdd(root, n_folders=4, per_folder=3, h=64, w=32):
    rng = np.random.default_rng(2)
    for k in range(n_folders):
        folder = os.path.join(root, f"kos{k:02d}")
        os.makedirs(folder)
        for i in range(per_folder):
            Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
                os.path.join(folder, f"Part{i}.jpg"))
            mask = np.zeros((h, w), np.uint8)
            if (k + i) % 2 == 0:
                mask[10:20, 5:15] = 1
            Image.fromarray(mask).save(os.path.join(folder, f"Part{i}_label.bmp"))
    return root


# ---------------------------------------------------------------------------
# MVTec
# ---------------------------------------------------------------------------

class TestMVTec:
    def test_index_and_loading(self, tmp_path):
        root = make_mvtec(str(tmp_path))
        train = MVTecDataset(root, "bottle", "train", image_size=32, is_train=True)
        test = MVTecDataset(root, "bottle", "test", image_size=32, is_train=False)
        assert len(train) == 6
        assert len(test) == 5  # 2 good + 3 broken
        s = train.load(0)
        assert s["image"].shape == (32, 32, 3) and s["image"].dtype == np.uint8
        assert s["mask"].shape == (32, 32, 1) and s["mask"].max() == 0
        assert s["label"] == 0 and s["anomaly_type"] == "good"

        anomalous = [test.load(i) for i in range(5) if test.samples[i].label == 1]
        assert len(anomalous) == 3
        assert anomalous[0]["mask"].max() == 1.0  # binarized
        assert anomalous[0]["anomaly_type"] == "broken"

    def test_resize(self, tmp_path):
        root = make_mvtec(str(tmp_path))
        ds = MVTecDataset(root, "bottle", "train", image_size=16)
        assert ds.load(0)["image"].shape == (16, 16, 3)

    def test_available_categories(self, tmp_path):
        root = make_mvtec(str(tmp_path))
        os.makedirs(os.path.join(root, "not_a_category"))
        assert get_available_categories(root) == ["bottle"]


# ---------------------------------------------------------------------------
# Gear
# ---------------------------------------------------------------------------

class TestGear:
    def test_priority_resolution(self, tmp_path):
        root = make_gear(str(tmp_path))
        ds = GearDataset(root, "train", image_size=(64, 64), enable_priority_logging=True)
        assert ds.num_classes == 4
        s = ds.load(0)
        mask = s["mask"]
        assert mask.shape == (64, 64)
        vals = set(np.unique(mask).tolist())
        assert vals <= {0, 1, 2, 3}
        # Overlap region (pitting ∩ spalling) must resolve to spalling (2).
        assert mask[25, 25] == 2
        # Pitting-only region stays pitting (1).
        assert mask[10, 10] == 1
        # Scrape-only region stays scrape (3).
        assert mask[50, 50] == 3
        assert ds.priority_stats["files_with_overlaps"] >= 1

    def test_mask_cache_hit(self, tmp_path):
        root = make_gear(str(tmp_path))
        ds = GearDataset(root, "train", image_size=(64, 64))
        m1 = ds.load(0)["mask"]
        m2 = ds.load(0)["mask"]
        np.testing.assert_array_equal(m1, m2)
        assert 0 in ds._mask_cache

    def test_rasterize_matches_pil_reference(self, tmp_path):
        """Raster parity with the reference's PIL-draw implementation on a polygon."""
        label = os.path.join(tmp_path, "poly.txt")
        with open(label, "w") as f:
            f.write("0 0.2 0.1 0.8 0.3 0.6 0.9\n")  # triangle
        ours = rasterize_labelme(label, 40, 40)
        # Reference semantics: PIL polygon fill=1 at final id 1 (pitting).
        im = Image.new("L", (40, 40), 0)
        from PIL import ImageDraw
        ImageDraw.Draw(im).polygon(
            [(int(0.2 * 40), int(0.1 * 40)), (int(0.8 * 40), int(0.3 * 40)),
             (int(0.6 * 40), int(0.9 * 40))], fill=1)
        expect = np.asarray(im, dtype=np.uint8)  # class 0 -> final id 1
        np.testing.assert_array_equal(ours, expect)


    def test_malformed_label_lines_have_defined_behavior(self, tmp_path):
        """Malformed LabelMe lines are skipped, not crashed on: short lines,
        non-numeric fields, <3-point polygons, odd coordinate counts (trailing
        value dropped), unknown class ids (parsed but never composed)."""
        from tpu_unet.data.gear import parse_label_file

        label = os.path.join(tmp_path, "messy.txt")
        with open(label, "w") as f:
            f.write("\n")                                      # empty
            f.write("0 0.1 0.2 0.3\n")                         # too few fields
            f.write("x 0.1 0.2 0.3 0.4 0.5 0.6\n")             # non-numeric class
            f.write("0 a b c d e f\n")                         # non-numeric coords
            f.write("1 0.9 0.9\n")                             # too few fields
            f.write("0 0.5 0.5 0.6 0.5\n")                     # 2 points: parsed, not rasterized
            f.write("7 0.0 0.0 1.0 0.0 1.0 1.0\n")             # unknown class id
            f.write("0 0.0 0.0 0.5 0.0 0.5 0.5 0.0 0.5 0.25\n")  # odd coord count
        polys = parse_label_file(label)
        # Survivors: the 2-point line, the unknown-id triangle, the odd-count square.
        assert [(cid, len(pts)) for cid, pts in polys] == [(0, 2), (7, 3), (0, 4)]

        mask = rasterize_labelme(label, 16, 16)
        assert mask.shape == (16, 16)
        # Unknown id 7 never reaches the composed mask; pitting square -> final id 1.
        assert set(np.unique(mask).tolist()) == {0, 1}
        assert mask[2, 2] == 1  # inside the [0,0.5]^2 square

    def test_rasterize_missing_label_file_returns_zero_mask(self):
        mask = rasterize_labelme("/nonexistent/labels.txt", 8, 8)
        np.testing.assert_array_equal(mask, np.zeros((8, 8), np.uint8))

    def test_num_classes_covers_highest_rasterized_id(self, tmp_path):
        """Mask ids are FIXED (scrape always rasterizes as 3); a split missing a
        lower-id class must still get num_classes 4, not len(names)+1 = 3 with
        out-of-range label 3 (the reference's silent defect,
        /root/reference/src/gear_dataset.py:46)."""
        root = str(tmp_path)
        for split in ("train", "val", "test"):
            os.makedirs(os.path.join(root, "images", split))
            os.makedirs(os.path.join(root, "labels", split))
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
                os.path.join(root, "images", split, "0.jpg"))
            with open(os.path.join(root, "labels", split, "0.txt"), "w") as f:
                f.write("0 0.1 0.1 0.5 0.1 0.5 0.5 0.1 0.5\n")   # pitting -> 1
                f.write("2 0.6 0.6 0.9 0.6 0.9 0.9 0.6 0.9\n")   # scrape  -> 3
        ds = GearDataset(root, "train", image_size=(16, 16), disk_cache_dir=None)
        assert ds.class_names == ["pitting", "scrape"]  # spalling absent
        mask = ds.load(0)["mask"]
        assert mask.max() == 3  # scrape still rasterizes at its fixed id
        assert ds.num_classes == 4  # must cover id 3 despite only 2 named classes

    def test_mask_ships_as_uint8(self, tmp_path):
        """Seg masks are uint8 on host (4x less pack + transfer than int32);
        the jitted steps cast on device."""
        root = make_gear(os.path.join(tmp_path, "g"))
        assert GearDataset(root, "train", image_size=(32, 32),
                           disk_cache_dir=None).load(0)["mask"].dtype == np.uint8
        kroot = make_kolektorsdd(os.path.join(tmp_path, "k"))
        assert KolektorSDDDataset(kroot, "train", image_size=(64, 32),
                                  disk_cache_dir=None).load(0)["mask"].dtype == np.uint8


# ---------------------------------------------------------------------------
# KolektorSDD
# ---------------------------------------------------------------------------

class TestKolektorSDD:
    def test_split_sizes_and_determinism(self, tmp_path):
        root = make_kolektorsdd(str(tmp_path))
        tr = KolektorSDDDataset(root, "train", image_size=(64, 32))
        va = KolektorSDDDataset(root, "val", image_size=(64, 32))
        te = KolektorSDDDataset(root, "test", image_size=(64, 32))
        assert len(tr) + len(va) + len(te) == 12
        assert len(tr) == int(12 * 0.7)
        # Deterministic split membership.
        tr2 = KolektorSDDDataset(root, "train", image_size=(64, 32))
        assert tr.image_paths == tr2.image_paths
        # No overlap between splits.
        assert not (set(tr.image_paths) & set(va.image_paths) & set(te.image_paths))

    def test_mask_values_clipped(self, tmp_path):
        root = make_kolektorsdd(str(tmp_path))
        ds = KolektorSDDDataset(root, "train", image_size=(64, 32))
        s = ds.load(0)
        assert s["image"].shape == (64, 32, 3)
        assert s["mask"].shape == (64, 32)
        assert s["mask"].max() <= 2


# ---------------------------------------------------------------------------
# DataLoader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def load(self, i):
        return {"x": np.full((4, 4), i, np.float32), "path": f"p{i}"}


class TestDataLoader:
    def test_ragged_last_batch_warns_once(self):
        """A ragged final batch (no drop_last/pad_last) means a second XLA
        compile; the loader warns once, then stays quiet."""
        import warnings

        dl = DataLoader(_ToyDataset(10), batch_size=4)
        with pytest.warns(UserWarning, match="recompile"):
            batches = list(dl)
        assert batches[-1]["x"].shape[0] == 2  # still yielded, just warned
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            list(dl)  # second epoch: no repeat warning

    def test_batching_and_len(self):
        dl = DataLoader(_ToyDataset(10), batch_size=4)
        batches = list(dl)
        assert len(dl) == 3 and len(batches) == 3
        assert batches[0]["x"].shape == (4, 4, 4)
        assert batches[-1]["x"].shape == (2, 4, 4)  # partial tail
        assert batches[0]["path"] == ["p0", "p1", "p2", "p3"]

    def test_drop_last(self):
        dl = DataLoader(_ToyDataset(10), batch_size=4, drop_last=True)
        batches = list(dl)
        assert len(batches) == 2
        assert all(b["x"].shape[0] == 4 for b in batches)

    def test_pad_last_with_valid_mask(self):
        dl = DataLoader(_ToyDataset(10), batch_size=4, pad_last=True)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[-1]["x"].shape == (4, 4, 4)  # padded to full
        np.testing.assert_array_equal(batches[-1]["valid"], [True, True, False, False])
        np.testing.assert_array_equal(batches[0]["valid"], [True] * 4)

    def test_shuffle_deterministic_and_epoch_varying(self):
        dl = DataLoader(_ToyDataset(10), batch_size=10, shuffle=True, seed=7)
        e0 = list(dl)[0]["x"][:, 0, 0]
        e1 = list(dl)[0]["x"][:, 0, 0]
        dl2 = DataLoader(_ToyDataset(10), batch_size=10, shuffle=True, seed=7)
        e0b = list(dl2)[0]["x"][:, 0, 0]
        np.testing.assert_array_equal(e0, e0b)  # same seed+epoch => same order
        assert not np.array_equal(e0, e1)       # next epoch reshuffles

    def test_all_samples_seen(self):
        dl = DataLoader(_ToyDataset(10), batch_size=3, shuffle=True)
        seen = sorted(v for b in dl for v in b["x"][:, 0, 0].tolist())
        assert seen == list(map(float, range(10)))

    def test_transform_hook(self):
        dl = DataLoader(_ToyDataset(4), batch_size=2,
                        transform=lambda b: {**b, "x": b["x"] + 1})
        assert list(dl)[0]["x"][0, 0, 0] == 1.0


class TestSampleCache:
    def test_cache_hits_are_identical(self, tmp_path):
        root = make_mvtec(str(tmp_path))
        ds = MVTecDataset(root, "bottle", "train", image_size=32)
        a = ds.load(0)
        b = ds.load(0)
        np.testing.assert_array_equal(a["image"], b["image"])
        assert len(ds._cache) >= 1

    def test_cache_disabled(self, tmp_path):
        root = make_mvtec(str(tmp_path))
        ds = MVTecDataset(root, "bottle", "train", image_size=32, cache_samples=False)
        ds.load(0)
        assert ds._cache is None

    def test_cache_budget(self):
        from tpu_unet.data.cache import SampleCache
        cache = SampleCache(max_bytes=100)
        cache.put(0, {"x": np.zeros(10, np.float64)})   # 80 bytes
        cache.put(1, {"x": np.zeros(10, np.float64)})   # would exceed budget
        assert len(cache) == 1 and cache.get(1) is None


def test_load_mask_bilinear_parity_mode(tmp_path):
    """mask_resize='bilinear' reproduces the reference raster geometry
    (binarize {0,1} -> PIL BILINEAR, uint8 rounding = threshold at 0.5);
    'nearest' and 'bilinear' differ only at the shape boundary."""
    from tpu_unet.data.transforms import load_mask

    # A filled blob + a 1-px diagonal scratch (thin defects are where the two
    # resize semantics actually diverge: bilinear averaging erases sub-pixel
    # structure that nearest sampling keeps).
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - 48, xx - 40)
    mask = np.where(r < 20, 255, 0).astype(np.uint8)
    mask[(r >= 20) & (r < 22)] = 3  # faint nonzero ring: binarize must catch it
    for i in range(70, 94):
        mask[i, i] = 255  # thin scratch
    p = os.path.join(tmp_path, "m.png")
    Image.fromarray(mask).save(p)

    near = load_mask(p, (32, 32), binarize=True, method="nearest")
    bil = load_mask(p, (32, 32), binarize=True, method="bilinear")
    assert set(np.unique(near)) <= {0, 1} and set(np.unique(bil)) <= {0, 1}

    # Reference-style computation, inline: binarize full-res, PIL BILINEAR down.
    ref = np.asarray(Image.fromarray((mask > 0).astype(np.uint8), mode="L")
                     .resize((32, 32), Image.BILINEAR), dtype=np.uint8)
    np.testing.assert_array_equal(bil, ref)

    diff = near != bil
    assert 0 < diff.sum() < 0.15 * near.size  # boundary/thin-structure only
    interior = r[1::3, 1::3] < 12  # deep inside the blob (32x32 grid)
    assert not diff[interior].any()  # deep interior identical

    # No resize -> identical regardless of method.
    near_full = load_mask(p, (96, 96), binarize=True, method="nearest")
    bil_full = load_mask(p, (96, 96), binarize=True, method="bilinear")
    np.testing.assert_array_equal(near_full, bil_full)


def test_mvtec_mask_resize_plumbs_through(tmp_path):
    from tpu_unet.data.mvtec import MVTecDataset

    root = make_mvtec(os.path.join(tmp_path, "mv"), size=48)
    near_ds = MVTecDataset(root, "bottle", "test", image_size=32, is_train=False,
                           disk_cache_dir=None)
    bil_ds = MVTecDataset(root, "bottle", "test", image_size=32, is_train=False,
                          disk_cache_dir=None, mask_resize="bilinear")
    i = len(near_ds) - 1  # a broken sample with a mask
    mn, mb = near_ds.load(i)["mask"], bil_ds.load(i)["mask"]
    assert mn.shape == mb.shape == (32, 32, 1)
    assert set(np.unique(mn)) <= {0.0, 1.0} and set(np.unique(mb)) <= {0.0, 1.0}
    assert mn.sum() > 0 and mb.sum() > 0

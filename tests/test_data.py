import numpy as np
import pytest

from countdetr_tpu.data import Batcher, pick_bucket
from countdetr_tpu.data.fscd147 import FSCD147Exemplars, FSCD147Eval, FSCD147Points
from tests.synth import make_fscd147


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_fscd147(str(tmp_path_factory.mktemp("fscd147")))


def test_exemplars_dataset(data_root):
    ds = FSCD147Exemplars(data_root, "train")
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (96, 128, 3)  # already /32 multiples
    assert s["points"].shape == (3, 2)
    assert s["whs"].shape == (3, 2)
    assert (s["points"] >= 0).all() and (s["points"] <= 1).all()
    # normalized wh should match the synthetic object size / image size
    assert (s["whs"] > 0.03).all() and (s["whs"] < 0.3).all()


def test_points_dataset(data_root):
    ds = FSCD147Points(data_root, "val")
    s = ds[0]
    assert s["points"].shape[1] == 2
    assert s["points"].shape[0] >= 4


def test_eval_dataset(data_root):
    ds = FSCD147Eval(data_root, "test")
    s = ds[0]
    assert s["boxes"].shape[1] == 4
    assert s["exemplar_boxes"].shape == (3, 4)
    # exemplar rects are xyxy normalized
    r = s["exemplar_boxes"]
    assert (r[:, 2] > r[:, 0]).all() and (r[:, 3] > r[:, 1]).all()


def test_pick_bucket():
    buckets = ((384, 384), (384, 512), (384, 672))
    assert pick_bucket(384, 400, buckets) == (384, 512)
    assert pick_bucket(96, 128, buckets) == (384, 384)
    assert pick_bucket(384, 700, buckets) == (384, 672)  # fallback largest


def test_batcher_shapes(data_root):
    ds = FSCD147Exemplars(data_root, "train")
    b = next(iter(Batcher(ds, 4, buckets=((96, 128),), max_points=8)))
    assert b["images"].shape == (4, 96, 128, 3)
    assert b["pad_mask"].shape == (4, 96, 128)
    assert not b["pad_mask"].any()  # exact fit
    assert b["points"].shape == (4, 8, 2)
    assert b["points_valid"].sum() == 4 * 3
    assert b["whs"].shape == (4, 8, 2)
    assert b["batch_valid"].all()


def test_batcher_partial_batch(data_root):
    ds = FSCD147Exemplars(data_root, "val")  # 3 samples, bs 4
    batches = list(Batcher(ds, 4, buckets=((96, 128),), max_points=8))
    assert len(batches) == 1
    assert batches[0]["batch_valid"].tolist() == [True, True, True, False]
    # padded sample must not contribute valid points
    assert batches[0]["points_valid"][3].sum() == 0


def test_cache_mode_bytes_cache(tmp_path_factory, rng):
    """cache_mode caches raw image bytes and returns identical pixels
    (reference cached CocoDetection, torchvision_datasets/coco.py:54-73)."""
    from tests.synth import make_fscd147
    from countdetr_tpu.data.fscd147 import FSCD147Exemplars

    root = make_fscd147(str(tmp_path_factory.mktemp("cache_mode")))
    ds_plain = FSCD147Exemplars(root, "train")
    ds_cached = FSCD147Exemplars(root, "train", cache_mode=True)
    a = ds_plain[0]["image"]
    b = ds_cached[0]["image"]
    b2 = ds_cached[0]["image"]  # second read hits the cache
    assert np.array_equal(a, b) and np.array_equal(b, b2)
    assert len(ds_cached._byte_cache) == 1

"""Bucketed batching edge cases: multi-bucket grouping, oversize fallback,
box-format IO defaults."""

import numpy as np

from countdetr_tpu.data.batching import Batcher, pad_to_bucket, pick_bucket
from countdetr_tpu.data.coco_io import CocoJson, write_coco


class _FakeDs:
    """Images of two different sizes to force two buckets."""

    def __init__(self):
        self.sizes = [(64, 96), (64, 96), (96, 128), (96, 128), (96, 128)]

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        return {
            "image": np.zeros((h, w, 3), np.float32),
            "points": np.full((2, 2), 0.5, np.float32),
            "orig_size": (w, h),
            "image_name": f"{i}.jpg",
        }


def test_batcher_groups_by_bucket():
    ds = _FakeDs()
    buckets = ((64, 96), (96, 128))
    batches = list(Batcher(ds, 2, buckets, max_points=4))
    shapes = sorted(b["images"].shape[1:3] for b in batches)
    # 2 imgs of small bucket -> 1 batch; 3 of large -> 2 batches (one partial)
    assert len(batches) == 3
    assert ((64, 96) in [tuple(s) for s in shapes])
    partial = [b for b in batches if not b["batch_valid"].all()]
    assert len(partial) == 1


def test_pad_to_bucket_oversize_downscales():
    """Oversize images are downscaled (aspect-preserving), never cropped —
    normalized annotations stay valid under a uniform resize but not under
    a crop."""
    img = np.ones((100, 150, 3), np.float32)
    out, mask = pad_to_bucket(img, (96, 128))
    assert out.shape == (96, 128, 3)
    # scale = min(96/100, 128/150) = 128/150 -> content is (85, 128)
    assert not mask[:85, :128].any()
    assert mask[85:, :].all()
    # content pixels keep their value, padding stays zero
    assert np.allclose(out[:85, :128], 1.0)
    assert np.allclose(out[85:, :], 0.0)


def test_batcher_meta_counts_and_truncation_warning():
    """Untruncated n_points lands in meta; truncation warns once."""
    import warnings as _w

    ds = _FakeDs()
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        batches = list(Batcher(ds, 2, ((64, 96), (96, 128)), max_points=1))
    metas = [m for b in batches for m, v in zip(b["meta"], b["batch_valid"]) if v]
    assert all(m["n_points"] == 2 for m in metas)
    assert sum("dropped from the padded arrays" in str(w.message) for w in rec) == 1


def test_batcher_point_tiers_keep_all_points():
    ds = _FakeDs()
    batches = list(
        Batcher(ds, 2, ((64, 96), (96, 128)), max_points=1, point_tiers=(1, 4))
    )
    for b in batches:
        # every sample's points fit its tier: valid count == n_points
        for i, m in enumerate(b["meta"]):
            if b["batch_valid"][i]:
                assert b["points_valid"][i].sum() == m["n_points"]


def test_coco_io_box_format_roundtrip(tmp_path):
    p = str(tmp_path / "x.json")
    write_coco(
        p,
        [{"id": 1, "file_name": "a.jpg", "height": 10, "width": 10}],
        [{"id": 1, "image_id": 1, "bbox": [5, 5, 2, 2], "category_id": 1}],
        box_format="cxcywh",
    )
    c = CocoJson(p)
    assert c.box_format == "cxcywh"
    assert c.anns_for(1)[0]["bbox"] == [5, 5, 2, 2]
    # default when the key is absent
    c2 = CocoJson({"images": [], "annotations": []}, "xywh")
    assert c2.box_format == "xywh"


def test_batcher_num_batches_exact():
    class _SizedDs(_FakeDs):
        def image_size(self, i):
            return self.sizes[i]

    ds = _SizedDs()
    b = Batcher(ds, 2, ((64, 96), (96, 128)), max_points=4)
    assert b.num_batches() == len(list(b))
    b2 = Batcher(ds, 2, ((64, 96), (96, 128)), max_points=4, drop_remainder=True)
    assert b2.num_batches() == len(list(b2))
    # without image_size: falls back to the upper bound
    b3 = Batcher(_FakeDs(), 2, ((64, 96), (96, 128)), max_points=4)
    assert b3.num_batches() >= len(list(b3))


def test_batcher_process_sharding_partitions():
    """Two processes with the same seed see disjoint samples covering the
    whole dataset (the reference DistributedSampler rank slice)."""
    ds = _FakeDs()
    seen = []
    for pi in (0, 1):
        b = Batcher(
            ds, 1, ((64, 96), (96, 128)), max_points=4,
            shuffle=True, seed=7, process_index=pi, process_count=2,
        )
        names = [
            m["image_name"]
            for batch in b
            for m, v in zip(batch["meta"], batch["batch_valid"]) if v
        ]
        seen.append(set(names))
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == {f"{i}.jpg" for i in range(len(ds))}

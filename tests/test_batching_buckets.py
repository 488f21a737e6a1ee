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


def test_pad_to_bucket_oversize_crops():
    img = np.ones((100, 150, 3), np.float32)
    out, mask = pad_to_bucket(img, (96, 128))
    assert out.shape == (96, 128, 3)
    assert not mask.any()  # fully covered after crop


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

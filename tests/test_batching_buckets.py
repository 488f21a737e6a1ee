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


def test_global_schedule_identical_across_processes():
    """Multi-host SPMD contract (the round-2 advisor's high finding): with
    MULTIPLE buckets and shuffling, every process must see the same number
    of steps AND the same (bucket, capacities) shape at each step, and the
    union of per-process slices at step k must equal the single-process
    global batch at step k."""
    ds = _FakeDs()
    buckets = ((64, 96), (96, 128))

    def run(pi, pc, bs):
        b = Batcher(
            ds, bs, buckets, max_points=4, shuffle=True, seed=11,
            process_index=pi, process_count=pc,
        )
        out = []
        for batch in b:
            names = [
                m["image_name"]
                for m, v in zip(batch["meta"], batch["batch_valid"]) if v
            ]
            out.append((tuple(batch["images"].shape[1:3]), names))
        return out

    single = run(0, 1, 2)  # global batch 2
    p0 = run(0, 2, 1)
    p1 = run(1, 2, 1)
    assert len(p0) == len(p1) == len(single)
    for (s_shape, s_names), (a_shape, a_names), (b_shape, b_names) in zip(
        single, p0, p1
    ):
        assert s_shape == a_shape == b_shape  # same XLA program every step
        assert a_names + b_names == s_names  # same global batch, in order


def test_no_sample_permanently_skipped_across_epochs():
    """Epoch-seeded shuffle rotates which samples pad the tail; across 2
    epochs of an uneven dataset every sample is visited by every process
    layout (pre-round-3 the fixed-membership step_cap skipped the same
    samples every epoch)."""
    ds = _FakeDs()  # 5 samples
    b0 = Batcher(ds, 1, ((64, 96), (96, 128)), max_points=4, shuffle=True,
                 seed=3, process_index=0, process_count=2)
    b1 = Batcher(ds, 1, ((64, 96), (96, 128)), max_points=4, shuffle=True,
                 seed=3, process_index=1, process_count=2)
    seen = set()
    for _ in range(2):
        for b in (b0, b1):
            for batch in b:
                seen |= {
                    m["image_name"]
                    for m, v in zip(batch["meta"], batch["batch_valid"]) if v
                }
    assert seen == {f"{i}.jpg" for i in range(len(ds))}


def test_box_tiers_keep_dense_images_whole():
    """box_tiers: a sample with more boxes than max_boxes pads to the next
    tier instead of truncating (the reference's matcher sees ALL targets,
    2nd-stage matcher.py:243-246)."""
    import warnings as _w

    class _BoxDs:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            n = 3 if i == 0 else 9  # dense second sample
            return {
                "image": np.zeros((64, 96, 3), np.float32),
                "boxes": np.tile(
                    np.array([[0.5, 0.5, 0.1, 0.1]], np.float32), (n, 1)
                ),
                "orig_size": (96, 64),
                "image_name": f"{i}.jpg",
            }

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        batches = list(
            Batcher(_BoxDs(), 1, ((64, 96),), max_boxes=4, box_tiers=(4, 16))
        )
    assert not any("dropped from the padded arrays" in str(w.message) for w in rec)
    caps = sorted(b["boxes"].shape[1] for b in batches)
    assert caps == [4, 16]
    for b in batches:
        for i, m in enumerate(b["meta"]):
            if b["batch_valid"][i]:
                assert b["boxes_valid"][i].sum() == m["n_boxes"]

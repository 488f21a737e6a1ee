"""DETR-style augmentations (countdetr_tpu/data/transforms.py vs reference
datasets/transforms.py semantics): flips mirror coordinates, resizes keep
normalized coordinates invariant, crops remap and drop outside targets."""

import numpy as np

from countdetr_tpu.data.transforms import (
    Compose, RandomHorizontalFlip, RandomResize, RandomSizeCrop,
    make_train_transforms,
)


def _sample(h=96, w=128):
    img = np.zeros((h, w, 3), np.float32)
    img[10:20, 30:40] = 1.0
    return {
        "image": img,
        "points": np.array([[0.25, 0.5], [0.75, 0.25]], np.float32),
        "whs": np.array([[0.1, 0.2], [0.2, 0.1]], np.float32),
        "boxes": np.array([[0.25, 0.5, 0.1, 0.2]], np.float32),
        "exemplar_boxes": np.array([[0.2, 0.4, 0.3, 0.6]], np.float32),
    }


def test_hflip_mirrors_coordinates():
    rng = np.random.default_rng(0)
    s = RandomHorizontalFlip(1.0)(_sample(), rng)
    np.testing.assert_allclose(s["points"][:, 0], [0.75, 0.25])
    np.testing.assert_allclose(s["points"][:, 1], [0.5, 0.25])
    np.testing.assert_allclose(s["boxes"][0], [0.75, 0.5, 0.1, 0.2])
    # xyxy stays ordered after flip
    e = s["exemplar_boxes"][0]
    assert e[0] < e[2] and e[1] < e[3]
    np.testing.assert_allclose(e, [0.7, 0.4, 0.8, 0.6])
    # flipping twice restores the image
    s2 = RandomHorizontalFlip(1.0)(s, rng)
    np.testing.assert_allclose(s2["image"], _sample()["image"])


def test_resize_keeps_normalized_coords_and_alignment():
    rng = np.random.default_rng(1)
    t = RandomResize([64], scale_factor=32)
    s = t(_sample(), rng)
    h, w = s["image"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert min(h, w) == 64
    np.testing.assert_allclose(s["points"], _sample()["points"])


def test_crop_remaps_and_drops():
    rng = np.random.default_rng(2)
    s = _sample()
    # deterministic crop: whole-width, top half
    t = RandomSizeCrop(0.99, 1.0, scale_factor=32)
    out = t(s, rng)
    ch, cw = out["image"].shape[:2]
    # every surviving point is inside [0, 1)
    assert (out["points"] >= 0).all() and (out["points"] < 1).all()
    assert len(out["whs"]) == len(out["points"])
    assert (out["exemplar_boxes"] >= 0).all() and (out["exemplar_boxes"] <= 1).all()
    # point at normalized y survives <=> inside crop
    for p0 in _sample()["points"]:
        px, py = p0[0] * 128, p0[1] * 96
        inside = px < cw and py < ch  # top-left anchored crop possible here
        # can't know offset deterministically; just check counts consistent
    assert len(out["points"]) <= 2


def test_make_train_transforms_runs():
    rng = np.random.default_rng(3)
    out = make_train_transforms()( _sample(), rng)
    assert out["image"].ndim == 3
    assert out["image"].shape[0] % 32 == 0

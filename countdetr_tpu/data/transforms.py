"""DETR-style data augmentations on numpy sample dicts (reference
datasets/transforms.py:23-282 — dead code in the reference's FSCD path, the
datasets do their own resize, but part of its capability surface).

Samples are the dicts the dataset readers emit: 'image' (HWC float32),
optional 'points' (k, 2) normalized, 'whs' (k, 2) normalized, 'boxes'
(k, 4) cxcywh normalized, 'exemplar_boxes' (K, 4) xyxy normalized. All
coordinates stay normalized, so pure resizes are coordinate no-ops and
flips/crops are affine updates — simpler than the reference's pixel-space
box arithmetic but the same geometry.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class Compose:
    """(reference transforms.py Compose)"""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Dict, rng=None) -> Dict:
        rng = rng or np.random.default_rng()
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class RandomHorizontalFlip:
    """(reference transforms.py hflip): mirror image + x-coordinates."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample: Dict, rng) -> Dict:
        if rng.random() >= self.p:
            return sample
        s = dict(sample)
        s["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
        if "points" in s:
            p = np.array(s["points"], np.float32)
            p[:, 0] = 1.0 - p[:, 0]
            s["points"] = p
        if "boxes" in s:  # cxcywh: flip center x
            b = np.array(s["boxes"], np.float32)
            b[:, 0] = 1.0 - b[:, 0]
            s["boxes"] = b
        if "exemplar_boxes" in s:  # xyxy: swap and flip
            e = np.array(s["exemplar_boxes"], np.float32)
            x1 = 1.0 - e[:, 2].copy()
            x2 = 1.0 - e[:, 0].copy()
            e[:, 0], e[:, 2] = x1, x2
            s["exemplar_boxes"] = e
        return s


class RandomResize:
    """(reference transforms.py RandomResize): resize the shorter side to a
    random choice from `sizes` (capped by max_size on the longer side).
    Normalized coordinates are scale-invariant, so only pixels change."""

    def __init__(self, sizes: Sequence[int], max_size: Optional[int] = None,
                 scale_factor: int = 32):
        self.sizes = list(sizes)
        self.max_size = max_size
        self.scale_factor = scale_factor

    def __call__(self, sample: Dict, rng) -> Dict:
        from countdetr_tpu.data.batching import _resize_bilinear

        img = sample["image"]
        h, w = img.shape[:2]
        size = int(self.sizes[int(rng.integers(len(self.sizes)))])
        short, long = min(h, w), max(h, w)
        scale = size / short
        if self.max_size is not None and long * scale > self.max_size:
            scale = self.max_size / long
        sf = self.scale_factor
        nh = max(sf, sf * int(h * scale / sf))
        nw = max(sf, sf * int(w * scale / sf))
        s = dict(sample)
        s["image"] = _resize_bilinear(img, nh, nw)
        return s


class RandomSizeCrop:
    """(reference transforms.py RandomSizeCrop): random crop; coordinates
    remap to the crop and out-of-crop points/boxes are dropped."""

    def __init__(self, min_frac: float = 0.5, max_frac: float = 1.0,
                 scale_factor: int = 32):
        self.min_frac = min_frac
        self.max_frac = max_frac
        self.scale_factor = scale_factor

    def __call__(self, sample: Dict, rng) -> Dict:
        img = sample["image"]
        h, w = img.shape[:2]
        sf = self.scale_factor
        fh = rng.uniform(self.min_frac, self.max_frac)
        fw = rng.uniform(self.min_frac, self.max_frac)
        ch = max(sf, sf * int(h * fh / sf))
        cw = max(sf, sf * int(w * fw / sf))
        y0 = int(rng.integers(0, max(h - ch, 0) + 1))
        x0 = int(rng.integers(0, max(w - cw, 0) + 1))
        s = dict(sample)
        s["image"] = np.ascontiguousarray(img[y0 : y0 + ch, x0 : x0 + cw])

        # normalized-coordinate remap: p' = (p * old - off) / new
        def remap_xy(xy):
            out = np.array(xy, np.float32)
            out[:, 0] = (out[:, 0] * w - x0) / cw
            out[:, 1] = (out[:, 1] * h - y0) / ch
            return out

        inside = None
        if "points" in s:
            p = remap_xy(s["points"])
            inside = ((p >= 0.0) & (p < 1.0)).all(axis=1)
            s["points"] = p[inside]
            if "whs" in s:
                whs = np.array(s["whs"], np.float32)
                whs[:, 0] *= w / cw
                whs[:, 1] *= h / ch
                s["whs"] = whs[inside]
        if "boxes" in s:  # cxcywh
            b = np.array(s["boxes"], np.float32)
            b[:, 0] = (b[:, 0] * w - x0) / cw
            b[:, 1] = (b[:, 1] * h - y0) / ch
            b[:, 2] *= w / cw
            b[:, 3] *= h / ch
            keep = (
                (b[:, 0] >= 0.0) & (b[:, 0] < 1.0)
                & (b[:, 1] >= 0.0) & (b[:, 1] < 1.0)
            )
            s["boxes"] = b[keep]
        if "exemplar_boxes" in s:  # xyxy: remap + clip (exemplars must survive)
            e = np.array(s["exemplar_boxes"], np.float32)
            e[:, 0::2] = (e[:, 0::2] * w - x0) / cw
            e[:, 1::2] = (e[:, 1::2] * h - y0) / ch
            s["exemplar_boxes"] = np.clip(e, 0.0, 1.0)
        return s


def make_train_transforms(scale_factor: int = 32) -> Compose:
    """The reference's canonical DETR recipe shape (transforms.py usage in
    upstream DETR): hflip + random resize; crop kept opt-in because FSCD
    supervision (3 exemplars) must survive augmentation."""
    return Compose([
        RandomHorizontalFlip(0.5),
        RandomResize([384, 416, 448, 480], max_size=672,
                     scale_factor=scale_factor),
    ])

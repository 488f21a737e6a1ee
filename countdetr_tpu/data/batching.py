"""Fixed-shape padded batching with (H, W) buckets.

The reference trains at batch_size=1 with fully dynamic shapes
(reference main.py:34) — a non-starter for XLA. Here every sample is padded
into one of a small set of canonical (H, W) buckets (one compiled program per
bucket) with a padding mask, and per-image points/boxes pad to fixed
capacities with validity masks. Batches group same-bucket samples.

A light background-thread prefetcher overlaps host decode with device work
(replacing the reference's unused CUDA-stream prefetcher,
datasets/data_prefetcher.py:23-79).
"""

from __future__ import annotations

import queue
import threading
import warnings
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest-area bucket that fits (h, w); falls back to the largest."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if not fitting:
        return max(buckets, key=lambda b: b[0] * b[1])
    return min(fitting, key=lambda b: b[0] * b[1])


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear HWC resize (pure numpy, align_corners=False convention)."""
    H, W = img.shape[:2]
    ys = (np.arange(h) + 0.5) * (H / h) - 0.5
    xs = (np.arange(w) + 0.5) * (W / w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def pad_to_bucket(img: np.ndarray, bucket: Tuple[int, int]):
    """Pad HWC image with zeros to bucket size; returns (padded, pad_mask).

    Images exceeding the bucket (outliers) are DOWNSCALED to fit, never
    cropped: annotations are normalized to the image content region, so a
    uniform per-axis resize keeps every point/box exactly valid, while a
    crop would silently shift coordinates and strand out-of-crop targets.
    """
    H, W = bucket
    h, w = img.shape[:2]
    if h > H or w > W:
        scale = min(H / h, W / w)
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        img = _resize_bilinear(img, nh, nw)
        h, w = img.shape[:2]
    out = np.zeros((H, W, img.shape[2]), dtype=img.dtype)
    out[:h, :w] = img
    mask = np.ones((H, W), dtype=bool)
    mask[:h, :w] = False
    return out, mask


def pad_rows(x: np.ndarray, n: int, dims: int):
    """Pad (k, dims) array to (n, dims) + validity (n,). Extra rows clipped."""
    x = np.asarray(x, dtype=np.float32).reshape(-1, dims)[:n]
    k = x.shape[0]
    out = np.zeros((n, dims), dtype=np.float32)
    out[:k] = x
    valid = np.zeros((n,), dtype=bool)
    valid[:k] = True
    return out, valid


class Batcher:
    """Groups per-image samples into fixed-shape numpy batches.

    keys handled if present in samples:
      image (HWC) -> images (B,H,W,3) + pad_mask (B,H,W)
      points (k,2) -> points (B,P,2) + points_valid
      whs (k,2)    -> whs (B,P,2)           (aligned with points)
      boxes (k,4)  -> boxes (B,T,4) + boxes_valid
      exemplar_boxes (K,4) -> (B,K,4)
    Everything else is collected into 'meta' (list of per-sample dicts).
    Each meta dict additionally records the UNTRUNCATED 'n_points'/'n_boxes'
    of its sample, so counting ground truth never deflates when a dense
    image exceeds the padded capacity (FSC-147 runs to ~3.7k dots).
    The final partial batch is padded by repeating the last sample, with
    'batch_valid' marking real rows.

    point_tiers: optional ascending point capacities (e.g. (128, 512, 4096)).
    When set, each sample is grouped by the smallest tier that holds ALL its
    points and padded to that tier instead of max_points — used by
    pseudo-label generation, where dropping points would drop pseudo boxes
    (the reference processes every annotated point, engine.py:123-187). One
    compiled program per (bucket, tier) combination.

    process_index/process_count: multi-host data sharding. Membership is
    FIXED (stride over the unshuffled index space, then shuffle within the
    process's own subset) rather than the reference DistributedSampler's
    shuffle-then-slice: under bucketed batching, per-epoch membership
    changes would change each host's batch count every epoch, and SPMD
    training needs all hosts to execute the same number of steps. step_cap
    (set to the cross-host minimum of num_batches()) enforces exact
    lockstep; hosts with more batches skip their surplus that epoch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        buckets: Sequence[Tuple[int, int]],
        max_points: int = 700,
        max_boxes: int = 700,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        point_tiers: Optional[Sequence[int]] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.buckets = tuple(buckets)
        self.max_points = max_points
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.point_tiers = tuple(sorted(point_tiers)) if point_tiers else None
        self.process_index = process_index
        self.process_count = process_count
        self.step_cap: Optional[int] = None
        self.epoch = 0
        self._warned_truncation = False

    def _point_capacity(self, n_pts: int) -> int:
        if self.point_tiers is None:
            return self.max_points
        for t in self.point_tiers:
            if n_pts <= t:
                return t
        return self.point_tiers[-1]

    def _warn_truncated(self, kind: str, n: int, cap: int):
        if not self._warned_truncation:
            self._warned_truncation = True
            warnings.warn(
                f"Batcher: sample has {n} {kind} but capacity is {cap}; "
                f"extra {kind} are dropped from the padded arrays (counting "
                f"GT still uses the untruncated n_{kind} in meta). Raise "
                f"max_{kind} or use point_tiers to keep them all.",
                stacklevel=3,
            )

    def _assemble(self, samples: List[Dict], bucket, pt_cap: int) -> Dict:
        n = len(samples)
        real = n
        while len(samples) < self.bs:
            samples.append(samples[-1])
        batch: Dict = {"meta": [], "bucket": bucket}
        images, masks = [], []
        pts, ptsv, whs, boxes, boxesv, rects = [], [], [], [], [], []
        sampled = []  # 'sampled' spatial prior points (fixed count per image)
        for s in samples:
            img, m = pad_to_bucket(s["image"], bucket)
            images.append(img)
            masks.append(m)
            n_points = n_boxes = 0
            if "points" in s:
                n_points = len(np.asarray(s["points"]).reshape(-1, 2))
                if n_points > pt_cap:
                    self._warn_truncated("points", n_points, pt_cap)
                p, v = pad_rows(s["points"], pt_cap, 2)
                pts.append(p)
                ptsv.append(v)
            if "whs" in s:
                w, _ = pad_rows(s["whs"], pt_cap, 2)
                whs.append(w)
            if "boxes" in s:
                n_boxes = len(np.asarray(s["boxes"]).reshape(-1, 4))
                if n_boxes > self.max_boxes:
                    self._warn_truncated("boxes", n_boxes, self.max_boxes)
                b, v = pad_rows(s["boxes"], self.max_boxes, 4)
                boxes.append(b)
                boxesv.append(v)
            if "exemplar_boxes" in s:
                rects.append(np.asarray(s["exemplar_boxes"], dtype=np.float32))
            if "sampled_points" in s:
                sampled.append(
                    np.asarray(s["sampled_points"], np.float32).reshape(-1, 2)
                )
            meta = {
                k: v for k, v in s.items()
                if k not in ("image", "points", "whs", "boxes",
                             "exemplar_boxes", "sampled_points")
            }
            meta["n_points"] = n_points
            meta["n_boxes"] = n_boxes
            batch["meta"].append(meta)
        batch["images"] = np.stack(images)
        batch["pad_mask"] = np.stack(masks)
        bv = np.zeros((self.bs,), dtype=bool)
        bv[:real] = True
        batch["batch_valid"] = bv
        if pts:
            batch["points"] = np.stack(pts)
            batch["points_valid"] = np.stack(ptsv) & bv[:, None]
        if whs:
            batch["whs"] = np.stack(whs)
        if boxes:
            batch["boxes"] = np.stack(boxes)
            batch["boxes_valid"] = np.stack(boxesv) & bv[:, None]
        if rects:
            batch["exemplar_boxes"] = np.stack(rects)
        if sampled:
            batch["sampled_points"] = np.stack(sampled)
            batch["sampled_points_valid"] = np.ones(
                batch["sampled_points"].shape[:2], dtype=bool
            ) & bv[:, None]
        return batch

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.ds))
        if self.process_count > 1:
            # fixed membership (see class docstring): stride BEFORE shuffle
            order = order[self.process_index :: self.process_count]
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict]:
        order = self._order()
        self.epoch += 1

        emitted = 0
        pending: Dict[Tuple, List[Dict]] = {}
        for i in order:
            s = self.ds[int(i)]
            h, w = s["image"].shape[:2]
            bucket = pick_bucket(h, w, self.buckets)
            n_pts = (
                len(np.asarray(s["points"]).reshape(-1, 2))
                if "points" in s else 0
            )
            pt_cap = self._point_capacity(n_pts)
            key = (bucket, pt_cap)
            pending.setdefault(key, []).append(s)
            if len(pending[key]) == self.bs:
                yield self._assemble(pending.pop(key), bucket, pt_cap)
                emitted += 1
                if self.step_cap is not None and emitted >= self.step_cap:
                    return
        for (bucket, pt_cap), rest in pending.items():
            if rest and not self.drop_remainder:
                if self.step_cap is not None and emitted >= self.step_cap:
                    return
                yield self._assemble(rest, bucket, pt_cap)
                emitted += 1

    def __len__(self):
        # upper bound (bucket fragmentation can add up to n_buckets batches);
        # num_batches() gives the exact count when the dataset supports it
        n = len(self._order())
        return -(-n // self.bs) + len(self.buckets)

    def num_batches(self) -> int:
        """Exact batches per epoch for THIS process. Needs the dataset to
        expose image_size(i) -> (h, w) post-resize (all readers do, via the
        annotation JSON or a header-only image read); falls back to the
        __len__ upper bound otherwise. Bucket membership is a fixed multiset,
        so the count is shuffle-invariant."""
        if not hasattr(self.ds, "image_size") or self.point_tiers:
            return len(self)  # tiers add grouping keys the size scan can't see
        counts: Dict[Tuple[int, int], int] = {}
        for i in self._order():
            b = pick_bucket(*self.ds.image_size(int(i)), self.buckets)
            counts[b] = counts.get(b, 0) + 1
        total = 0
        for c in counts.values():
            total += c // self.bs
            if c % self.bs and not self.drop_remainder:
                total += 1
        return total


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    END = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            if err:
                raise err[0]
            return
        yield item

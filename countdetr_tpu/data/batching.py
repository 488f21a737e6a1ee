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
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest-area bucket that fits (h, w); falls back to the largest."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if not fitting:
        return max(buckets, key=lambda b: b[0] * b[1])
    return min(fitting, key=lambda b: b[0] * b[1])


def pad_to_bucket(img: np.ndarray, bucket: Tuple[int, int]):
    """Pad HWC image with zeros to bucket size; returns (padded, pad_mask).
    If the image exceeds the bucket (outlier), it is center-cropped first."""
    H, W = bucket
    h, w = img.shape[:2]
    if h > H or w > W:
        img = img[:H, :W]
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
    The final partial batch is padded by repeating the last sample, with
    'batch_valid' marking real rows.
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
    ):
        self.ds = dataset
        self.bs = batch_size
        self.buckets = tuple(buckets)
        self.max_points = max_points
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.epoch = 0

    def _assemble(self, samples: List[Dict], bucket) -> Dict:
        n = len(samples)
        real = n
        while len(samples) < self.bs:
            samples.append(samples[-1])
        batch: Dict = {"meta": [], "bucket": bucket}
        images, masks = [], []
        pts, ptsv, whs, boxes, boxesv, rects = [], [], [], [], [], []
        for s in samples:
            img, m = pad_to_bucket(s["image"], bucket)
            images.append(img)
            masks.append(m)
            if "points" in s:
                p, v = pad_rows(s["points"], self.max_points, 2)
                pts.append(p)
                ptsv.append(v)
            if "whs" in s:
                w, _ = pad_rows(s["whs"], self.max_points, 2)
                whs.append(w)
            if "boxes" in s:
                b, v = pad_rows(s["boxes"], self.max_boxes, 4)
                boxes.append(b)
                boxesv.append(v)
            if "exemplar_boxes" in s:
                rects.append(np.asarray(s["exemplar_boxes"], dtype=np.float32))
            batch["meta"].append(
                {k: v for k, v in s.items()
                 if k not in ("image", "points", "whs", "boxes", "exemplar_boxes")}
            )
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
        return batch

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1

        pending: Dict[Tuple[int, int], List[Dict]] = {}
        for i in order:
            s = self.ds[int(i)]
            h, w = s["image"].shape[:2]
            bucket = pick_bucket(h, w, self.buckets)
            pending.setdefault(bucket, []).append(s)
            if len(pending[bucket]) == self.bs:
                yield self._assemble(pending.pop(bucket), bucket)
        for bucket, rest in pending.items():
            if rest and not self.drop_remainder:
                yield self._assemble(rest, bucket)

    def __len__(self):
        # upper bound (bucket fragmentation can add up to n_buckets batches)
        return -(-len(self.ds) // self.bs) + len(self.buckets)


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

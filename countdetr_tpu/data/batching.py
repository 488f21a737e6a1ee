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
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(img.dtype, np.integer):
        out = np.rint(out)  # round, don't truncate, raw uint8 images
    return out.astype(img.dtype)


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


def pack_space_to_depth(images: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), packing each 2x2 pixel block into
    channels (row-phase major, column-phase, then channel:
    out[..., (a*2+b)*C + c] = in[..., 2i+a, 2j+b, c]).

    Why: a 3-channel-minor image tensor is catastrophic on TPU — the (8,128)
    tile uses 3 of 128 lanes, so the device-side f32->bf16 convert and the
    7x7 stem conv together measured 22 ms of a 71 ms eval forward at B=32
    (round-5 profile, scripts/profile_eval.py: convert_element_type.6823
    13.2 ms + stem fusion 9.0 ms). Packing on the HOST (where layout is
    irrelevant — this is a byte shuffle) hands the device a 12-channel
    tensor, and the stem runs as the equivalent 4x4/s1 conv
    (models/resnet.py::StemConv, exact same linear map). The reference
    never needs this: torch GPUs use NCHW where C=3 is not the minor dim.
    """
    B, H, W, C = images.shape
    assert H % 2 == 0 and W % 2 == 0, f"s2d needs even sizes, got {(H, W)}"
    out = images.reshape(B, H // 2, 2, W // 2, 2, C)
    return np.ascontiguousarray(
        out.transpose(0, 1, 3, 2, 4, 5)
    ).reshape(B, H // 2, W // 2, 4 * C)


def unpack_space_to_depth(images: np.ndarray) -> np.ndarray:
    """Inverse of pack_space_to_depth: (B, H/2, W/2, 4C) -> (B, H, W, C)."""
    B, H2, W2, C4 = images.shape
    C = C4 // 4
    out = images.reshape(B, H2, W2, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(out).reshape(B, H2 * 2, W2 * 2, C)


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

    box_tiers: same mechanism for stage-2 target boxes. FSC-147 train images
    carry up to ~3.7k pseudo boxes while max_boxes defaults to 700; the
    reference's matcher sees ALL of them and keeps the best min(Q, T) by
    cost (reference 2nd-stage matcher.py:243-246 on the rectangular
    matrix), so truncating would change the training signal on exactly the
    dense images that dominate counting RMSE. With tiers, dense samples pad
    to a larger capacity instead of being cut.

    process_index/process_count: multi-host data sharding via a GLOBAL batch
    schedule. Every host deterministically computes the identical schedule
    (shared seed + epoch -> shuffled global order -> greedy grouping into
    (bucket, tier) batches of bs * process_count samples) and takes its own
    bs-slice of each global batch. Consequences, all load-bearing for SPMD:
      * every host executes the SAME number of steps per epoch AND the same
        (bucket, tier) shape at each step — hosts can never run mismatched
        XLA programs (the reference's DistributedSampler has no such
        guarantee because it never coordinates shapes);
      * no sample is ever skipped: partial global groups pad by repeating
        (batch_valid masks the padding), and the epoch-seeded shuffle
        rotates which samples land in padded tails;
      * a pc-process run consumes exactly the global batches a 1-process
        run with batch bs*pc would — multi-host equals single-host bit-for
        bit (tests/test_multiprocess.py).
    step_cap optionally truncates the schedule (kept for tooling; lockstep
    no longer needs it).
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
        box_tiers: Optional[Sequence[int]] = None,
        process_index: int = 0,
        process_count: int = 1,
        num_workers: int = 0,
        pack_s2d: bool = False,
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
        self.box_tiers = tuple(sorted(box_tiers)) if box_tiers else None
        self.process_index = process_index
        self.process_count = process_count
        self.step_cap: Optional[int] = None
        self.epoch = 0
        self._warned_truncation = False
        # process-parallel sample loading (data/loader.py); 0 = in-process.
        # The pool spawns lazily on first iteration and persists across
        # epochs.
        self.num_workers = num_workers
        self._loader = None
        # emit images space-to-depth packed (B, H/2, W/2, 12) — see
        # pack_space_to_depth. pad_mask stays at full resolution.
        self.pack_s2d = pack_s2d
        # (bucket, n_points, n_boxes) per sample index — epoch-invariant, so
        # one metadata pass serves every epoch (image_size() header reads /
        # annotation-count lookups are cheap but O(dataset) per call)
        self._meta_cache: Dict[int, Tuple] = {}

    @staticmethod
    def _capacity(n: int, cap: int, tiers) -> int:
        if tiers is None:
            return cap
        for t in tiers:
            if n <= t:
                return t
        return tiers[-1]

    def _point_capacity(self, n_pts: int) -> int:
        return self._capacity(n_pts, self.max_points, self.point_tiers)

    def _box_capacity(self, n_boxes: int) -> int:
        return self._capacity(n_boxes, self.max_boxes, self.box_tiers)

    def _warn_truncated(self, kind: str, n: int, cap: int):
        if not self._warned_truncation:
            self._warned_truncation = True
            warnings.warn(
                f"Batcher: sample has {n} {kind} but capacity is {cap}; "
                f"extra {kind} are dropped from the padded arrays (counting "
                f"GT still uses the untruncated n_{kind} in meta). Raise "
                f"max_{kind} or use point_tiers/box_tiers to keep them all.",
                stacklevel=3,
            )

    def _assemble(
        self, samples: List[Dict], bucket, pt_cap: int, box_cap: int,
        real: Optional[int] = None,
    ) -> Dict:
        real = len(samples) if real is None else real
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
                if n_boxes > box_cap:
                    self._warn_truncated("boxes", n_boxes, box_cap)
                b, v = pad_rows(s["boxes"], box_cap, 4)
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
        if self.pack_s2d:
            batch["images"] = pack_space_to_depth(batch["images"])
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

    def _meta(self, i: int) -> Tuple[Tuple[int, int], int, int]:
        """(bucket, n_points, n_boxes) for sample i WITHOUT decoding pixels
        when the dataset exposes the metadata (image_size / num_points /
        num_boxes — all shipped readers do via annotation JSONs or
        header-only reads); loads the sample once otherwise. Cached: the
        mapping is epoch-invariant."""
        m = self._meta_cache.get(i)
        if m is not None:
            return m
        ds = self.ds
        s = None
        if hasattr(ds, "image_size"):
            h, w = ds.image_size(i)
        else:
            s = ds[i]
            h, w = s["image"].shape[:2]
        bucket = pick_bucket(h, w, self.buckets)

        def count(kind: str, attr: str, dims: int) -> int:
            nonlocal s
            if hasattr(ds, attr):
                return int(getattr(ds, attr)(i))
            if s is None:
                s = ds[i]
            if kind not in s:
                return 0
            return len(np.asarray(s[kind]).reshape(-1, dims))

        # tier grouping is the only consumer of the counts; skip the lookups
        # (and any sample load they might force) when no tiers are configured
        n_pts = count("points", "num_points", 2) if self.point_tiers else 0
        n_boxes = count("boxes", "num_boxes", 4) if self.box_tiers else 0
        m = (bucket, n_pts, n_boxes)
        self._meta_cache[i] = m
        return m

    def _schedule(self) -> List[Tuple[Tuple, List[int], int]]:
        """The epoch's GLOBAL batch schedule: [(key, indices, n_real)] where
        key = (bucket, pt_cap, box_cap), indices has bs * process_count
        entries (partial tails pad by repeating the last real sample), and
        n_real counts the real ones. Deterministic in (seed, epoch), so
        every process computes the identical schedule."""
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        gbs = self.bs * self.process_count
        sched: List[Tuple[Tuple, List[int], int]] = []
        pending: Dict[Tuple, List[int]] = {}
        for i in order:
            bucket, n_pts, n_boxes = self._meta(int(i))
            key = (
                bucket,
                self._point_capacity(n_pts),
                self._box_capacity(n_boxes),
            )
            pending.setdefault(key, []).append(int(i))
            if len(pending[key]) == gbs:
                sched.append((key, pending.pop(key), gbs))
        if not self.drop_remainder:
            for key, rest in pending.items():
                if rest:
                    n_real = len(rest)
                    sched.append(
                        (key, rest + [rest[-1]] * (gbs - n_real), n_real)
                    )
        if self.step_cap is not None:
            sched = sched[: self.step_cap]
        return sched

    def __iter__(self) -> Iterator[Dict]:
        sched = self._schedule()
        self.epoch += 1
        lo = self.process_index * self.bs
        plan = []
        for key, idxs, n_real in sched:
            mine = idxs[lo : lo + self.bs]
            # padding is a global suffix, so this slice's real entries are a
            # prefix; a host entirely past the tail gets an all-padding
            # batch (loads the repeated sample, batch_valid all False)
            my_real = max(0, min(self.bs, n_real - lo))
            plan.append((key, mine, my_real))
        if self.num_workers > 0 and plan:
            from countdetr_tpu.data.loader import (
                SampleLoader, iter_batches_parallel,
            )

            if self._loader is None:
                self._loader = SampleLoader(self.ds, self.num_workers)
            yield from iter_batches_parallel(self, plan)
            return
        for (bucket, pt_cap, box_cap), mine, my_real in plan:
            samples = [self.ds[i] for i in mine]
            yield self._assemble(samples, bucket, pt_cap, box_cap, my_real)

    def __len__(self):
        return self.num_batches()

    def num_batches(self) -> int:
        """Exact batches in the CURRENT epoch — identical on every process
        by construction (the schedule is global). Shuffle-invariant: greedy
        grouping emits ceil(count_key / global_bs) batches per key and the
        per-key multiset of samples doesn't depend on the order."""
        return len(self._schedule())


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

"""FSCD-147 dataset readers (reference datasets/fscd_147.py:11-254 and
2nd-stage data/fsc147.py:12-351), returning plain numpy per-image samples.

Expected data layout (same as the reference):
  {data_path}/annotation_FSC147_384.json    per-image exemplar boxes + points
  {data_path}/Train_Test_Val_FSC_147.json   split lists of image file names
  {data_path}/images_384_VarV2/*.jpg
  {data_path}/instances_{val,test}.json     COCO GT boxes for eval
  {data_path}/annotations/pseudo_bbox_{split}.json   stage-1 output

Per-sample semantics mirror the reference exactly:
  * image resized to (scale_factor * floor(dim / scale_factor)) per side,
    bilinear, then ImageNet-normalized (datasets/fscd_147.py:58-61, 24-26);
  * points/boxes normalized by the ORIGINAL image size;
  * exemplar centers/whs from box_examples_coordinates corners 0 and 2.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from countdetr_tpu.data.coco_io import CocoJson

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(path: str, scale_factor: int = 32,
               byte_cache: Optional[dict] = None,
               decoded_cache: Optional[dict] = None,
               normalize: bool = True):
    """Returns (normalized HWC float32 image, (orig_w, orig_h)); with
    normalize=False, the resized RAW uint8 array instead — the model
    ImageNet-normalizes uint8 inputs on device (models/anchor_detr.py), so
    the host skips the float conversion AND the host->device transfer
    shrinks 4x (1 MB vs 4.2 MB per 592px image).

    byte_cache: optional dict used as an in-RAM raw-bytes cache (the
    reference's cache_mode CocoDetection, torchvision_datasets/coco.py:54-73
    — decode still happens per call, disk IO is skipped).

    decoded_cache: optional dict caching the RESIZED uint8 array (~1 MB per
    FSC-147 image vs ~4 MB float32) — epoch 2+ skip JPEG decode + resize,
    paying only the cheap vectorized normalize. This is the input-pipeline
    fix the reference never needed at batch 1 on GPU but a 533 img/s chip
    does."""
    if decoded_cache is not None and path in decoded_cache:
        try:
            arr8, (w, h) = decoded_cache[path]
        except KeyError:
            pass  # torn disk-cache blob — fall through, re-decode + rewrite
        else:
            if not normalize:
                return arr8, (w, h)
            arr = arr8.astype(np.float32) / 255.0
            return (arr - IMAGENET_MEAN) / IMAGENET_STD, (w, h)
    if byte_cache is not None:
        import io

        if path not in byte_cache:
            with open(path, "rb") as f:
                byte_cache[path] = f.read()
        img = Image.open(io.BytesIO(byte_cache[path]))
    else:
        img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    w, h = img.size
    rw = scale_factor * int(w / scale_factor)
    rh = scale_factor * int(h / scale_factor)
    img = img.resize((rw, rh), Image.BILINEAR)
    arr8 = np.asarray(img, dtype=np.uint8)
    if decoded_cache is not None:
        decoded_cache[path] = (arr8, (w, h))
    if not normalize:
        return arr8, (w, h)
    arr = arr8.astype(np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr, (w, h)


def _exemplar_centers_whs(box_coords) -> np.ndarray:
    """box_examples_coordinates: list of 4-corner boxes; corners 0 and 2 are
    (x1,y1) and (x2,y2) (datasets/fscd_147.py:44-50)."""
    rects = []
    for bc in box_coords:
        x1, y1 = bc[0][0], bc[0][1]
        x2, y2 = bc[2][0], bc[2][1]
        rects.append([x1, y1, x2, y2])
    return np.array(rects, dtype=np.float32)


class FSCD147Base:
    def __init__(self, data_path: str, split: str, scale_factor: int = 32,
                 cache_mode=False):
        # cache_mode: False | True/'bytes' (reference --cache_mode raw-bytes
        # RAM cache) | 'decoded' (per-process resized-uint8 RAM cache) |
        # 'disk:<dir>' (resized-uint8 .npz cache shared across worker
        # processes AND runs — data/cache.py)
        self.data_path = data_path
        self.split = split
        self.scale_factor = scale_factor
        with open(os.path.join(data_path, "annotation_FSC147_384.json")) as f:
            self.annotations = json.load(f)
        with open(os.path.join(data_path, "Train_Test_Val_FSC_147.json")) as f:
            self.data_split = json.load(f)[split]
        self.im_dir = os.path.join(data_path, "images_384_VarV2")
        from countdetr_tpu.data.cache import decoded_cache_from_mode

        self._byte_cache: Optional[dict] = (
            {} if cache_mode in (True, "bytes") else None
        )
        self._decoded_cache = decoded_cache_from_mode(cache_mode)
        # host_normalize=False emits raw resized uint8 images; the model
        # normalizes on device (4x smaller host->device transfer, no host
        # float math). build_dataset sets this from --host_normalize.
        self.host_normalize: bool = True

    def __len__(self):
        return len(self.data_split)

    def _image(self, name):
        return load_image(
            os.path.join(self.im_dir, name), self.scale_factor,
            byte_cache=self._byte_cache,
            decoded_cache=self._decoded_cache,
            normalize=self.host_normalize,
        )

    def _name(self, idx) -> str:
        return self.data_split[idx]

    def image_size(self, idx):
        """(h, w) AFTER the /scale_factor resize, without decoding pixels
        (PIL reads only the header for .size) — lets the Batcher count its
        batches exactly."""
        with Image.open(os.path.join(self.im_dir, self._name(idx))) as img:
            w, h = img.size
        sf = self.scale_factor
        return sf * int(h / sf), sf * int(w / sf)

    def num_points(self, idx) -> int:
        """Dot-annotation count from the JSON — the Batcher's tier
        scheduling must not decode pixels."""
        return len(self.annotations[self._name(idx)]["points"])


class FSCD147Exemplars(FSCD147Base):
    """Stage-1 training: 3 exemplar centers+whs as both queries and targets
    (reference FSCD147_Exemplars, datasets/fscd_147.py:11-77)."""

    def num_points(self, idx) -> int:
        # this reader's 'points' are the exemplar centers, not the dots
        name = self._name(idx)
        return len(self.annotations[name]["box_examples_coordinates"])

    def __getitem__(self, idx) -> Dict:
        name = self.data_split[idx]
        anno = self.annotations[name]
        rects = _exemplar_centers_whs(anno["box_examples_coordinates"])
        image, (w, h) = self._image(name)
        res = np.array([w, h], dtype=np.float32)
        centers = (rects[:, :2] + rects[:, 2:]) / 2.0 / res
        whs = (rects[:, 2:] - rects[:, :2]) / res
        return {
            "image": image,
            "image_name": name,
            "points": centers.astype(np.float32),
            "whs": whs.astype(np.float32),
            "orig_size": (w, h),
        }


class FSCD147Points(FSCD147Base):
    """Pseudo-label generation: ALL dot annotations as query points
    (reference FSCD147_Points, datasets/fscd_147.py:80-147)."""

    def __getitem__(self, idx) -> Dict:
        name = self.data_split[idx]
        anno = self.annotations[name]
        image, (w, h) = self._image(name)
        res = np.array([w, h], dtype=np.float32)
        pts = np.array(anno["points"], dtype=np.float32) / res
        return {
            "image": image,
            "image_name": name,
            "image_id": int(name[:-4]),
            "points": pts,
            "orig_size": (w, h),
        }


def _density_sampled_points(
    name: str, points_norm: np.ndarray, density_dir: Optional[str],
    n: int, rng,
) -> np.ndarray:
    """Points for the 'sampled' spatial prior (reference get_sample_points,
    data/fsc147.py:259-284: multinomial draw proportional to a density map).
    Prefers the FSC-147 density .npy (gt_density_map_adaptive_384_VarV2);
    falls back to a delta map built from the dot annotations."""
    if density_dir:
        p = os.path.join(density_dir, os.path.splitext(name)[0] + ".npy")
        if os.path.exists(p):
            return sample_points_from_density(np.load(p), n, rng)
    g = np.zeros((64, 64), np.float32)
    for x, y in np.asarray(points_norm).reshape(-1, 2):
        g[min(int(y * 64), 63), min(int(x * 64), 63)] += 1.0
    return sample_points_from_density(g, n, rng)


class FSCD147Eval(FSCD147Base):
    """Val/test with COCO GT boxes + exemplar rects (reference FSCD147_Test /
    FSC147_Dataset_Val/Test, data/fsc147.py:105-351).

    num_sampled_points > 0 adds a 'sampled_points' array per sample for the
    'sampled' spatial prior (reference FSC147_Dataset_Val/Test num_samples;
    engine.py:26-33 passes them as the transformer's reference points)."""

    def __init__(self, data_path, split, scale_factor: int = 32,
                 num_sampled_points: int = 0,
                 density_dir: Optional[str] = None, sample_seed: int = 0,
                 cache_mode: bool = False):
        super().__init__(data_path, split, scale_factor, cache_mode)
        self.gt = CocoJson(
            os.path.join(data_path, f"instances_{split}.json"), "xywh"
        )
        self.name2id = self.gt.name_to_id()
        self.num_sampled_points = num_sampled_points
        self.density_dir = density_dir or os.path.join(
            data_path, "gt_density_map_adaptive_384_VarV2"
        )
        self.sample_seed = sample_seed

    def num_boxes(self, idx) -> int:
        return len(self.gt.anns_for(self.name2id[self.data_split[idx]]))

    def __getitem__(self, idx) -> Dict:
        name = self.data_split[idx]
        img_id = self.name2id[name]
        anns = self.gt.anns_for(img_id)
        anno = self.annotations[name]
        image, (w, h) = self._image(name)
        res4 = np.array([w, h, w, h], dtype=np.float32)
        res2 = np.array([w, h], dtype=np.float32)

        xywh = np.array(
            [a["bbox"] for a in anns], dtype=np.float32
        ).reshape(-1, 4)
        boxes_cxcywh = np.concatenate(
            [xywh[:, :2] + xywh[:, 2:] / 2.0, xywh[:, 2:]], axis=1
        ) / res4
        rects = _exemplar_centers_whs(anno["box_examples_coordinates"]) / res4
        points = np.array(anno["points"], dtype=np.float32) / res2

        out = {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "boxes": boxes_cxcywh.astype(np.float32),
            "exemplar_boxes": rects.astype(np.float32),  # xyxy normalized
            "points": points,
            "orig_size": (w, h),
        }
        if self.num_sampled_points:
            rng = np.random.default_rng((self.sample_seed, idx))
            out["sampled_points"] = _density_sampled_points(
                name, points, self.density_dir, self.num_sampled_points, rng
            )
        return out


class FSC147Pseudo(FSCD147Base):
    """Stage-2 training set: stage-1 pseudo boxes (cxcywh, pixel units inside
    a COCO 'bbox' field) + exemplar rects (reference FSC147Dataset,
    data/fsc147.py:12-102)."""

    def __init__(self, data_path, split, scale_factor: int = 32,
                 pseudo_file: Optional[str] = None,
                 num_sampled_points: int = 0,
                 density_dir: Optional[str] = None, sample_seed: int = 0,
                 cache_mode: bool = False):
        super().__init__(data_path, split, scale_factor, cache_mode)
        self.num_sampled_points = num_sampled_points
        self.density_dir = density_dir or os.path.join(
            data_path, "gt_density_map_adaptive_384_VarV2"
        )
        self.sample_seed = sample_seed
        pseudo_file = pseudo_file or os.path.join(
            data_path, "annotations", f"pseudo_bbox_{split}.json"
        )
        self.pseudo = CocoJson(pseudo_file, "cxcywh")
        assert self.pseudo.box_format == "cxcywh", (
            "pseudo-label files store center-format boxes "
            "(reference engine.py:163)"
        )
        self.ids = self.pseudo.image_ids()

    def __len__(self):
        return len(self.ids)

    def _name(self, idx) -> str:
        return self.pseudo.load_img(self.ids[idx])["file_name"]

    def num_boxes(self, idx) -> int:
        return len(self.pseudo.anns_for(self.ids[idx]))

    def __getitem__(self, idx) -> Dict:
        img_id = self.ids[idx]
        info = self.pseudo.load_img(img_id)
        name = info["file_name"]
        anns = self.pseudo.anns_for(img_id)
        anno = self.annotations[name]

        image, (w, h) = self._image(name)
        res4 = np.array([w, h, w, h], dtype=np.float32)

        boxes = np.array(
            [a["bbox"] for a in anns], dtype=np.float32
        ).reshape(-1, 4) / res4  # already cxcywh
        rects = _exemplar_centers_whs(anno["box_examples_coordinates"]) / res4

        out = {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "boxes": boxes.astype(np.float32),
            "exemplar_boxes": rects.astype(np.float32),
            "orig_size": (w, h),
        }
        if self.num_sampled_points:
            rng = np.random.default_rng((self.sample_seed, idx))
            pts_norm = np.array(anno["points"], np.float32) / np.array(
                [w, h], np.float32
            )
            out["sampled_points"] = _density_sampled_points(
                name, pts_norm, self.density_dir, self.num_sampled_points, rng
            )
        return out


def sample_points_from_density(
    density_map: np.ndarray, num_samples: int = 300, rng=None
) -> np.ndarray:
    """Sample normalized (x, y) points proportionally to a density/centerness
    map (reference FSC147_Dataset_Test.get_sample_points, data/fsc147.py:259-284)
    — feeds the transformer's 'sampled' spatial prior."""
    rng = rng or np.random.default_rng()
    h, w = density_map.shape
    flat = density_map.reshape(-1).astype(np.float64)
    total = flat.sum()
    if total <= 0:
        flat = np.ones_like(flat)
        total = flat.sum()
    p = flat / total
    idx = rng.choice(h * w, size=num_samples, p=p)
    ys, xs = np.divmod(idx, w)
    return np.stack([xs / w, ys / h], axis=1).astype(np.float32)

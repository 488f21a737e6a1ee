"""FSCD-LVIS dataset readers (reference
CountDETR_lvis_1st_stage/datasets/fscd_lvis.py:11-288 and
CountDETR_lvis_2nd_stage/data/fscd_lvis.py:12-173).

Layout (same as the reference):
  {data_path}/annotations/instances_{split}.json   COCO boxes (all objects)
  {data_path}/annotations/count_{split}.json       exemplar boxes per image
  {data_path}/images/all_images/*.jpg
  {data_path}/annotations/pseudo_lvis_{split}_cxcywh.json  stage-1 output

Differences vs FSCD-147 handled here: exemplar boxes come as xywh in
count_{split}.json (first 3 used); images may be non-RGB (converted); the
stage-2 GT for eval is instances_{split}.json itself; dot-annotation point
counts come from the number of instance boxes.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from countdetr_tpu.data.coco_io import CocoJson
from countdetr_tpu.data.fscd147 import load_image


class _LvisBase:
    def __init__(self, data_path: str, split: str, scale_factor: int = 32,
                 gt_file: Optional[str] = None, cache_mode=False):
        # cache_mode: False | True/'bytes' | 'decoded' | 'disk:<dir>'
        # (see fscd147.load_image and data/cache.py)
        from countdetr_tpu.data.cache import decoded_cache_from_mode

        self._byte_cache = {} if cache_mode in (True, "bytes") else None
        self._decoded_cache = decoded_cache_from_mode(cache_mode)
        # see FSCD147Base.host_normalize (data/fscd147.py)
        self.host_normalize: bool = True
        self.data_path = data_path
        self.split = split
        self.scale_factor = scale_factor
        self.coco = CocoJson(
            gt_file
            or os.path.join(data_path, "annotations", f"instances_{split}.json"),
            "xywh",
        )
        with open(
            os.path.join(data_path, "annotations", f"count_{split}.json")
        ) as f:
            self.count_anno = json.load(f)
        # exemplar lookup: prefer keying by image_id (robust to reordered
        # files); the reference relies on count_anno being positionally
        # aligned with the instances file (lvis_2nd data/fscd_lvis.py:50) —
        # that fragile contract is only used as a fallback, with a length
        # assert, when the count file carries no image ids
        canns = self.count_anno.get("annotations", [])
        self._count_by_id = (
            {a["image_id"]: a for a in canns}
            if canns and all("image_id" in a for a in canns) else None
        )
        self.img_dir = os.path.join(data_path, "images", "all_images")
        self.image_ids = self.coco.image_ids()

    def __len__(self):
        return len(self.image_ids)

    def _image(self, name):
        return load_image(
            os.path.join(self.img_dir, name), self.scale_factor,
            byte_cache=self._byte_cache,
            decoded_cache=self._decoded_cache,
            normalize=self.host_normalize,
        )

    def image_size(self, idx):
        """(h, w) after the /scale_factor resize, from the COCO height/width
        fields (no image decode)."""
        info = self.coco.load_img(self.image_ids[idx])
        sf = self.scale_factor
        return (
            sf * int(int(info["height"]) / sf),
            sf * int(int(info["width"]) / sf),
        )

    def num_points(self, idx) -> int:
        """Instance-box count (LVIS 'points' are the box centers) — cheap
        metadata for the Batcher's tier scheduling."""
        return len(self.coco.anns_for(self.image_ids[idx]))

    def num_boxes(self, idx) -> int:
        return len(self.coco.anns_for(self.image_ids[idx]))

    def _exemplars_xywh(self, idx, img_id=None) -> np.ndarray:
        if img_id is not None and self._count_by_id is not None:
            boxes = self._count_by_id[img_id]["boxes"][:3]
        else:
            canns = self.count_anno["annotations"]
            assert len(canns) == len(self.coco.image_ids()), (
                "positional count_anno lookup requires the count file to "
                "align 1:1 with the instances file (no image_id keys found)"
            )
            boxes = canns[idx]["boxes"][:3]
        return np.array(boxes, dtype=np.float32).reshape(-1, 4)


class FSCDLvisExemplars(_LvisBase):
    """Stage-1 training (reference FSCD_LVIS_Exemplars)."""

    def num_points(self, idx) -> int:
        # this reader's 'points' are the (<= 3) exemplar centers
        return len(self._exemplars_xywh(idx, self.image_ids[idx]))

    def __getitem__(self, idx) -> Dict:
        img_id = self.image_ids[idx]
        name = self.coco.load_img(img_id)["file_name"]
        image, (w, h) = self._image(name)
        res = np.array([w, h], dtype=np.float32)
        ex = self._exemplars_xywh(idx, img_id)
        centers = (ex[:, :2] + ex[:, 2:] / 2.0) / res
        whs = ex[:, 2:] / res
        return {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "points": centers.astype(np.float32),
            "whs": whs.astype(np.float32),
            "orig_size": (w, h),
        }


class FSCDLvisPoints(_LvisBase):
    """Pseudo-label generation: every instance's box center as a point
    (the LVIS set has full boxes; the reference uses their centers)."""

    def __getitem__(self, idx) -> Dict:
        img_id = self.image_ids[idx]
        name = self.coco.load_img(img_id)["file_name"]
        image, (w, h) = self._image(name)
        res = np.array([w, h], dtype=np.float32)
        anns = self.coco.anns_for(img_id)
        xywh = np.array([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        pts = (xywh[:, :2] + xywh[:, 2:] / 2.0) / res
        return {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "points": pts.astype(np.float32),
            "orig_size": (w, h),
        }


class FSCDLvisEval(_LvisBase):
    """Val/test with GT boxes + exemplars (reference FSCD_LVIS_Test /
    FSCD_LVIS_Dataset_Test; exemplar rects clipped to the image,
    lvis_2nd data/fscd_lvis.py:137-145).

    single_instances=True reads annotations/single_instances_{split}.json
    instead of instances_{split}.json — the stage-2 test set the reference's
    FSCD_LVIS_Dataset_Test uses (lvis_2nd data/fscd_lvis.py:101-103).
    Exemplars still come positionally from count_{split}.json, matching the
    reference's index-aligned lookup."""

    def __init__(self, data_path: str, split: str, scale_factor: int = 32,
                 single_instances: bool = False, cache_mode: bool = False):
        gt_file = None
        if single_instances:
            gt_file = os.path.join(
                data_path, "annotations", f"single_instances_{split}.json"
            )
        super().__init__(data_path, split, scale_factor, gt_file=gt_file,
                         cache_mode=cache_mode)

    def __getitem__(self, idx) -> Dict:
        img_id = self.image_ids[idx]
        name = self.coco.load_img(img_id)["file_name"]
        image, (w, h) = self._image(name)
        res2 = np.array([w, h], dtype=np.float32)
        res4 = np.array([w, h, w, h], dtype=np.float32)
        anns = self.coco.anns_for(img_id)
        xywh = np.array([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        boxes = np.concatenate(
            [xywh[:, :2] + xywh[:, 2:] / 2.0, xywh[:, 2:]], axis=1
        ) / res4
        pts = (xywh[:, :2] + xywh[:, 2:] / 2.0) / res2
        ex = self._exemplars_xywh(idx, img_id)
        rects = np.concatenate([ex[:, :2], ex[:, :2] + ex[:, 2:]], axis=1)
        rects[:, 0::2] = np.clip(rects[:, 0::2], 0, w - 1)
        rects[:, 1::2] = np.clip(rects[:, 1::2], 0, h - 1)
        rects = rects / res4
        return {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "boxes": boxes.astype(np.float32),
            "points": pts.astype(np.float32),
            "exemplar_boxes": rects.astype(np.float32),
            "orig_size": (w, h),
        }


class FSCDLvisPseudo(_LvisBase):
    """Stage-2 training on stage-1 pseudo boxes (reference FSCD_LVISDataset,
    reads pseudo_lvis_{split}_cxcywh.json)."""

    def __init__(self, data_path, split, scale_factor: int = 32,
                 pseudo_file: Optional[str] = None, cache_mode: bool = False):
        super().__init__(data_path, split, scale_factor, cache_mode=cache_mode)
        pseudo_file = pseudo_file or os.path.join(
            data_path, "annotations", f"pseudo_lvis_{split}_cxcywh.json"
        )
        self.pseudo = CocoJson(pseudo_file, "cxcywh")
        # positional count_anno fallback needs the INSTANCES-file order (the
        # reference's contract, lvis_2nd data/fscd_lvis.py:50) — an external
        # pseudo file with reordered ids must not mispair exemplars
        self._name_to_idx = {
            self.coco.load_img(i)["file_name"]: k
            for k, i in enumerate(self.coco.image_ids())
        }
        self.ids = self.pseudo.image_ids()
        self.image_ids = self.ids

    def image_size(self, idx):
        info = self.pseudo.load_img(self.ids[idx])
        sf = self.scale_factor
        return (
            sf * int(int(info["height"]) / sf),
            sf * int(int(info["width"]) / sf),
        )

    def num_boxes(self, idx) -> int:
        return len(self.pseudo.anns_for(self.ids[idx]))

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx) -> Dict:
        img_id = self.ids[idx]
        info = self.pseudo.load_img(img_id)
        name = info["file_name"]
        image, (w, h) = self._image(name)
        res4 = np.array([w, h, w, h], dtype=np.float32)
        boxes = np.array(
            [a["bbox"] for a in self.pseudo.anns_for(img_id)], np.float32
        ).reshape(-1, 4) / res4
        ex = self._exemplars_xywh(self._name_to_idx[name], img_id)
        rects = np.concatenate([ex[:, :2], ex[:, :2] + ex[:, 2:]], axis=1) / res4
        return {
            "image": image,
            "image_name": name,
            "image_id": img_id,
            "boxes": boxes.astype(np.float32),
            "exemplar_boxes": rects.astype(np.float32),
            "orig_size": (w, h),
        }

"""Synthetic FSCD-LVIS-format dataset (schemas from reference
CountDETR_lvis_1st_stage/datasets/fscd_lvis.py:11-60)."""

import json
import os

import numpy as np
from PIL import Image


def make_fscd_lvis(root: str, n_per_split=4, size=(96, 128), seed=0,
                   fixed_obj_size=None):
    """fixed_obj_size=(ow, oh) uses ONE object size for every image — the
    LVIS convergence proof uses this so size generalization to unseen test
    images is well-posed for a tiny model (same rationale as
    synth.make_fscd147)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images", "all_images"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    H, W = size
    next_id, ann_id = 1, 1
    for split in ("train", "val", "test"):
        images, annotations, count_annos = [], [], []
        n_split = n_per_split[split] if isinstance(
            n_per_split, dict
        ) else n_per_split
        for _ in range(n_split):
            name = f"lvis_{next_id}.jpg"
            img = np.zeros((H, W, 3), dtype=np.uint8) + 20
            n_obj = int(rng.integers(3, 7))
            boxes = []
            if fixed_obj_size is not None:
                ow, oh = fixed_obj_size
            else:
                ow, oh = int(rng.integers(10, 16)), int(rng.integers(8, 14))
            for _ in range(n_obj):
                cx = int(rng.integers(ow, W - ow))
                cy = int(rng.integers(oh, H - oh))
                x1, y1 = cx - ow // 2, cy - oh // 2
                img[y1 : y1 + oh, x1 : x1 + ow] = [90, 180, 70]
                boxes.append([float(x1), float(y1), float(ow), float(oh)])
            Image.fromarray(img).save(
                os.path.join(root, "images", "all_images", name), quality=95
            )
            images.append(
                {"id": next_id, "file_name": name, "height": H, "width": W}
            )
            for b in boxes:
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": next_id,
                        "bbox": b,
                        "area": b[2] * b[3],
                        "category_id": 1,
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
            count_annos.append({"image_id": next_id, "boxes": boxes[:3]})
            next_id += 1
        with open(
            os.path.join(root, "annotations", f"instances_{split}.json"), "w"
        ) as f:
            json.dump(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": [{"name": "fg", "id": 1}],
                },
                f,
            )
        with open(
            os.path.join(root, "annotations", f"count_{split}.json"), "w"
        ) as f:
            json.dump({"annotations": count_annos}, f)
        if split == "test":
            # stage-2 test GT variant (reference FSCD_LVIS_Dataset_Test reads
            # single_instances_test.json): same images, one annotation fewer
            # per image so tests can detect which GT file was used
            keep, seen = [], set()
            for a in reversed(annotations):
                if a["image_id"] in seen:
                    keep.append(a)
                seen.add(a["image_id"])
            keep.reverse()
            with open(
                os.path.join(root, "annotations", "single_instances_test.json"),
                "w",
            ) as f:
                json.dump(
                    {
                        "images": images,
                        "annotations": keep,
                        "categories": [{"name": "fg", "id": 1}],
                    },
                    f,
                )
    return root

"""Synthetic FSCD-147-format dataset for integration tests (JSON schemas from
reference datasets/fscd_147.py:14-16 and data/fsc147.py:18-19)."""

import json
import os

import numpy as np
from PIL import Image


def make_fscd147(root: str, n_train=6, n_val=3, n_test=3, size=(96, 128), seed=0,
                 fixed_obj_size=None):
    """Writes a miniature FSCD-147 tree; images contain bright square 'objects'
    so a model can actually learn to regress their size.

    fixed_obj_size=(ow, oh) uses ONE object size for every image (instead of
    a random per-image size) — the convergence proof uses this so size
    generalization to unseen test images is well-posed for a tiny model."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images_384_VarV2"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    H, W = size
    splits = {"train": [], "val": [], "test": []}
    annotations = {}
    gt = {"train": [], "val": [], "test": []}
    img_infos = {"train": [], "val": [], "test": []}
    next_id = 1
    ann_id = 1
    gt_anns = {"train": [], "val": [], "test": []}

    for split, count in (("train", n_train), ("val", n_val), ("test", n_test)):
        for k in range(count):
            name = f"{next_id}.jpg"
            img = np.zeros((H, W, 3), dtype=np.uint8) + 30
            n_obj = int(rng.integers(4, 9))
            pts, boxes = [], []
            if fixed_obj_size is not None:
                ow, oh = fixed_obj_size
            else:
                ow, oh = int(rng.integers(10, 18)), int(rng.integers(8, 14))
            for _ in range(n_obj):
                cx = int(rng.integers(ow, W - ow))
                cy = int(rng.integers(oh, H - oh))
                x1, y1 = cx - ow // 2, cy - oh // 2
                img[y1 : y1 + oh, x1 : x1 + ow] = [200, 120, 60]
                pts.append([float(cx), float(cy)])
                boxes.append([float(x1), float(y1), float(ow), float(oh)])
            Image.fromarray(img).save(
                os.path.join(root, "images_384_VarV2", name), quality=95
            )
            # 3 exemplar boxes = first 3 objects, as 4-corner polygons
            ex = []
            for b in boxes[:3]:
                x1, y1, w_, h_ = b
                ex.append(
                    [[x1, y1], [x1, y1 + h_], [x1 + w_, y1 + h_], [x1 + w_, y1]]
                )
            annotations[name] = {
                "points": pts,
                "box_examples_coordinates": ex,
            }
            splits[split].append(name)
            if split in gt:
                img_infos[split].append(
                    {"id": next_id, "file_name": name, "height": H, "width": W}
                )
                for b in boxes:
                    gt_anns[split].append(
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
            next_id += 1

    with open(os.path.join(root, "annotation_FSC147_384.json"), "w") as f:
        json.dump(annotations, f)
    with open(os.path.join(root, "Train_Test_Val_FSC_147.json"), "w") as f:
        json.dump(splits, f)
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"instances_{split}.json"), "w") as f:
            json.dump(
                {
                    "images": img_infos[split],
                    "annotations": gt_anns[split],
                    "categories": [{"name": "fg", "id": 1}],
                },
                f,
            )
    return root


class TouchCountingDataset:
    """dataset[i] records the access by touching <root>/<i> before returning.

    Lets tests observe, from the parent process, how far ahead the
    process-parallel loader has actually run — the bounded-window contract
    (data/loader.py::SampleLoader.iter_samples) is about loads STARTED, and
    worker-side file touches are the only cross-process signal that needs no
    shared synchronization primitives."""

    def __init__(self, root: str, n: int = 64):
        self.root = root
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        open(os.path.join(self.root, str(int(i))), "w").close()
        return int(i)

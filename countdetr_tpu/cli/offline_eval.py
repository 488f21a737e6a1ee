"""Offline evaluator — the eval_all.py / evaluate_val_and_test.py /
offline_{coco,lvis}_evaluator.py equivalent (reference
CountDETR_147_2nd_stage/eval_all.py:44-578).

Reads a predictions JSON (box_format cxcywh, pixel units — what
engine.infer_detections writes and what the reference's infer.py writes
implicitly) plus the GT instances json and the dot-annotation file, and
reports detection AP (maxDets [900, 1000, 1100]) + counting MAE/RMSE/NAE/SRE.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from countdetr_tpu.data.coco_io import CocoJson
from countdetr_tpu.eval.coco_eval import CocoEvaluator
from countdetr_tpu.eval.counting import counting_metrics


def _to_xywh(bbox, fmt: str):
    x, y, w, h = bbox
    if fmt == "cxcywh":
        return [x - w / 2.0, y - h / 2.0, w, h]
    return [x, y, w, h]


def evaluate_predictions(
    pred_path: str,
    data_path: str,
    dataset: str = "fscd_147",
    split: str = "test",
) -> Dict[str, float]:
    preds = CocoJson(pred_path, "cxcywh")
    gt = CocoJson(os.path.join(data_path, f"instances_{split}.json"), "xywh")
    with open(os.path.join(data_path, "annotation_FSC147_384.json")) as f:
        point_annos = json.load(f)

    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    gt_counts: List[int] = []
    pred_counts: List[int] = []
    id2name = {im["id"]: im["file_name"] for im in gt.dataset["images"]}

    for img_id in preds.image_ids():
        anns = preds.anns_for(img_id)
        dets = np.array(
            [_to_xywh(a["bbox"], preds.box_format) for a in anns], np.float64
        ).reshape(-1, 4)
        scores = np.array([a.get("score", 1.0) for a in anns], np.float64)
        gts = np.array(
            [_to_xywh(a["bbox"], gt.box_format) for a in gt.anns_for(img_id)],
            np.float64,
        ).reshape(-1, 4)
        ev.add_image(dets, scores, gts)
        name = id2name.get(img_id) or preds.load_img(img_id).get("file_name")
        if name in point_annos:
            gt_counts.append(len(point_annos[name]["points"]))
            pred_counts.append(len(anns))

    out = ev.summarize()
    if gt_counts:
        out.update(counting_metrics(gt_counts, pred_counts))
    return out


def evaluate_results(results: List[Dict], dataset) -> Dict[str, float]:
    """AP from in-memory infer results against the dataset's GT boxes.
    results: engine.infer_detections output; dataset: an *Eval dataset."""
    by_name = {}
    for i in range(len(dataset)):
        s = dataset[i]
        w, h = s["orig_size"]
        cxcywh = s["boxes"] * np.array([w, h, w, h], np.float32)
        xywh = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2.0, cxcywh[:, 2:]], axis=1
        )
        by_name[s.get("image_name", i)] = xywh

    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    for r in results:
        cxcywh = np.asarray(r["boxes_cxcywh_px"], np.float64).reshape(-1, 4)
        xywh = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2.0, cxcywh[:, 2:]], axis=1
        )
        gts = by_name.get(r.get("image_name"))
        if gts is None:
            continue
        ev.add_image(xywh, np.asarray(r["scores"]), gts)
    return ev.summarize()

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
    gt_file: str | None = None,
) -> Dict[str, float]:
    """Dataset-aware offline evaluation.

    fscd_147 (reference eval_all.py:44-578): GT boxes from
    {data_path}/instances_{split}.json; counting GT = number of dot
    annotations in annotation_FSC147_384.json.

    fscd_lvis (reference offline_lvis_evaluator.py:78-95,223-252): GT boxes
    from {data_path}/annotations/instances_{split}.json with every
    annotation rewritten to the single foreground class (our evaluator is
    single-category, so class ids are simply ignored — same effect as the
    reference's temp_gt.json rewrite); counting GT = number of GT box
    annotations per image; metrics add MRE.
    """
    preds = CocoJson(pred_path, "cxcywh")
    lvis = dataset == "fscd_lvis"
    if gt_file is None:
        gt_file = (
            os.path.join(data_path, "annotations", f"instances_{split}.json")
            if lvis
            else os.path.join(data_path, f"instances_{split}.json")
        )
    gt = CocoJson(gt_file, "xywh")
    point_annos: Dict = {}
    if not lvis:
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
        gt_anns = gt.anns_for(img_id)
        gts = np.array(
            [_to_xywh(a["bbox"], gt.box_format) for a in gt_anns],
            np.float64,
        ).reshape(-1, 4)
        # COCOeval crowd-ignore protocol: FSCD GT has no crowds, but any GT
        # json carrying iscrowd evaluates with the full semantics
        crowd = np.array(
            [bool(a.get("iscrowd", 0)) for a in gt_anns], dtype=bool
        )
        ev.add_image(dets, scores, gts, gt_iscrowd=crowd)
        if lvis:
            # reference counting_dict: gt = number of GT box annotations
            # (offline_lvis_evaluator.py:222-252)
            if len(gt_anns):
                gt_counts.append(len(gt_anns))
                pred_counts.append(len(anns))
        else:
            name = id2name.get(img_id) or preds.load_img(img_id).get("file_name")
            if name in point_annos:
                gt_counts.append(len(point_annos[name]["points"]))
                pred_counts.append(len(anns))

    out = ev.summarize()
    if gt_counts:
        out.update(counting_metrics(gt_counts, pred_counts))
    return out


def _gt_xywh_by_name(dataset) -> Dict:
    """Pixel-space GT xywh per image name. Prefers the dataset's COCO GT
    metadata (FSCD147Eval.gt / FSCDLvisEval.coco — no image decoding);
    falls back to iterating samples (which decodes pixels) otherwise."""
    coco = getattr(dataset, "gt", None) or getattr(dataset, "coco", None)
    if coco is not None:
        out = {}
        for img_id in coco.image_ids():
            info = coco.load_img(img_id)
            b = np.array(
                [a["bbox"] for a in coco.anns_for(img_id)], np.float64
            ).reshape(-1, 4)
            if coco.box_format == "cxcywh":
                b = np.concatenate([b[:, :2] - b[:, 2:] / 2.0, b[:, 2:]], 1)
            out[info["file_name"]] = b
        return out
    by_name = {}
    for i in range(len(dataset)):
        s = dataset[i]
        w, h = s["orig_size"]
        cxcywh = s["boxes"] * np.array([w, h, w, h], np.float32)
        by_name[s.get("image_name", i)] = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2.0, cxcywh[:, 2:]], axis=1
        )
    return by_name


def evaluate_results(results: List[Dict], dataset, by_name=None) -> Dict[str, float]:
    """AP from in-memory infer results against the dataset's GT boxes.
    results: engine.infer_detections output; dataset: an *Eval dataset.
    by_name: optional precomputed _gt_xywh_by_name(dataset) (callers running
    both this and per_image_ap should build it once)."""
    by_name = by_name if by_name is not None else _gt_xywh_by_name(dataset)

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


def per_image_ap(results: List[Dict], dataset, by_name=None) -> Dict[str, Dict[str, float]]:
    """Per-image AP/AP50 (the reference's cal_ap,
    evaluate_val_and_test.py:27-135, feeding each_img_infor.pkl): evaluate
    each image as its own single-image COCO run. GT comes from the
    dataset's COCO metadata — no second pass of image decoding."""
    by_name = by_name if by_name is not None else _gt_xywh_by_name(dataset)
    out: Dict[str, Dict[str, float]] = {}
    for r in results:
        gts = by_name.get(r.get("image_name"))
        if gts is None:
            continue
        cxcywh = np.asarray(r["boxes_cxcywh_px"], np.float64).reshape(-1, 4)
        xywh = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2.0, cxcywh[:, 2:]], axis=1
        )
        ev = CocoEvaluator(max_dets=(900, 1000, 1100))
        ev.add_image(xywh, np.asarray(r["scores"]), gts)
        s = ev.summarize()
        out[r["image_name"]] = {"AP": s["AP"], "AP50": s["AP50"]}
    return out


def analyze_results(
    results, out_dir: str = "", worst_k: int = 20, image_aps=None
):
    """Sort per-image results by |count error| (reference
    scripts/analyze_res.py:10-54 sorts the each_img_infor.pkl by AP/count
    diff for inspection). Writes the full per-image report
    (each_img_info.json — the reference's each_img_infor.pkl) and the worst
    images; image_aps from per_image_ap() adds AP columns."""
    image_aps = image_aps or {}
    scored = [
        {
            "image_name": r.get("image_name"),
            "image_id": r.get("image_id"),
            "count_gt": r.get("count_gt"),
            "count_pred": r.get("count_pred"),
            "abs_err": abs((r.get("count_gt") or 0) - r["count_pred"]),
            **image_aps.get(r.get("image_name"), {}),
        }
        for r in results
    ]
    scored.sort(key=lambda x: -x["abs_err"])
    worst = scored[:worst_k]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "each_img_info.json"), "w") as f:
            json.dump(scored, f, indent=2)
        with open(os.path.join(out_dir, "worst_images.json"), "w") as f:
            json.dump(worst, f, indent=2)
    return worst


def visualize_predictions(
    pred_path: str, data_path: str, out_dir: str, limit: int = 20,
    image_dir: str = "images_384_VarV2",
):
    """Draw predicted boxes onto images (reference
    scripts/visualize_generated_data.py:9-64 and the evaluators' vis dumps)."""
    from PIL import Image

    from countdetr_tpu.utils.visualize import draw_detections

    preds = CocoJson(pred_path, "cxcywh")
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for img_id in preds.image_ids():
        if count >= limit:
            break
        info = preds.load_img(img_id)
        name = info.get("file_name")
        path = os.path.join(data_path, image_dir, name or "")
        if not name or not os.path.exists(path):
            continue
        anns = preds.anns_for(img_id)
        boxes = np.array([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        if preds.box_format == "xywh":
            boxes = np.concatenate(
                [boxes[:, :2] + boxes[:, 2:] / 2.0, boxes[:, 2:]], axis=1
            )
        scores = np.array([a.get("score", 1.0) for a in anns])
        pts = np.array(
            [a["point"] for a in anns if "point" in a], np.float32
        ).reshape(-1, 2)
        img = draw_detections(
            Image.open(path), boxes, pts if len(pts) else None, scores
        )
        img.save(os.path.join(out_dir, name))
        count += 1
    return count

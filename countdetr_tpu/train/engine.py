"""Host-side engine: epoch loops, pseudo-label generation, inference.

Mirrors the reference engine.py surface (train_one_epoch / evaluate /
generate_pseudo_label / infer — reference 1st-stage engine.py:27-265,
2nd-stage engine.py:14-175) with the TPU execution model: batches stream
through a prefetch thread, every step is one jitted program on the mesh,
metrics sync to host only at print intervals.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from countdetr_tpu.config import Config
from countdetr_tpu.core.mesh import shard_batch
from countdetr_tpu.data.batching import Batcher, prefetch
from countdetr_tpu.data.coco_io import write_coco
from countdetr_tpu.eval.counting import counting_metrics
from countdetr_tpu.eval.postprocess import adaptive_threshold_counting
from countdetr_tpu.utils.logging import MetricLogger


def train_one_epoch(
    train_step, state, batcher, mesh, epoch: int, log_every=100,
    prefetch_depth: int = 2, max_steps: Optional[int] = None,
):
    logger = MetricLogger(print_every=log_every, prefix=f"Epoch [{epoch}] ")
    # Amortized NaN guard: every step folds isfinite(loss) into the on-device
    # state.bad_steps counter; the host fetches it only every K steps, so a
    # non-finite loss is caught within K updates without a per-step
    # device->host sync. The reference .item()s the loss every step and exits
    # (engine.py:64-67); K bounds the corruption blast radius while keeping
    # the "host sync only at intervals" pipeline property.
    check_every = max(1, min(10, log_every))
    n_steps = 0
    synced_multiproc = False

    def _check_bad(st):
        if int(jax.device_get(st.bad_steps)) > 0:
            raise FloatingPointError(f"non-finite loss at epoch {epoch}")

    n_real = 0
    for batch in prefetch(iter(batcher), depth=prefetch_depth):
        batch.pop("meta", None)
        batch.pop("bucket", None)
        # host-side real (non-padding) sample count: the cross-host metric
        # average weights each host by this, so a host whose slice of a
        # tail batch is mostly padding doesn't contribute a full-weight mean
        bv = batch.get("batch_valid")
        n_real += int(np.asarray(bv).sum()) if bv is not None else (
            len(batch["images"])
        )
        db = shard_batch(batch, mesh) if mesh is not None else batch
        if not synced_multiproc and jax.process_count() > 1:
            # multi-host: AOT-compile this program on every host, then
            # rendezvous, THEN execute — a first execution forms a new
            # collectives context whose key-exchange deadline cannot absorb
            # per-host compile skew (one host hits the persistent cache,
            # another compiles cold). After the first epoch this costs one
            # cache deserialization + a barrier on the existing clique.
            try:
                train_step.lower(state, db).compile()
            except Exception:
                pass  # donated-arg AOT quirks must not block training
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("train-step-compiled")
            synced_multiproc = True
        state, metrics = train_step(state, db)
        n_steps += 1
        if n_steps % check_every == 0:
            _check_bad(state)
        logger.step(metrics)
        if max_steps is not None and n_steps >= max_steps:
            # smoke/step-capped runs: abandoning prefetch leaves its daemon
            # worker parked on a full queue — harmless, reclaimed at exit
            break
    if n_steps:
        _check_bad(state)
    stats = logger.summary()
    stats["epoch"] = epoch
    stats["steps"] = n_steps
    stats["real_samples"] = n_real
    return state, stats


def evaluate(eval_step, params, batcher, mesh):
    logger = MetricLogger(print_every=50, prefix="Eval ")
    n_real = 0
    for batch in prefetch(iter(batcher)):
        batch.pop("meta", None)
        batch.pop("bucket", None)
        bv = batch.get("batch_valid")
        n_real += int(np.asarray(bv).sum()) if bv is not None else (
            len(batch["images"])
        )
        db = shard_batch(batch, mesh) if mesh is not None else batch
        metrics = eval_step(params, db)
        logger.step(metrics, force=True)
    stats = logger.summary()
    stats["real_samples"] = n_real
    return stats


def generate_pseudo_labels(
    forward, params, dataset, cfg: Config, out_path: str, mesh=None,
    also_xywh_path: Optional[str] = None,
):
    """Stage-1 pseudo-GT emission (reference engine.py:123-187): run the
    point-regressor over every annotated point, denormalize, write a
    COCO-format JSON whose bbox is [x_center, y_center, w, h] (explicit
    box_format='cxcywh' — the reference leaves this implicit).

    Point-count tiers keep EVERY annotated point (the reference emits a
    pseudo box per point, engine.py:145-155; truncating at max_points would
    silently drop pseudo boxes on exactly the dense images that dominate
    counting error). A few capacities bound recompiles."""
    mp = cfg.data.max_points
    tiers = tuple(sorted({min(mp, 128), mp, max(8 * mp, 4096)}))
    batcher = Batcher(
        dataset,
        cfg.data.batch_size,
        cfg.data.buckets,
        max_points=cfg.data.max_points,
        point_tiers=tiers,
        num_workers=cfg.data.num_workers,
        pack_s2d=cfg.data.pack_s2d,
    )
    images: List[Dict] = []
    annotations: List[Dict] = []
    ann_id = 1
    for batch in prefetch(iter(batcher)):
        meta = batch["meta"]
        db = shard_batch(
            {k: v for k, v in batch.items() if k not in ("meta", "bucket")}, mesh
        ) if mesh is not None else batch
        out = forward(
            params, db["images"], db["pad_mask"], db["points"], db["points_valid"]
        )
        pred_wh = np.asarray(out["pred_wh"])  # (B, P, 2) normalized
        pts = np.asarray(batch["points"])
        pvalid = np.asarray(batch["points_valid"])
        bvalid = np.asarray(batch["batch_valid"])
        for i, m in enumerate(meta):
            if not bvalid[i]:
                continue
            w, h = m["orig_size"]
            img_id = m.get("image_id", len(images) + 1)
            images.append(
                {
                    "id": img_id,
                    "file_name": m.get("image_name", f"{img_id}.jpg"),
                    "height": int(h),
                    "width": int(w),
                }
            )
            for j in np.nonzero(pvalid[i])[0]:
                cx, cy = pts[i, j] * (w, h)
                bw, bh = pred_wh[i, j] * (w, h)
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "area": int(bw * bh),
                        "bbox": [int(cx), int(cy), int(bw), int(bh)],
                        "category_id": 1,
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_coco(out_path, images, annotations, box_format="cxcywh")
    if also_xywh_path:
        # the LVIS stage-1 generator also writes a corner-format twin
        # (reference generate_pseudo.py:26-109)
        xywh_annos = []
        for a in annotations:
            cx, cy, bw, bh = a["bbox"]
            xa = dict(a)
            xa["bbox"] = [int(cx - bw / 2), int(cy - bh / 2), int(bw), int(bh)]
            xywh_annos.append(xa)
        write_coco(also_xywh_path, images, xywh_annos, box_format="xywh")
    return out_path


def infer_detections(
    forward, params, dataset, cfg: Config, out_path: Optional[str], mesh=None
):
    """Stage-2 inference with adaptive-threshold counting (reference
    2nd-stage engine.py:70-175). Returns per-image results and writes the
    predictions JSON (box_format cxcywh, pixel units, like the reference)."""
    batcher = Batcher(
        dataset,
        cfg.data.batch_size,
        cfg.data.buckets,
        max_boxes=cfg.data.max_boxes,
        max_points=cfg.data.max_points,
        num_workers=cfg.data.num_workers,
        pack_s2d=cfg.data.pack_s2d,
    )
    images: List[Dict] = []
    annotations: List[Dict] = []
    results: List[Dict] = []
    ann_id = 1
    for batch in prefetch(iter(batcher)):
        meta = batch["meta"]
        db = shard_batch(
            {k: v for k, v in batch.items() if k not in ("meta", "bucket")}, mesh
        ) if mesh is not None else batch
        if cfg.model.spatial_prior == "sampled" and "sampled_points" not in db:
            raise ValueError(
                "spatial_prior='sampled' but the dataset emitted no "
                "'sampled_points' — use an FSCD-147 eval/pseudo dataset with "
                "num_sampled_points > 0"
            )
        if "sampled_points" in db:
            out = forward(
                params, db["images"], db["pad_mask"], db["exemplar_boxes"],
                db["sampled_points"], db["sampled_points_valid"],
            )
        else:
            out = forward(
                params, db["images"], db["pad_mask"], db["exemplar_boxes"]
            )
        logits = np.asarray(out["pred_logits"])
        boxes = np.asarray(out["pred_boxes"])
        refs = np.asarray(out["reference_points"])
        bvalid = np.asarray(batch["batch_valid"])
        pts_valid = np.asarray(batch.get("points_valid")) if "points_valid" in batch else None
        prob = 1.0 / (1.0 + np.exp(-logits[..., 0]))  # class-0 sigmoid
        for i, m in enumerate(meta):
            if not bvalid[i]:
                continue
            w, h = m["orig_size"]
            keep, thr = adaptive_threshold_counting(prob[i])
            img_id = m.get("image_id", len(images) + 1)
            images.append(
                {
                    "id": img_id,
                    "file_name": m.get("image_name", "None"),
                    "height": int(h),
                    "width": int(w),
                }
            )
            kept_boxes = boxes[i][keep] * (w, h, w, h)
            kept_scores = prob[i][keep]
            kept_refs = refs[i][keep] * (w, h)
            for s, b, r in zip(kept_scores, kept_boxes, kept_refs):
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "area": int(b[2] * b[3]),
                        "bbox": [int(b[0]), int(b[1]), int(b[2]), int(b[3])],
                        "category_id": 1,
                        "score": float(s),
                        "point": [int(r[0]), int(r[1])],
                    }
                )
                ann_id += 1
            results.append(
                {
                    "image_id": img_id,
                    "image_name": m.get("image_name"),
                    "count_pred": int(keep.sum()),
                    # untruncated annotation count (meta n_points), NOT the
                    # padded points_valid sum — dense images can exceed
                    # max_points and their GT count must not deflate
                    "count_gt": (
                        int(m["n_points"]) if m.get("n_points") else
                        (int(pts_valid[i].sum()) if pts_valid is not None else None)
                    ),
                    "threshold": thr,
                    "boxes_cxcywh_px": kept_boxes,
                    "scores": kept_scores,
                }
            )
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_coco(out_path, images, annotations, box_format="cxcywh")
    return results


def counting_summary(results: List[Dict]) -> Dict[str, float]:
    gts = [r["count_gt"] for r in results if r["count_gt"] is not None]
    preds = [r["count_pred"] for r in results if r["count_gt"] is not None]
    if not gts:
        return {}
    return counting_metrics(gts, preds)


def stage1_test(
    forward, params, dataset, cfg: Config, out_path: Optional[str], mesh=None,
    vis_dir: Optional[str] = None,
):
    """Stage-1 'test' mode (reference 1st-stage engine.py:190-265): run the
    point->wh model on GT box centers, keep the top-100 scoring queries, and
    emit xywh COCO annotations (pseudo_test_anchor_detr_v3.json equivalent).
    """
    from countdetr_tpu.eval.postprocess import topk_postprocess

    batcher = Batcher(
        dataset, cfg.data.batch_size, cfg.data.buckets,
        max_points=cfg.data.max_points, max_boxes=cfg.data.max_boxes,
        num_workers=cfg.data.num_workers,
        pack_s2d=cfg.data.pack_s2d,
    )
    images: List[Dict] = []
    annotations: List[Dict] = []
    ann_id = 1
    for batch in prefetch(iter(batcher)):
        meta = batch["meta"]
        db = shard_batch(
            {k: v for k, v in batch.items() if k not in ("meta", "bucket")}, mesh
        ) if mesh is not None else batch
        out = forward(
            params, db["images"], db["pad_mask"], db["points"], db["points_valid"]
        )
        import jax.numpy as jnp

        boxes_cxcywh = np.concatenate(
            [np.asarray(out["pred_points"]), np.asarray(out["pred_wh"])], axis=-1
        )
        logits = np.asarray(out["pred_logits"])
        sizes = np.array(
            [[m["orig_size"][1], m["orig_size"][0]] for m in meta], np.float32
        )  # (h, w)
        k = min(100, logits.shape[1] * logits.shape[2])
        post = topk_postprocess(
            jnp.array(logits), jnp.array(boxes_cxcywh), jnp.array(sizes), k=k
        )
        bvalid = np.asarray(batch["batch_valid"])
        pvalid = np.asarray(batch["points_valid"])
        for i, m in enumerate(meta):
            if not bvalid[i]:
                continue
            w, h = m["orig_size"]
            img_id = m.get("image_id", len(images) + 1)
            images.append(
                {"id": img_id, "file_name": m.get("image_name", "None"),
                 "height": int(h), "width": int(w)}
            )
            bxs = np.asarray(post["boxes"][i])  # xyxy px
            for x1, y1, x2, y2 in bxs:
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "area": int((x2 - x1) * (y2 - y1)),
                        "bbox": [int(x1), int(y1), int(x2 - x1), int(y2 - y1)],
                        "category_id": 1,
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
            if vis_dir:
                from countdetr_tpu.utils.visualize import draw_detections
                from countdetr_tpu.data.fscd147 import IMAGENET_MEAN, IMAGENET_STD

                os.makedirs(vis_dir, exist_ok=True)
                img = np.asarray(batch["images"][i])
                if img.shape[-1] == 12:  # s2d-packed pipe: restore pixels
                    from countdetr_tpu.data.batching import (
                        unpack_space_to_depth,
                    )

                    img = unpack_space_to_depth(img[None])[0]
                # content extent from the pad mask, NOT the bucket dims —
                # boxes are in original-image pixels and must scale to the
                # resized content region, which the bucket merely pads
                pm = np.asarray(batch["pad_mask"][i])
                rh = int((~pm).any(axis=1).sum())
                rw = int((~pm).any(axis=0).sum())
                if img.dtype == np.uint8:  # raw pipe (device-side normalize)
                    img = img[:rh, :rw].astype(np.float32)
                else:
                    img = (img[:rh, :rw] * IMAGENET_STD + IMAGENET_MEAN) * 255.0
                cxcywh = np.stack(
                    [(bxs[:, 0] + bxs[:, 2]) / 2 * rw / w,
                     (bxs[:, 1] + bxs[:, 3]) / 2 * rh / h,
                     (bxs[:, 2] - bxs[:, 0]) * rw / w,
                     (bxs[:, 3] - bxs[:, 1]) * rh / h], axis=1,
                )
                vis = draw_detections(np.clip(img, 0, 255), cxcywh)
                vis.save(os.path.join(vis_dir, m.get("image_name", f"{img_id}.jpg")))
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_coco(out_path, images, annotations, box_format="xywh")
    return out_path

"""Loss functions for both training stages, fully masked and jit-safe.

Everything here is a pure function over fixed-shape padded arrays; validity
masks replace the reference's per-image dynamic tensors so a whole batch is
one XLA program.

Reference semantics being matched:
  stage 1 BoundingBoxCriterion   anchor_detr.py:317-337 (1st stage tree)
  stage 2 SetCriterion           anchor_detr.py:143-367 (2nd stage tree)
  sigmoid focal loss             segmentation.py:198-223
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from countdetr_tpu.ops import boxes as box_ops


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss (reference segmentation.py:198-223 before its
    final reduction). Returns the same shape as logits."""
    prob = jax.nn.sigmoid(logits)
    # stable BCE-with-logits: max(x,0) - x*z + log1p(exp(-|x|))
    ce = jnp.clip(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def stage1_criterion(
    pred_wh: jnp.ndarray,  # (B, Q, 2) normalized predicted w,h per point-query
    tgt_points: jnp.ndarray,  # (B, Q, 2) normalized point centers (the anchors)
    tgt_whs: jnp.ndarray,  # (B, Q, 2) normalized exemplar w,h
    valid: jnp.ndarray,  # (B, Q) bool — real (non-padded) queries
) -> Dict[str, jnp.ndarray]:
    """Stage-1 loss: no matching — queries ARE the annotated points.

    Mirrors BoundingBoxCriterion (reference 1st-stage anchor_detr.py:317-337):
      loss_wh   = mean_{valid elements} |wh - wh*|            (F.l1_loss default)
      loss_giou = sum_{valid} (1 - GIoU(box, box*)) / n_valid
    where both boxes share the GT point as center.
    Weights applied by the caller: {loss_wh: 1, loss_giou: 0.4}.
    """
    v = valid.astype(pred_wh.dtype)
    n = jnp.maximum(v.sum(), 1.0)

    l1 = jnp.abs(pred_wh - tgt_whs) * v[..., None]
    loss_wh = l1.sum() / jnp.maximum(2.0 * n, 1.0)  # mean over valid elements

    src_boxes = jnp.concatenate([tgt_points, pred_wh], axis=-1)
    tgt_boxes = jnp.concatenate([tgt_points, tgt_whs], axis=-1)
    giou = box_ops.generalized_box_iou_aligned(
        box_ops.box_cxcywh_to_xyxy(src_boxes), box_ops.box_cxcywh_to_xyxy(tgt_boxes)
    )
    loss_giou = ((1.0 - giou) * v).sum() / n
    return {"loss_wh": loss_wh, "loss_giou": loss_giou}


class MatchedTargets(NamedTuple):
    """A batched Hungarian-match result over padded targets.

    tgt2query: (B, T) int32 — query index assigned to each target slot
    tgt_valid: (B, T) bool  — real targets (padding rows are False)
    matched:   (B, T) bool or None — targets that actually won a query;
               None means all valid targets did (the T <= Q case). With
               more targets than queries only min(Q, #valid) can match
               (the reference's rectangular scipy LAP, 2nd-stage
               matcher.py:243-246) — unmatched-but-valid targets still
               count toward num_boxes normalization but contribute no
               pair losses.
    """

    tgt2query: jnp.ndarray
    tgt_valid: jnp.ndarray
    matched: jnp.ndarray | None = None


def stage2_criterion(
    pred_logits: jnp.ndarray,  # (B, Q, C)  C = 2 classes
    pred_boxes: jnp.ndarray,  # (B, Q, 4)  cxcywh in [0, 1]
    pred_vars: jnp.ndarray,  # (B, Q, 2)  Laplace scale for (w, h)
    tgt_boxes: jnp.ndarray,  # (B, T, 4)  cxcywh (padded)
    tgt_labels: jnp.ndarray,  # (B, T) int (0 = fg for FSCD)
    match: MatchedTargets,
    focal_alpha: float = 0.25,
    num_boxes: jnp.ndarray | None = None,
    batch_valid: jnp.ndarray | None = None,  # (B,) bool — real batch rows
) -> Dict[str, jnp.ndarray]:
    """Stage-2 set-prediction losses given an assignment.

    Reference: SetCriterion (2nd-stage anchor_detr.py:143-367). num_boxes is
    the global number of target boxes (the reference all-reduces it across
    ranks and divides by world size, :321-325); under pjit the arrays here are
    already global, so the default is the batch-total clamped to >= 1.

    Returns unweighted losses; the caller applies
    {loss_ce: 2, loss_bbox: 5, loss_giou: 2, loss_variance: 2}.
    """
    B, Q, C = pred_logits.shape
    T = tgt_boxes.shape[1]
    tq = match.tgt2query
    tv = match.tgt_valid
    matched = match.matched if match.matched is not None else tv
    vf = tv.astype(pred_boxes.dtype)  # valid targets: num_boxes normalization
    mf = matched.astype(pred_boxes.dtype)  # matched pairs: pair losses

    if num_boxes is None:
        # reference num_boxes = sum(len(t["labels"])) — ALL valid targets,
        # including ones beyond the query budget (anchor_detr.py:318-325)
        num_boxes = jnp.maximum(vf.sum(), 1.0)

    # ---- focal classification loss (reference :166-197) -------------------
    # Reference quirk: target_classes is filled with num_classes(criterion)=1
    # ("no-object") and the one-hot is built over C+1 columns then sliced
    # [:, :, :-1] — with C=2 logits and criterion num_classes=1, UNMATCHED
    # queries keep an explicit background one-hot at class index 1
    # (anchor_detr.py:174-187). Matched queries scatter their label (0).
    bg_class = C - 1
    q_idx = jnp.where(matched, tq, Q)  # unmatched targets scatter to the extra row
    target_classes = jnp.full((B, Q + 1), bg_class, dtype=jnp.int32)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    target_classes = target_classes.at[b_idx, q_idx].set(
        tgt_labels.astype(jnp.int32)
    )
    onehot = jax.nn.one_hot(
        target_classes[:, :Q], C, dtype=pred_logits.dtype
    )
    # reference: focal.mean(1).sum() / num_boxes * Q  ==  focal.sum() / num_boxes
    focal = sigmoid_focal_loss(pred_logits, onehot, alpha=focal_alpha)
    if batch_valid is not None:
        # rows that only pad the batch to fixed size contribute nothing
        focal = focal * batch_valid[:, None, None].astype(focal.dtype)
    loss_ce = focal.sum() / num_boxes

    # ---- box losses on matched pairs (reference :213-234) -----------------
    src_boxes = jnp.take_along_axis(pred_boxes, tq[..., None], axis=1)  # (B, T, 4)
    l1 = jnp.abs(src_boxes - tgt_boxes) * mf[..., None]
    loss_bbox = l1.sum() / num_boxes

    giou = box_ops.generalized_box_iou_aligned(
        box_ops.box_cxcywh_to_xyxy(src_boxes), box_ops.box_cxcywh_to_xyxy(tgt_boxes)
    )
    loss_giou = ((1.0 - giou) * mf).sum() / num_boxes

    # ---- Laplace variance loss (reference :264-289) -----------------------
    # The reference computes F.l1_loss(src_wh, tgt_wh) — a SCALAR mean over
    # the matched set — then divides it by each |sigma| and adds |log sigma|:
    #   sum_i [ meanL1_w/|sw_i| + |log sw_i| + meanL1_h/|sh_i| + |log sh_i| ] / num_boxes
    src_vars = jnp.take_along_axis(pred_vars, tq[..., None], axis=1)  # (B, T, 2)
    n_matched = jnp.maximum(mf.sum(), 1.0)
    mean_l1_wh = (jnp.abs(src_boxes[..., 2:] - tgt_boxes[..., 2:]) * mf[..., None]).sum(
        axis=(0, 1)
    ) / n_matched  # (2,)
    abs_var = jnp.abs(src_vars)
    per_t = mean_l1_wh / jnp.maximum(abs_var, 1e-8) + jnp.abs(
        jnp.log(jnp.maximum(abs_var, 1e-8))
    )  # (B, T, 2)
    loss_variance = (per_t.sum(-1) * mf).sum() / num_boxes

    # ---- cardinality (log-only, no gradient; reference :199-211) ----------
    card_pred = (jnp.argmax(pred_logits, axis=-1) != C - 1).sum(axis=1)
    card_err = jnp.abs(card_pred.astype(jnp.float32) - vf.sum(axis=1)).mean()

    # ---- class_error (log-only; reference :194-196 via util/misc accuracy):
    # top-1 accuracy of matched queries' class predictions
    matched_logits = jnp.take_along_axis(
        pred_logits, tq[..., None], axis=1
    )  # (B, T, C)
    correct = (
        jnp.argmax(matched_logits, axis=-1) == tgt_labels.astype(jnp.int32)
    ).astype(jnp.float32)
    acc = (correct * mf).sum() / jnp.maximum(mf.sum(), 1.0)
    class_error = 100.0 * (1.0 - acc)

    return {
        "loss_ce": loss_ce,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "loss_variance": loss_variance,
        "cardinality_error": jax.lax.stop_gradient(card_err),
        "class_error": jax.lax.stop_gradient(class_error),
    }


def stage2_cost_matrix(
    pred_logits: jnp.ndarray,  # (B, Q, C)
    pred_boxes: jnp.ndarray,  # (B, Q, 4)
    tgt_boxes: jnp.ndarray,  # (B, T, 4)
    tgt_labels: jnp.ndarray,  # (B, T)
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """Batched matching cost (B, Q, T).

    Reference OriginalHungarianMatcher (2nd-stage matcher.py:197-247): the
    class term is the focal-style pos-minus-neg cost at the target's label,
    the box terms are L1 (cdist, p=1) and negative GIoU.
    """
    prob = jax.nn.sigmoid(pred_logits)  # (B, Q, C)
    # the reference's exact form: -log(1 - p + 1e-8) / -log(p + 1e-8)
    neg = (1.0 - focal_alpha) * (prob**focal_gamma) * (-jnp.log(1.0 - prob + 1e-8))
    pos = focal_alpha * ((1.0 - prob) ** focal_gamma) * (-jnp.log(prob + 1e-8))
    cost_cls = jnp.take_along_axis(
        pos - neg, tgt_labels[:, None, :].astype(jnp.int32), axis=2
    )  # (B, Q, T)

    l1 = jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]).sum(-1)
    giou = box_ops.generalized_box_iou_pairwise(
        box_ops.box_cxcywh_to_xyxy(pred_boxes), box_ops.box_cxcywh_to_xyxy(tgt_boxes)
    )
    return cost_bbox * l1 + cost_class * cost_cls + cost_giou * (-giou)

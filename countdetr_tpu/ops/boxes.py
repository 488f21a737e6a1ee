"""Box utilities in pure jnp (drop-in for reference util/box_ops.py:17-94,
which leaned on torchvision's box_area).

Conventions:
  cxcywh: (center_x, center_y, w, h), normalized [0, 1]
  xyxy:   (x0, y0, x1, y1)

All functions broadcast over leading batch dims and are jit/vmap friendly.
Pairwise functions take (..., N, 4) and (..., M, 4) and return (..., N, M).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (..., N)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Returns (iou, union). Degenerate/empty boxes produce 0-area; the union is
    clamped away from 0 to keep the op total (the reference asserts validity
    on the host instead — util/box_ops.py:57-58; asserts don't exist under jit).
    """
    area1 = box_area(boxes1)  # (..., N)
    area2 = box_area(boxes2)  # (..., M)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (..., N, M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise GIoU of xyxy boxes (reference util/box_ops.py:46-69)."""
    iou, union = box_iou_pairwise(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]

    return iou - (area - union) / jnp.maximum(area, 1e-9)


def box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of xyxy boxes with identical shapes (..., 4) -> (...)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise GIoU — the diagonal of the pairwise matrix without the
    O(N^2) cost. The reference computes the full matrix and takes the diag
    (anchor_detr.py:332-334); on TPU the aligned form avoids an N x N
    intermediate in every loss evaluation.
    """
    iou, union = box_iou_aligned(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with the reference's clamping (util/misc.py:478-482)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)

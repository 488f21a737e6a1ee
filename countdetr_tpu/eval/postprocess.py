"""Inference post-processing.

adaptive_threshold_counting reproduces the reference's counting rule
(reference 2nd-stage engine.py:117-133): threshold class-0 sigmoid scores at
0.5, count n survivors, then re-threshold at the (2n-1)-th highest score
(0-indexed, descending) unless 2n-1 >= 900, in which case the threshold
drops to 0 (keep everything).

topk_postprocess mirrors PostProcess (reference anchor_detr.py:340-372):
top-100 over the flattened (query, class) sigmoid scores.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from countdetr_tpu.ops.boxes import box_cxcywh_to_xyxy


def adaptive_threshold_counting(
    object_prob: np.ndarray,  # (Q,) sigmoid prob of class 0
    base_threshold: float = 0.5,
    cap: int = 900,
) -> Tuple[np.ndarray, float]:
    """Returns (bool keep mask, final threshold). Host-side — it is a handful
    of FLOPs per image and data-dependent, so it stays off the TPU."""
    num_obj = int((object_prob >= base_threshold).sum())
    sorted_desc = np.sort(object_prob)[::-1]
    idx = num_obj * 2 - 1
    if idx < cap:
        # reference quirk: with num_obj == 0 this indexes -1 == the LOWEST
        # score, i.e. everything is kept (engine.py:127-128)
        threshold = float(sorted_desc[idx])
    else:
        threshold = 0.0
    return object_prob >= threshold, threshold


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def topk_postprocess(
    pred_logits: jnp.ndarray,  # (B, Q, C)
    pred_boxes: jnp.ndarray,  # (B, Q, 4) cxcywh normalized
    target_sizes: jnp.ndarray,  # (B, 2) (h, w) pixels
    k: int = 100,
) -> Dict[str, jnp.ndarray]:
    B, Q, C = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits).reshape(B, Q * C)
    scores, idx = jax.lax.top_k(prob, k)
    qidx = idx // C
    labels = idx % C
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes * scale}

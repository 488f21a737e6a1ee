"""Loss semantics vs independent torch oracles written from the reference's
documented formulas (2nd-stage anchor_detr.py:143-367; 1st-stage :317-337)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from countdetr_tpu.ops import losses
from countdetr_tpu.ops.losses import MatchedTargets


def _rand_boxes(rng, *shape):
    cx = rng.uniform(0.2, 0.8, shape)
    cy = rng.uniform(0.2, 0.8, shape)
    w = rng.uniform(0.05, 0.3, shape)
    h = rng.uniform(0.05, 0.3, shape)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_stage1_criterion_matches_torch(rng):
    B, Q = 2, 3
    pred_wh = rng.uniform(0.05, 0.3, (B, Q, 2)).astype(np.float32)
    pts = rng.uniform(0.2, 0.8, (B, Q, 2)).astype(np.float32)
    whs = rng.uniform(0.05, 0.3, (B, Q, 2)).astype(np.float32)
    valid = np.ones((B, Q), dtype=bool)

    got = losses.stage1_criterion(
        jnp.array(pred_wh), jnp.array(pts), jnp.array(whs), jnp.array(valid)
    )

    # torch oracle = flatten batch, F.l1_loss mean + giou diag sum / n
    t_wh = torch.tensor(pred_wh).flatten(0, 1)
    t_tgt = torch.tensor(whs).flatten(0, 1)
    want_wh = F.l1_loss(t_wh, t_tgt).item()
    np.testing.assert_allclose(float(got["loss_wh"]), want_wh, rtol=1e-5)

    def xyxy(c):
        return torch.cat([c[:, :2] - c[:, 2:] / 2, c[:, :2] + c[:, 2:] / 2], -1)

    p = torch.tensor(pts).flatten(0, 1)
    src = xyxy(torch.cat([p, t_wh], -1))
    tgt = xyxy(torch.cat([p, t_tgt], -1))
    # aligned giou oracle
    lt = torch.max(src[:, :2], tgt[:, :2])
    rb = torch.min(src[:, 2:], tgt[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (src[:, 2] - src[:, 0]) * (src[:, 3] - src[:, 1])
    a2 = (tgt[:, 2] - tgt[:, 0]) * (tgt[:, 3] - tgt[:, 1])
    union = a1 + a2 - inter
    iou = inter / union
    lt2 = torch.min(src[:, :2], tgt[:, :2])
    rb2 = torch.max(src[:, 2:], tgt[:, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    area = wh2[:, 0] * wh2[:, 1]
    giou = iou - (area - union) / area
    want_giou = (1 - giou).sum().item() / src.shape[0]
    np.testing.assert_allclose(float(got["loss_giou"]), want_giou, rtol=1e-4)


def test_stage1_masking_ignores_padded(rng):
    B, Q = 1, 5
    pred_wh = rng.uniform(0.05, 0.3, (B, Q, 2)).astype(np.float32)
    pts = rng.uniform(0.2, 0.8, (B, Q, 2)).astype(np.float32)
    whs = rng.uniform(0.05, 0.3, (B, Q, 2)).astype(np.float32)
    valid = np.array([[True, True, True, False, False]])

    got = losses.stage1_criterion(
        jnp.array(pred_wh), jnp.array(pts), jnp.array(whs), jnp.array(valid)
    )
    # corrupt padded entries: result must not change
    pred_wh2 = pred_wh.copy()
    pred_wh2[0, 3:] = 99.0
    whs2 = whs.copy()
    whs2[0, 3:] = 0.5
    got2 = losses.stage1_criterion(
        jnp.array(pred_wh2), jnp.array(pts), jnp.array(whs2), jnp.array(valid)
    )
    np.testing.assert_allclose(float(got["loss_wh"]), float(got2["loss_wh"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(got["loss_giou"]), float(got2["loss_giou"]), rtol=1e-6
    )


def _torch_stage2_oracle(logits, boxes, variances, tgt_boxes, tgt_labels, tq):
    """Oracle transcribing SetCriterion's math for a single unpadded image."""
    Q, C = logits.shape[1], logits.shape[2]
    T = tgt_boxes.shape[1]
    num_boxes = max(T, 1)

    logits = torch.tensor(logits)
    boxes = torch.tensor(boxes)
    variances = torch.tensor(variances)
    tgtb = torch.tensor(tgt_boxes)
    tq = torch.tensor(tq, dtype=torch.long)

    # reference behavior: unmatched queries carry an explicit background
    # one-hot at the last class (see ops/losses.py stage2_criterion comment)
    onehot = torch.zeros(1, Q, C)
    onehot[:, :, C - 1] = 1.0
    for t in range(T):
        onehot[0, tq[0, t], C - 1] = 0.0
        onehot[0, tq[0, t], tgt_labels[0, t]] = 1.0
    prob = logits.sigmoid()
    ce = F.binary_cross_entropy_with_logits(logits, onehot, reduction="none")
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    focal = 0.25 * onehot * ce * (1 - p_t) ** 2 + 0.75 * (1 - onehot) * ce * (1 - p_t) ** 2
    loss_ce = focal.mean(1).sum() / num_boxes * Q

    src = boxes[0, tq[0]]
    loss_bbox = (src - tgtb[0]).abs().sum() / num_boxes

    sv = variances[0, tq[0]]
    mean_l1_w = F.l1_loss(src[:, 2], tgtb[0][:, 2])
    mean_l1_h = F.l1_loss(src[:, 3], tgtb[0][:, 3])
    wvl = mean_l1_w / sv[:, 0].abs() + sv[:, 0].log().abs()
    hvl = mean_l1_h / sv[:, 1].abs() + sv[:, 1].log().abs()
    loss_var = ((wvl + hvl) / num_boxes).sum()
    return float(loss_ce), float(loss_bbox), float(loss_var)


def test_stage2_criterion_matches_torch(rng):
    B, Q, T, C = 1, 12, 5, 2
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = _rand_boxes(rng, B, Q)
    variances = rng.uniform(0.1, 2.0, (B, Q, 2)).astype(np.float32)
    tgt_boxes = _rand_boxes(rng, B, T)
    tgt_labels = np.zeros((B, T), dtype=np.int32)
    tq = rng.permutation(Q)[:T][None].astype(np.int32)
    valid = np.ones((B, T), dtype=bool)

    got = losses.stage2_criterion(
        jnp.array(logits),
        jnp.array(boxes),
        jnp.array(variances),
        jnp.array(tgt_boxes),
        jnp.array(tgt_labels),
        MatchedTargets(jnp.array(tq), jnp.array(valid)),
    )
    want_ce, want_bbox, want_var = _torch_stage2_oracle(
        logits, boxes, variances, tgt_boxes, tgt_labels, tq
    )
    np.testing.assert_allclose(float(got["loss_ce"]), want_ce, rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_bbox"]), want_bbox, rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_variance"]), want_var, rtol=1e-4)


def test_stage2_padded_targets_are_inert(rng):
    B, Q, T, C = 1, 10, 6, 2
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = _rand_boxes(rng, B, Q)
    variances = rng.uniform(0.1, 2.0, (B, Q, 2)).astype(np.float32)
    tgt_boxes = _rand_boxes(rng, B, T)
    tgt_labels = np.zeros((B, T), dtype=np.int32)
    tq = np.arange(T)[None].astype(np.int32)
    valid = np.array([[True] * 4 + [False] * 2])

    ref = losses.stage2_criterion(
        jnp.array(logits), jnp.array(boxes), jnp.array(variances),
        jnp.array(tgt_boxes), jnp.array(tgt_labels),
        MatchedTargets(jnp.array(tq), jnp.array(valid)),
    )
    tgt_boxes2 = tgt_boxes.copy()
    tgt_boxes2[0, 4:] = 0.123
    tq2 = tq.copy()
    tq2[0, 4:] = 7  # padded rows point anywhere
    got = losses.stage2_criterion(
        jnp.array(logits), jnp.array(boxes), jnp.array(variances),
        jnp.array(tgt_boxes2), jnp.array(tgt_labels),
        MatchedTargets(jnp.array(tq2), jnp.array(valid)),
    )
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_variance"):
        np.testing.assert_allclose(float(ref[k]), float(got[k]), rtol=1e-5, err_msg=k)


def test_stage2_cost_matrix_matches_reference_formula(rng):
    B, Q, T, C = 1, 8, 4, 2
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = _rand_boxes(rng, B, Q)
    tgtb = _rand_boxes(rng, B, T)
    labels = np.zeros((B, T), dtype=np.int32)

    got = np.asarray(
        losses.stage2_cost_matrix(
            jnp.array(logits), jnp.array(boxes), jnp.array(tgtb), jnp.array(labels)
        )
    )

    # torch oracle (reference matcher.py:218-247)
    lp = torch.tensor(logits).flatten(0, 1).sigmoid()
    ob = torch.tensor(boxes).flatten(0, 1)
    tb = torch.tensor(tgtb).flatten(0, 1)
    tid = torch.tensor(labels).flatten()
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * (lp**gamma) * (-(1 - lp + 1e-8).log())
    pos = alpha * ((1 - lp) ** gamma) * (-(lp + 1e-8).log())
    cost_class = pos[:, tid] - neg[:, tid]
    cost_bbox = torch.cdist(ob, tb, p=1)

    def xyxy(c):
        return torch.cat([c[:, :2] - c[:, 2:] / 2, c[:, :2] + c[:, 2:] / 2], -1)

    s, t = xyxy(ob), xyxy(tb)
    lt = torch.max(s[:, None, :2], t[None, :, :2])
    rb = torch.min(s[:, None, 2:], t[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (s[:, 2] - s[:, 0]) * (s[:, 3] - s[:, 1])
    a2 = (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    iou = inter / union
    lt2 = torch.min(s[:, None, :2], t[None, :, :2])
    rb2 = torch.max(s[:, None, 2:], t[None, :, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    area = wh2[..., 0] * wh2[..., 1]
    giou = iou - (area - union) / area
    want = (5 * cost_bbox + 2 * cost_class + 2 * (-giou)).numpy()
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)

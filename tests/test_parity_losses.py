"""Golden parity for the LOSS stack: run the reference's actual
BoundingBoxCriterion / SetCriterion (torch, CPU) on random predictions and
targets, and match our masked jnp losses to them. Matching is pinned to the
same scipy assignment on both sides so this isolates the loss math."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from countdetr_tpu.ops import losses
from countdetr_tpu.ops.losses import MatchedTargets
from tests.ref_oracle import REF_TREES, ReferenceStage

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_TREES[1]), reason="reference tree not mounted"
)]


def _boxes(rng, *shape):
    cx = rng.uniform(0.25, 0.75, shape)
    cy = rng.uniform(0.25, 0.75, shape)
    w = rng.uniform(0.05, 0.2, shape)
    h = rng.uniform(0.05, 0.2, shape)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_stage1_criterion_vs_reference(rng):
    B, Q = 1, 3
    pred_wh = rng.uniform(0.05, 0.3, (B, Q, 2)).astype(np.float32)
    pts = rng.uniform(0.25, 0.75, (B, Q, 2)).astype(np.float32)
    whs = rng.uniform(0.05, 0.25, (B, Q, 2)).astype(np.float32)

    with ReferenceStage(1) as ref:
        import importlib

        anchor_mod = importlib.import_module("models.anchor_detr")
        crit = anchor_mod.BoundingBoxCriterion()
        with torch.no_grad():
            out = crit(
                {"pred_wh": torch.tensor(pred_wh)},
                {"points": torch.tensor(pts), "whs": torch.tensor(whs)},
            )
        want_wh = float(out["loss_wh"])
        want_giou = float(out["loss_giou"])

    got = losses.stage1_criterion(
        jnp.array(pred_wh), jnp.array(pts), jnp.array(whs),
        jnp.ones((B, Q), dtype=bool),
    )
    np.testing.assert_allclose(float(got["loss_wh"]), want_wh, rtol=1e-5)
    np.testing.assert_allclose(float(got["loss_giou"]), want_giou, rtol=1e-4)


def test_stage2_criterion_vs_reference(rng):
    B, Q, T, C = 1, 20, 7, 2
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = _boxes(rng, B, Q)
    variances = rng.uniform(0.2, 2.0, (B, Q, 2)).astype(np.float32)
    tgt_boxes = _boxes(rng, B, T)
    labels = np.zeros((B, T), dtype=np.int64)

    with ReferenceStage(2) as ref:
        import importlib

        anchor_mod = importlib.import_module("models.anchor_detr")
        matcher_mod = importlib.import_module("models.matcher")
        matcher = matcher_mod.OriginalHungarianMatcher(2, 5, 2)
        crit = anchor_mod.SetCriterion(
            num_classes=1,
            matcher=matcher,
            weight_dict={},
            losses=["labels", "boxes", "cardinality", "vars"],
            focal_alpha=0.25,
        )
        outputs = {
            "pred_logits": torch.tensor(logits),
            "pred_boxes": torch.tensor(boxes),
            "pred_vars": torch.tensor(variances),
        }
        targets = [
            {
                "labels": torch.tensor(labels[0]),
                "boxes": torch.tensor(tgt_boxes[0]),
            }
        ]
        with torch.no_grad():
            indices = matcher(outputs, targets)
            out = crit(outputs, targets)
        want = {k: float(v) for k, v in out.items()}
        # the reference's matching, expressed as tgt2query
        src_idx, tgt_idx = indices[0]
        tq = np.zeros((B, T), dtype=np.int32)
        tq[0, tgt_idx.numpy()] = src_idx.numpy().astype(np.int32)

    got = losses.stage2_criterion(
        jnp.array(logits), jnp.array(boxes), jnp.array(variances),
        jnp.array(tgt_boxes), jnp.array(labels.astype(np.int32)),
        MatchedTargets(jnp.array(tq), jnp.ones((B, T), dtype=bool)),
    )
    np.testing.assert_allclose(float(got["loss_ce"]), want["loss_ce"], rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_bbox"]), want["loss_bbox"], rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_giou"]), want["loss_giou"], rtol=1e-4)
    np.testing.assert_allclose(
        float(got["loss_variance"]), want["loss_variance"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(got["cardinality_error"]), want["cardinality_error"], atol=1e-5
    )


def test_matcher_vs_reference_matcher(rng):
    """Our cost matrix + auction vs the reference OriginalHungarianMatcher:
    total assignment cost must agree (index sets may differ on exact ties)."""
    B, Q, T, C = 1, 40, 12, 2
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = _boxes(rng, B, Q)
    tgt_boxes = _boxes(rng, B, T)
    labels = np.zeros((B, T), dtype=np.int64)

    with ReferenceStage(2) as ref:
        import importlib

        matcher_mod = importlib.import_module("models.matcher")
        matcher = matcher_mod.OriginalHungarianMatcher(2, 5, 2)
        outputs = {
            "pred_logits": torch.tensor(logits),
            "pred_boxes": torch.tensor(boxes),
        }
        targets = [
            {"labels": torch.tensor(labels[0]), "boxes": torch.tensor(tgt_boxes[0])}
        ]
        with torch.no_grad():
            indices = matcher(outputs, targets)
        src_idx, tgt_idx = indices[0]

    from countdetr_tpu.ops import matching

    cost = losses.stage2_cost_matrix(
        jnp.array(logits), jnp.array(boxes), jnp.array(tgt_boxes),
        jnp.array(labels.astype(np.int32)),
    )
    ours = np.asarray(
        matching.batched_match(cost, jnp.ones((B, T), dtype=bool))[0]
    )
    cost_np = np.asarray(cost)[0]
    ref_cost = sum(
        cost_np[s, t] for s, t in zip(src_idx.numpy(), tgt_idx.numpy())
    )
    our_cost = sum(cost_np[ours[0, t], t] for t in range(T))
    np.testing.assert_allclose(our_cost, ref_cost, rtol=1e-3, atol=1e-3)

"""FSCD-LVIS pipeline: stage-1 train -> pseudo-gen -> stage-2 train on the
pseudo file -> inference -> offline LVIS evaluation (config-only delta from
FSCD-147, SURVEY.md section 7 step 4; stage-2 eval semantics from reference
offline_lvis_evaluator.py)."""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.data.batching import Batcher
from countdetr_tpu.data.fscd_lvis import (
    FSCDLvisEval, FSCDLvisExemplars, FSCDLvisPoints, FSCDLvisPseudo,
)
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train import engine
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import (
    create_state, make_forward, make_train_step,
)
from tests.synth_lvis import make_fscd_lvis

TINY = dict(enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64)
BUCKETS = ((96, 128),)


def test_lvis_stage1_and_pseudo(tmp_path_factory, tmp_path, rng):
    root = make_fscd_lvis(str(tmp_path_factory.mktemp("lvis_e2e")))

    cfg = cfglib.stage1_config("fscd_lvis")
    cfg = cfg.replace(
        model=cfg.model.replace(**TINY),
        data=cfg.data.replace(
            data_path=root, batch_size=2, buckets=BUCKETS, max_points=12
        ),
        train=cfg.train.replace(lr=2e-3),
    )
    model = CountingDetr(cfg.model)
    ds = FSCDLvisExemplars(root, "train")
    b = Batcher(ds, 2, BUCKETS, max_points=12, shuffle=True)

    B, H, W = 2, 96, 128
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        np.full((B, 12, 2), 0.5, np.float32), np.ones((B, 12), bool),
    )
    tx = build_optimizer(cfg.train, params, 2)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, stats = engine.train_one_epoch(step, state, b, None, 0, 1)
    assert np.isfinite(stats["loss"])

    fwd = make_forward(model, cfg)
    out = os.path.join(
        str(tmp_path), "annotations", "pseudo_lvis_train_cxcywh.json"
    )
    engine.generate_pseudo_labels(
        fwd, state.params, FSCDLvisPoints(root, "train"), cfg, out
    )
    with open(out) as f:
        pj = json.load(f)
    assert pj["box_format"] == "cxcywh"
    assert len(pj["annotations"]) >= 3 * 4

    # ---- stage 2: train on pseudo boxes ------------------------------------
    cfg2 = cfglib.stage2_config("fscd_lvis")
    cfg2 = cfg2.replace(
        model=cfg2.model.replace(num_query_position=25, **TINY),
        data=cfg2.data.replace(
            data_path=root, batch_size=2, buckets=BUCKETS,
            max_boxes=12, max_points=12,
        ),
        train=cfg2.train.replace(lr=1e-3, epochs=1),
    )
    model2 = CountingDetr(cfg2.model)
    ds2 = FSCDLvisPseudo(root, "train", pseudo_file=out)
    s = ds2[0]
    assert s["boxes"].shape[1] == 4
    assert s["exemplar_boxes"].shape == (3, 4)
    b2 = Batcher(ds2, 2, BUCKETS, max_boxes=12, shuffle=True)
    params2 = model2.init(
        jax.random.PRNGKey(1),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        exemplar_boxes=np.tile(
            np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (B, 3, 1)
        ),
    )
    tx2 = build_optimizer(cfg2.train, params2, 2)
    state2 = create_state(params2, tx2)
    step2 = make_train_step(model2, tx2, cfg2)
    state2, stats2 = engine.train_one_epoch(step2, state2, b2, None, 0, 1)
    assert np.isfinite(stats2["loss"])

    # ---- stage 2: inference on the single-instances test GT ----------------
    ds_single = FSCDLvisEval(root, "test", single_instances=True)
    ds_full = FSCDLvisEval(root, "test")
    # the single-instances file has one annotation fewer per image
    assert len(ds_single[0]["boxes"]) == len(ds_full[0]["boxes"]) - 1

    fwd2 = make_forward(model2, cfg2)
    pred_path = os.path.join(str(tmp_path), "predictions_test.json")
    results = engine.infer_detections(
        fwd2, state2.params, ds_single, cfg2, pred_path
    )
    assert len(results) == len(ds_single)

    # ---- offline LVIS evaluation -------------------------------------------
    from countdetr_tpu.cli.offline_eval import evaluate_predictions

    metrics = evaluate_predictions(
        pred_path, root, dataset="fscd_lvis", split="test"
    )
    for k in ("AP", "AP50", "MAE", "RMSE", "MRE", "SRE"):
        assert k in metrics, metrics.keys()
    assert np.isfinite(metrics["MAE"])
    # counting GT for LVIS = number of GT box annotations (reference
    # offline_lvis_evaluator.py:222-252); sanity: MAE uses the full
    # instances file, whose per-image counts are n_obj
    single = evaluate_predictions(
        pred_path, root, dataset="fscd_lvis", split="test",
        gt_file=os.path.join(root, "annotations", "single_instances_test.json"),
    )
    assert single["MAE"] != metrics["MAE"] or single["AP50"] != metrics["AP50"]

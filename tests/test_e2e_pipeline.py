"""Full two-stage pipeline on the synthetic FSCD-147 fixture, tiny model:
stage-1 train -> pseudo-label JSON -> stage-2 train on pseudo boxes ->
inference with adaptive-threshold counting -> offline evaluation.
This is the integration test SURVEY.md section 4 item 3 calls for.
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.core.mesh import make_mesh
from countdetr_tpu.data.batching import Batcher
from countdetr_tpu.data.fscd147 import (
    FSC147Pseudo, FSCD147Eval, FSCD147Exemplars, FSCD147Points,
)
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train import engine
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import (
    create_state, make_forward, make_train_step,
)
from tests.synth import make_fscd147


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_fscd147(str(tmp_path_factory.mktemp("fscd147_e2e")))


TINY = dict(enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64)
BUCKETS = ((96, 128),)


def test_full_pipeline(data_root, tmp_path):
    out_dir = str(tmp_path)

    # ---- stage 1: train the point->wh regressor ---------------------------
    cfg1 = cfglib.stage1_config()
    cfg1 = cfg1.replace(
        model=cfg1.model.replace(**TINY),
        data=cfg1.data.replace(
            data_path=data_root, batch_size=3, buckets=BUCKETS, max_points=16
        ),
        train=cfg1.train.replace(lr=2e-3, epochs=2),
    )
    model1 = CountingDetr(cfg1.model)
    ds1 = FSCD147Exemplars(data_root, "train")
    b1 = Batcher(ds1, 3, BUCKETS, max_points=16, shuffle=True)

    B, H, W = 3, 96, 128
    params1 = model1.init(
        jax.random.PRNGKey(0),
        np.zeros((B, H, W, 3), np.float32),
        np.zeros((B, H, W), bool),
        np.full((B, 16, 2), 0.5, np.float32),
        np.ones((B, 16), bool),
    )
    tx1 = build_optimizer(cfg1.train, params1, steps_per_epoch=2)
    state1 = create_state(params1, tx1)
    step1 = make_train_step(model1, tx1, cfg1)

    first_loss = last_loss = None
    for epoch in range(4):
        state1, stats = engine.train_one_epoch(step1, state1, b1, None, epoch, 1)
        if first_loss is None:
            first_loss = stats["loss"]
        last_loss = stats["loss"]
    assert last_loss < first_loss

    # ---- stage 1: pseudo-label generation ----------------------------------
    fwd1 = make_forward(model1, cfg1)
    for split in ("train", "val", "test"):
        ds_p = FSCD147Points(data_root, split)
        out = os.path.join(out_dir, "annotations", f"pseudo_bbox_{split}.json")
        engine.generate_pseudo_labels(fwd1, state1.params, ds_p, cfg1, out)
        with open(out) as f:
            pj = json.load(f)
        assert pj["box_format"] == "cxcywh"
        assert len(pj["annotations"]) >= 4 * len(ds_p)

    # ---- stage 2: train the detector on pseudo boxes -----------------------
    # max_boxes (36) > num queries (5x5 grid = 25): the production default
    # geometry has the same relation (700 target slots vs 576 grid queries),
    # exercising the rectangular T > Q matching path end-to-end.
    cfg2 = cfglib.stage2_config()
    cfg2 = cfg2.replace(
        model=cfg2.model.replace(num_query_position=25, **TINY),
        data=cfg2.data.replace(
            data_path=data_root, batch_size=3, buckets=BUCKETS,
            max_boxes=36, max_points=16,
        ),
        train=cfg2.train.replace(lr=1e-3, epochs=2),
    )
    assert cfg2.data.max_boxes > cfg2.model.num_queries
    model2 = CountingDetr(cfg2.model)
    ds2 = FSC147Pseudo(
        data_root, "train",
        pseudo_file=os.path.join(out_dir, "annotations", "pseudo_bbox_train.json"),
    )
    b2 = Batcher(ds2, 3, BUCKETS, max_boxes=36, shuffle=True)
    params2 = model2.init(
        jax.random.PRNGKey(1),
        np.zeros((B, H, W, 3), np.float32),
        np.zeros((B, H, W), bool),
        exemplar_boxes=np.tile(
            np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (B, 3, 1)
        ),
    )
    tx2 = build_optimizer(cfg2.train, params2, steps_per_epoch=2)
    state2 = create_state(params2, tx2)
    step2 = make_train_step(model2, tx2, cfg2)
    for epoch in range(2):
        state2, stats2 = engine.train_one_epoch(step2, state2, b2, None, epoch, 1)
        assert np.isfinite(stats2["loss"])

    # ---- stage 2: inference + adaptive-threshold counting ------------------
    fwd2 = make_forward(model2, cfg2)
    ds_test = FSCD147Eval(data_root, "test")
    pred_path = os.path.join(out_dir, "predictions_test.json")
    results = engine.infer_detections(fwd2, state2.params, ds_test, cfg2, pred_path)
    assert len(results) == len(ds_test)
    counting = engine.counting_summary(results)
    assert "MAE" in counting and np.isfinite(counting["MAE"])

    # ---- offline evaluation -------------------------------------------------
    from countdetr_tpu.cli.offline_eval import evaluate_predictions, evaluate_results

    ap = evaluate_results(results, ds_test)
    assert "AP50" in ap
    offline = evaluate_predictions(pred_path, data_root, split="test")
    assert "MAE" in offline and "AP50" in offline

"""FSCD-LVIS pipeline slice: stage-1 train -> pseudo-gen -> stage-2 dataset
reads the pseudo file (config-only delta from FSCD-147, SURVEY.md section 7
step 4)."""

import json
import os

import jax
import numpy as np
import pytest

from countdetr_tpu import config as cfglib
from countdetr_tpu.data.batching import Batcher
from countdetr_tpu.data.fscd_lvis import (
    FSCDLvisExemplars, FSCDLvisPoints, FSCDLvisPseudo,
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

    # stage-2 LVIS dataset consumes the pseudo file
    ds2 = FSCDLvisPseudo(root, "train", pseudo_file=out)
    s = ds2[0]
    assert s["boxes"].shape[1] == 4
    assert s["exemplar_boxes"].shape == (3, 4)

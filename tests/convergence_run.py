"""Synthetic-data convergence proof: train the two-stage pipeline in-process
until it actually detects — the accuracy validation that real FSCD data
(absent in this environment) would otherwise provide.

Stage 1 learns to regress the synthetic objects' (w, h) from 3 exemplars,
pseudo-labels every dot, stage 2 trains on the pseudo boxes, and the final
detections are evaluated with the full offline protocol. Success = high
AP50 and near-zero MAE on the synthetic test split.

Run directly (TPU or CPU):  python tests/convergence_run.py [steps2]
As a test (env-gated, ~10 min on TPU):  RUN_CONVERGENCE=1 pytest
tests/test_convergence.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def run(root: str, out_dir: str, steps1: int = 150, steps2: int = 500,
        lr2: float = 5e-4):
    import jax

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.cli.offline_eval import evaluate_predictions
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

    DIMS = dict(enc_layers=2, dec_layers=2, hidden_dim=64, nheads=4,
                dim_feedforward=128)
    BUCKETS = ((96, 128),)
    B, H, W = 3, 96, 128

    # ---- stage 1 ----------------------------------------------------------
    cfg1 = cfglib.stage1_config()
    cfg1 = cfg1.replace(
        model=cfg1.model.replace(**DIMS),
        data=cfg1.data.replace(
            data_path=root, batch_size=B, buckets=BUCKETS, max_points=16
        ),
        train=cfg1.train.replace(lr=1e-3, lr_drop=10**6),
    )
    model1 = CountingDetr(cfg1.model)
    ds1 = FSCD147Exemplars(root, "train")
    b1 = Batcher(ds1, B, BUCKETS, max_points=16, shuffle=True)
    params1 = model1.init(
        jax.random.PRNGKey(0),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        np.full((B, 16, 2), 0.5, np.float32), np.ones((B, 16), bool),
    )
    tx1 = build_optimizer(cfg1.train, params1, steps_per_epoch=10**6)
    state1 = create_state(params1, tx1)
    step1 = make_train_step(model1, tx1, cfg1)

    it = None
    first = last = None
    done = 0
    while done < steps1:
        for batch in b1:
            batch.pop("meta"), batch.pop("bucket")
            state1, m = step1(state1, batch)
            done += 1
            if first is None:
                first = float(m["loss"])
            if done >= steps1:
                break
    last = float(m["loss"])
    print(f"stage1: loss {first:.4f} -> {last:.4f} over {done} steps")

    # ---- pseudo labels ----------------------------------------------------
    fwd1 = make_forward(model1, cfg1)
    os.makedirs(os.path.join(out_dir, "annotations"), exist_ok=True)
    for split in ("train", "test"):
        out = os.path.join(out_dir, "annotations", f"pseudo_bbox_{split}.json")
        engine.generate_pseudo_labels(
            fwd1, state1.params, FSCD147Points(root, split), cfg1, out
        )
    print("pseudo labels written")

    # ---- stage 2 ----------------------------------------------------------
    cfg2 = cfglib.stage2_config()
    cfg2 = cfg2.replace(
        model=cfg2.model.replace(num_query_position=25, **DIMS),
        data=cfg2.data.replace(
            data_path=root, batch_size=B, buckets=BUCKETS,
            max_boxes=36, max_points=16,
        ),
        train=cfg2.train.replace(lr=lr2, lr_drop=10**6),
    )
    model2 = CountingDetr(cfg2.model)
    ds2 = FSC147Pseudo(
        root, "train",
        pseudo_file=os.path.join(out_dir, "annotations", "pseudo_bbox_train.json"),
    )
    b2 = Batcher(ds2, B, BUCKETS, max_boxes=36, shuffle=True)
    params2 = model2.init(
        jax.random.PRNGKey(1),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        exemplar_boxes=np.tile(
            np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (B, 3, 1)
        ),
    )
    tx2 = build_optimizer(cfg2.train, params2, steps_per_epoch=10**6)
    state2 = create_state(params2, tx2)
    step2 = make_train_step(model2, tx2, cfg2)
    done = 0
    while done < steps2:
        for batch in b2:
            batch.pop("meta"), batch.pop("bucket")
            state2, m = step2(state2, batch)
            done += 1
            if done % 100 == 0:
                parts = {
                    k: round(float(m[k]), 4)
                    for k in ("loss", "loss_ce", "loss_bbox", "loss_giou",
                              "loss_variance", "cardinality_error")
                }
                print(f"stage2 step {done}: {parts}")
            if done >= steps2:
                break

    # ---- inference + offline evaluation -----------------------------------
    # Both splits are evaluated and RETURNED; the gate
    # (tests/test_convergence.py) asserts on the HELD-OUT test split — the
    # synthetic dataset uses a fixed object size and enough train images
    # that generalization to unseen images is well-posed even for the tiny
    # proof model, so train-split-only assertions are no longer the honest
    # ceiling.
    fwd2 = make_forward(model2, cfg2)
    summary = {}
    for split in ("train", "test"):
        ds_eval = FSCD147Eval(root, split)
        pred_path = os.path.join(out_dir, f"predictions_{split}.json")
        results = engine.infer_detections(
            fwd2, state2.params, ds_eval, cfg2, pred_path
        )
        counting = engine.counting_summary(results)
        metrics = evaluate_predictions(pred_path, root, split=split)
        # MAE at a strict 0.5 threshold: the pipeline's reported counts use
        # the reference's adaptive 2n-1 rule (engine.py:118-133), which by
        # construction keeps ~2n detections — on a perfectly calibrated
        # model that reads as ~2x over-count, so the convergence criterion
        # is the calibration-free strict count
        errs = [
            abs(int((np.asarray(r["scores"]) >= 0.5).sum()) - r["count_gt"])
            for r in results if r["count_gt"] is not None
        ]
        summary[split] = {
            **counting, "AP": metrics["AP"], "AP50": metrics["AP50"],
            "MAE@0.5": float(np.mean(errs)) if errs else float("nan"),
        }
        print(f"{split}: {json.dumps(summary[split])}")
    print("FINAL", json.dumps(summary))
    return summary


def run_lvis(root: str, out_dir: str, steps1: int = 150, steps2: int = 800,
             lr2: float = 1e-3):
    """FSCD-LVIS-flavor convergence: FSCDLvisExemplars (stage-1 wh
    regression from 3 exemplar boxes) -> pseudo_lvis_{split}_cxcywh.json ->
    FSCDLvisPseudo (stage-2) -> FSCDLvisEval inference -> offline LVIS
    evaluation. Proves the LVIS path's LEARNING loop (exemplar aggregation
    included), not just its mechanics (tests/test_e2e_lvis.py covers those).
    Reference pipeline being mirrored: CountDETR_lvis_{1st,2nd}_stage."""
    import jax

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.cli.offline_eval import evaluate_predictions
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

    DIMS = dict(enc_layers=2, dec_layers=2, hidden_dim=64, nheads=4,
                dim_feedforward=128)
    BUCKETS = ((96, 128),)
    B, H, W = 3, 96, 128

    # ---- stage 1 -----------------------------------------------------------
    cfg1 = cfglib.stage1_config()
    cfg1 = cfg1.replace(
        model=cfg1.model.replace(**DIMS),
        data=cfg1.data.replace(
            dataset="fscd_lvis", data_path=root, batch_size=B,
            buckets=BUCKETS, max_points=16,
        ),
        train=cfg1.train.replace(lr=1e-3, lr_drop=10**6),
    )
    model1 = CountingDetr(cfg1.model)
    ds1 = FSCDLvisExemplars(root, "train")
    b1 = Batcher(ds1, B, BUCKETS, max_points=16, shuffle=True)
    params1 = model1.init(
        jax.random.PRNGKey(0),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        np.full((B, 16, 2), 0.5, np.float32), np.ones((B, 16), bool),
    )
    tx1 = build_optimizer(cfg1.train, params1, steps_per_epoch=10**6)
    state1 = create_state(params1, tx1)
    step1 = make_train_step(model1, tx1, cfg1)

    first = None
    done = 0
    while done < steps1:
        for batch in b1:
            batch.pop("meta"), batch.pop("bucket")
            state1, m = step1(state1, batch)
            done += 1
            if first is None:
                first = float(m["loss"])
            if done >= steps1:
                break
    print(f"lvis stage1: loss {first:.4f} -> {float(m['loss']):.4f} "
          f"over {done} steps")

    # ---- pseudo labels (LVIS naming: pseudo_lvis_{split}_cxcywh.json) -----
    fwd1 = make_forward(model1, cfg1)
    os.makedirs(os.path.join(out_dir, "annotations"), exist_ok=True)
    for split in ("train", "test"):
        out = os.path.join(
            out_dir, "annotations", f"pseudo_lvis_{split}_cxcywh.json"
        )
        engine.generate_pseudo_labels(
            fwd1, state1.params, FSCDLvisPoints(root, split), cfg1, out
        )
    print("lvis pseudo labels written")

    # ---- stage 2 -----------------------------------------------------------
    cfg2 = cfglib.stage2_config()
    cfg2 = cfg2.replace(
        model=cfg2.model.replace(num_query_position=25, **DIMS),
        data=cfg2.data.replace(
            dataset="fscd_lvis", data_path=root, batch_size=B,
            buckets=BUCKETS, max_boxes=36, max_points=16,
        ),
        train=cfg2.train.replace(lr=lr2, lr_drop=10**6),
    )
    model2 = CountingDetr(cfg2.model)
    ds2 = FSCDLvisPseudo(
        root, "train",
        pseudo_file=os.path.join(
            out_dir, "annotations", "pseudo_lvis_train_cxcywh.json"
        ),
    )
    b2 = Batcher(ds2, B, BUCKETS, max_boxes=36, shuffle=True)
    params2 = model2.init(
        jax.random.PRNGKey(1),
        np.zeros((B, H, W, 3), np.float32), np.zeros((B, H, W), bool),
        exemplar_boxes=np.tile(
            np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (B, 3, 1)
        ),
    )
    tx2 = build_optimizer(cfg2.train, params2, steps_per_epoch=10**6)
    state2 = create_state(params2, tx2)
    step2 = make_train_step(model2, tx2, cfg2)
    done = 0
    while done < steps2:
        for batch in b2:
            batch.pop("meta"), batch.pop("bucket")
            state2, m = step2(state2, batch)
            done += 1
            if done % 100 == 0:
                print(f"lvis stage2 step {done}: "
                      f"loss={float(m['loss']):.4f}")
            if done >= steps2:
                break

    # ---- inference + offline LVIS evaluation -------------------------------
    # single_instances=False: the convergence criterion targets the full GT
    # (the single-instances test-GT variant intentionally drops one
    # annotation per image; GT-file selection is covered by
    # tests/test_e2e_lvis.py, not by this learning-loop proof)
    fwd2 = make_forward(model2, cfg2)
    summary = {}
    for split in ("train", "test"):
        ds_eval = FSCDLvisEval(root, split, single_instances=False)
        pred_path = os.path.join(out_dir, f"predictions_lvis_{split}.json")
        results = engine.infer_detections(
            fwd2, state2.params, ds_eval, cfg2, pred_path
        )
        counting = engine.counting_summary(results)
        metrics = evaluate_predictions(
            pred_path, root, dataset="fscd_lvis", split=split
        )
        errs = [
            abs(int((np.asarray(r["scores"]) >= 0.5).sum()) - r["count_gt"])
            for r in results if r["count_gt"] is not None
        ]
        summary[split] = {
            **counting, "AP": metrics["AP"], "AP50": metrics["AP50"],
            "MAE@0.5": float(np.mean(errs)) if errs else float("nan"),
        }
        print(f"lvis {split}: {json.dumps(summary[split])}")
    print("LVIS FINAL", json.dumps(summary))
    return summary


if __name__ == "__main__":
    # usage: python tests/convergence_run.py [steps2] [lr2] [fscd147|lvis]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    steps2 = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    lr2 = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    flavor = sys.argv[3] if len(sys.argv) > 3 else "fscd147"
    if flavor == "lvis":
        from synth_lvis import make_fscd_lvis

        root = make_fscd_lvis(
            "/tmp/conv_data_lvis",
            n_per_split={"train": 36, "val": 4, "test": 8},
            fixed_obj_size=(13, 11),
        )
        run_lvis(root, "/tmp/conv_out_lvis", steps1=300, steps2=steps2,
                 lr2=lr2)
    else:
        from synth import make_fscd147

        root = make_fscd147(
            "/tmp/conv_data2", n_train=48, n_val=4, n_test=8,
            fixed_obj_size=(14, 10),
        )
        run(root, "/tmp/conv_out", steps1=300, steps2=steps2, lr2=lr2)

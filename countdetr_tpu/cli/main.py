"""Unified CLI for the whole pipeline — one entry point instead of the
reference's four vendored trees x (main.py / infer.py / eval_all.py).

Flag names match the reference main.py (reference
CountDETR_147_1st_stage/main.py:27-132) where they map 1:1; the mode flags
are the same (--eval / --generate_pseudo_label / --test plus --infer from the
stage-2 infer.py:243-244). Dataset/stage selection replaces tree selection:

  stage 1 train   : --stage 1 --dataset_file fscd_147 --spatial_prior defined
                    --num_query_pattern 1   (weakly_supervise_fscd_147.sh)
  stage 1 pseudo  : same + --generate_pseudo_label (runs train/val/test points)
  stage 2 train   : --stage 2 --spatial_prior grid --num_query_position 600
                    (var_wh_laplace_600.sh)
  stage 2 infer   : --stage 2 --infer --checkpoint_path ...
  offline eval    : --evaluate_predictions preds.json (eval_all.py equivalent)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from countdetr_tpu.config import Config, DataConfig, ModelConfig, TrainConfig


def get_args_parser():
    p = argparse.ArgumentParser("Counting-DETR TPU", add_help=False)
    # optimization (reference main.py:29-45)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_backbone", default=1e-5, type=float)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--max_steps", default=0, type=int,
                   help="stop training after N total steps (0 = unlimited);"
                   " smoke-run cap used by scripts/replay_fscd147.sh SMOKE=1")
    p.add_argument("--lr_drop", default=20, type=int)
    p.add_argument("--lr_drop_epochs", default=None, type=int, nargs="+",
                   help="explicit drop epochs (MultiStepLR; overrides the "
                   "periodic --lr_drop, reference 2nd-stage main.py:39)")
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    p.add_argument("--sgd", action="store_true")
    # param-group name knobs (reference 2nd-stage main.py:31-34). The
    # defaults reproduce the reference grouping exactly (our optimizer
    # labels params by tree path: 'backbone' vs everything else); non-default
    # name lists have no counterpart in the flax tree and are rejected.
    p.add_argument("--lr_backbone_names", default=["backbone"], type=str,
                   nargs="+")
    p.add_argument("--lr_linear_proj_names", default=[], type=str, nargs="+")
    p.add_argument("--lr_linear_proj_mult", default=0.1, type=float)

    # model (reference main.py:52-95)
    p.add_argument("--backbone", default="resnet50", type=str)
    # store_true/false pair, NOT type=bool ('--dilation False' would parse
    # truthy); default True matches the reference's DC5 scripts (the
    # reference flag is store_true, main.py:55-57, and every published run
    # sets it)
    p.add_argument("--dilation", dest="dilation", action="store_true",
                   default=True)
    p.add_argument("--no_dilation", dest="dilation", action="store_false")
    p.add_argument("--num_feature_levels", default=1, type=int)
    p.add_argument("--enc_layers", default=6, type=int)
    p.add_argument("--dec_layers", default=6, type=int)
    p.add_argument("--dim_feedforward", default=1024, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--dropout", default=0.0, type=float)
    p.add_argument("--nheads", default=8, type=int)
    p.add_argument("--num_query_position", default=300, type=int)
    p.add_argument("--num_query_pattern", default=3, type=int)
    p.add_argument(
        "--spatial_prior", default="learned",
        choices=["learned", "grid", "defined", "sampled"],
    )
    p.add_argument(
        "--attention_type", default="RCDA", choices=["RCDA", "nn.MultiheadAttention"]
    )
    p.add_argument("--stage", default=1, type=int, choices=[1, 2])
    p.add_argument("--masks", action="store_true",
                   help="attach the DETRsegm-style mask head (reference "
                   "segmentation.py; no FSCD mask GT exists, so this only "
                   "adds pred_masks to the outputs)")
    p.add_argument("--aux_loss", dest="aux_loss", action="store_true", default=False)
    p.add_argument("--no_aux_loss", dest="aux_loss", action="store_false")

    # loss coefficients (reference main.py:96-121). The stage-2 tree renames
    # the matcher-cost flags to --cost_* (2nd-stage main.py:105-108); both
    # spellings are accepted here.
    p.add_argument("--set_cost_class", "--cost_class", dest="set_cost_class",
                   default=2, type=float)
    p.add_argument("--set_cost_bbox", "--cost_bbox", dest="set_cost_bbox",
                   default=5, type=float)
    p.add_argument("--set_cost_giou", "--cost_giou", dest="set_cost_giou",
                   default=2, type=float)
    # parsed-but-inert in the reference too: the chamfer matcher reads its
    # costs from defaults, the mask coefs multiply losses that never fire
    # without mask GT, and --device/--remove_difficult are torch artifacts
    # (2nd-stage main.py:110-115,126-131)
    p.add_argument("--chamfer_point_cost", default=1, type=float)
    p.add_argument("--chamfer_giou_cost", default=1, type=float)
    p.add_argument("--mask_loss_coef", default=1, type=float)
    p.add_argument("--dice_loss_coef", default=1, type=float)
    p.add_argument("--point_loss_coef", default=5, type=float)
    p.add_argument("--device", default="tpu", type=str,
                   help="accepted for reference-CLI compatibility; "
                   "placement is owned by jax")
    p.add_argument("--remove_difficult", action="store_true")
    p.add_argument("--cls_loss_coef", default=2, type=float)
    p.add_argument("--bbox_loss_coef", default=5, type=float)
    p.add_argument("--giou_loss_coef", default=2, type=float)
    p.add_argument("--variance_loss_coef", default=2, type=float)
    p.add_argument("--focal_alpha", default=0.25, type=float)

    # dataset
    p.add_argument(
        "--dataset_file", default="fscd_147",
        choices=["fscd_147", "fscd_147_point", "fscd_147_test", "fscd_lvis",
                 "fscd_lvis_point", "fscd_lvis_test"],
    )
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--output_dir", required=True, type=str)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--sync_checkpoint", action="store_true",
                   help="block the epoch loop on checkpoint writes instead "
                   "of the default async (background) Orbax save")
    p.add_argument("--checkpoint_path", default="", type=str)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--scale_factor", default=32, type=int)
    p.add_argument(
        "--num_sample_points", default=300, type=int,
        help="points drawn for --spatial_prior sampled (reference "
        "data/fsc147.py:127 hardcodes 300)",
    )
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--cache_mode", action="store_true",
                   help="cache raw image bytes in RAM (reference --cache_mode)")
    p.add_argument("--decoded_cache", action="store_true",
                   help="cache RESIZED uint8 images in RAM (~1 MB/img): "
                   "epoch 2+ skip JPEG decode entirely — feeds the chip "
                   "where --cache_mode only skips disk IO")
    p.add_argument("--decoded_cache_dir", default="", type=str,
                   help="directory for an ON-DISK resized-uint8 cache "
                   "shared across --num_workers processes and across runs "
                   "(unlike --decoded_cache, workers don't each re-decode "
                   "every image, and restarts start warm); overrides "
                   "--decoded_cache/--cache_mode")
    p.add_argument("--host_normalize", action="store_true",
                   help="ImageNet-normalize images on the HOST as float32 "
                   "(the reference pipeline). Default: ship raw resized "
                   "uint8 and normalize on device — identical math in f32, "
                   "4x less host->device traffic. --exact_replay implies "
                   "this (bit-faithful host arithmetic)")
    p.add_argument("--no_pack_s2d", action="store_true",
                   help="disable space-to-depth packing of batched images "
                   "(host emits (B,H/2,W/2,12); the device never touches a "
                   "3-channel-minor tensor — ~1.4x faster backbone on TPU). "
                   "Packing is already off under --host_normalize / "
                   "--exact_replay (bit-faithful reference arithmetic)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first training "
                   "epoch into {output_dir}/profile (the reference's only "
                   "tracing is compute_flops_and_speeds.py; see also "
                   "cli/bench.py --mode flops)")
    p.add_argument("--log_every", default=100, type=int)

    # modes
    p.add_argument("--vis_pseudo", action="store_true",
                   help="draw generated pseudo/predicted boxes onto images "
                   "(reference --vis_pseudo + the evaluators' vis_res dumps)")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--generate_pseudo_label", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--infer", action="store_true")
    p.add_argument("--use_predefined_points", action="store_true",
                   help="accepted for reference-CLI compatibility and inert, "
                   "exactly like the reference: infer.py:243-244 defines the "
                   "flag (twice) but no code ever reads it")
    p.add_argument("--evaluate_predictions", default="", type=str,
                   help="offline evaluator: path to predictions json")
    p.add_argument("--eval_split", default="test", choices=["val", "test"],
                   help="GT split for --evaluate_predictions")

    # TPU additions
    p.add_argument(
        "--exact_replay", action="store_true",
        help="reference-exact schedule replay: forces batch_size 1 so the "
        "update sequence matches the reference's per-image training "
        "(2nd stage: 1200 epochs at batch 1, var_wh_laplace_600.sh), and "
        "routes matching through the reference's exact scipy LAP (host "
        "callback) instead of the on-device eps-auction, so tie-breaks are "
        "bit-faithful too. Without it, scale --lr linearly with batch_size "
        "from the reference's 1e-4-at-batch-1 baseline.",
    )
    p.add_argument("--buckets", default="384x384,384x512,384x672", type=str)
    p.add_argument("--max_points", default=700, type=int)
    p.add_argument("--max_boxes", default=700, type=int)
    p.add_argument("--compute_dtype", default="float32", type=str)
    p.add_argument("--matmul_precision", default="default",
                   choices=["default", "high", "highest"])
    return p


def config_from_args(args) -> Config:
    model = ModelConfig(
        backbone=args.backbone,
        dilation=bool(args.dilation),
        num_feature_levels=args.num_feature_levels,
        hidden_dim=args.hidden_dim,
        nheads=args.nheads,
        enc_layers=args.enc_layers,
        dec_layers=args.dec_layers,
        dim_feedforward=args.dim_feedforward,
        dropout=args.dropout,
        attention_type="RCDA" if args.attention_type == "RCDA" else "MHA",
        num_query_position=args.num_query_position,
        num_query_pattern=args.num_query_pattern,
        spatial_prior=args.spatial_prior,
        stage=args.stage,
        masks=args.masks,
        with_variance_head=args.stage == 2,
        exemplar_aggregation=args.stage == 2,
        aux_loss=args.aux_loss,
        compute_dtype=args.compute_dtype,
    )
    buckets = tuple(
        tuple(int(v) for v in b.split("x")) for b in args.buckets.split(",")
    )
    data = DataConfig(
        dataset="fscd_lvis" if "lvis" in args.dataset_file else "fscd_147",
        data_path=args.data_path,
        scale_factor=args.scale_factor,
        batch_size=1 if args.exact_replay else args.batch_size,
        num_workers=args.num_workers,
        cache_mode=args.cache_mode,
        decoded_cache=args.decoded_cache,
        decoded_cache_dir=args.decoded_cache_dir,
        host_normalize=bool(args.host_normalize or args.exact_replay),
        pack_s2d=not bool(
            args.host_normalize or args.exact_replay or args.no_pack_s2d
        ),
        num_sampled_points=(
            args.num_sample_points if args.spatial_prior == "sampled" else 0
        ),
        max_points=args.max_points,
        max_boxes=args.max_boxes,
        buckets=buckets,
    )
    if args.lr_backbone_names != ["backbone"] or args.lr_linear_proj_names:
        raise SystemExit(
            "--lr_backbone_names/--lr_linear_proj_names: only the reference "
            "defaults (['backbone'] / []) map onto this parameter tree — "
            "param groups here are the fixed backbone/main split "
            "(train/optimizer.py)"
        )
    train = TrainConfig(
        lr=args.lr,
        lr_backbone=args.lr_backbone,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        max_steps=args.max_steps,
        lr_drop=args.lr_drop,
        lr_drop_epochs=(
            tuple(args.lr_drop_epochs) if args.lr_drop_epochs else None
        ),
        clip_max_norm=args.clip_max_norm,
        sgd=args.sgd,
        seed=args.seed,
        cls_loss_coef=args.cls_loss_coef,
        bbox_loss_coef=args.bbox_loss_coef,
        giou_loss_coef=args.giou_loss_coef,
        variance_loss_coef=args.variance_loss_coef,
        focal_alpha=args.focal_alpha,
        set_cost_class=args.set_cost_class,
        set_cost_bbox=args.set_cost_bbox,
        set_cost_giou=args.set_cost_giou,
        exact_match=args.exact_replay,
        output_dir=args.output_dir,
        resume=args.resume,
        auto_resume=args.auto_resume,
        async_checkpoint=not args.sync_checkpoint,
        log_every=args.log_every,
    )
    return Config(model=model, data=data, train=train)


def _image_dir(cfg: Config) -> str:
    return (
        os.path.join("images", "all_images")
        if cfg.data.dataset == "fscd_lvis" else "images_384_VarV2"
    )


def build_dataset(name: str, split: str, cfg: Config, pseudo: bool = False):
    ds = _build_dataset(name, split, cfg, pseudo)
    # raw-uint8 pipe by default; --host_normalize / --exact_replay revert
    ds.host_normalize = cfg.data.host_normalize
    return ds


def _build_dataset(name: str, split: str, cfg: Config, pseudo: bool = False):
    dp, sf = cfg.data.data_path, cfg.data.scale_factor
    if cfg.data.dataset == "fscd_147":
        from countdetr_tpu.data import fscd147 as D

        nsp = cfg.data.num_sampled_points
        cm = ("disk:" + cfg.data.decoded_cache_dir
              if cfg.data.decoded_cache_dir else
              "decoded" if cfg.data.decoded_cache else
              cfg.data.cache_mode)
        if pseudo:
            return D.FSC147Pseudo(
                dp, split, sf, num_sampled_points=nsp, cache_mode=cm
            )
        if name.endswith("_point"):
            return D.FSCD147Points(dp, split, sf, cache_mode=cm)
        if name.endswith("_test"):
            return D.FSCD147Eval(
                dp, split, sf, num_sampled_points=nsp, cache_mode=cm
            )
        return D.FSCD147Exemplars(dp, split, sf, cache_mode=cm)
    else:
        from countdetr_tpu.data import fscd_lvis as D

        cm = ("disk:" + cfg.data.decoded_cache_dir
              if cfg.data.decoded_cache_dir else
              "decoded" if cfg.data.decoded_cache else
              cfg.data.cache_mode)
        if pseudo:
            return D.FSCDLvisPseudo(dp, split, sf, cache_mode=cm)
        if name.endswith("_point"):
            return D.FSCDLvisPoints(dp, split, sf, cache_mode=cm)
        if name.endswith("_test"):
            # stage-2 eval prefers the single-instances GT when present
            # (reference FSCD_LVIS_Dataset_Test reads
            # single_instances_test.json, lvis_2nd data/fscd_lvis.py:101-103)
            single = cfg.model.stage == 2 and os.path.exists(
                os.path.join(
                    dp, "annotations", f"single_instances_{split}.json"
                )
            )
            return D.FSCDLvisEval(
                dp, split, sf, single_instances=single, cache_mode=cm
            )
        return D.FSCDLvisExemplars(dp, split, sf, cache_mode=cm)


def get_sha() -> str:
    """git state banner (reference util/misc.py:255-273)."""
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=cwd, stderr=subprocess.DEVNULL
        ).decode().strip()
    except Exception:
        return "sha: unknown"
    dirty = "clean"
    try:
        subprocess.check_output(
            ["git", "diff-index", "--quiet", "HEAD"], cwd=cwd,
            stderr=subprocess.DEVNULL,
        )
    except Exception:
        dirty = "has uncommitted changes"
    return f"sha: {sha} ({dirty})"


def main(args):
    # multi-host rendezvous first, before any backend use (the reference
    # calls init_distributed_mode at the top of every main —
    # main.py:139, util/misc.py:399-436); no-op without the env vars
    from countdetr_tpu.core.mesh import (
        gather_metrics, init_distributed, is_main_process,
    )

    init_distributed()
    if is_main_process():
        print(get_sha())
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    os.makedirs(args.output_dir, exist_ok=True)
    cfg = config_from_args(args)
    if cfg.model.spatial_prior == "sampled" and cfg.data.dataset == "fscd_lvis":
        raise SystemExit(
            "--spatial_prior sampled needs density-drawn points, which only "
            "the FSCD-147 datasets emit (the reference's sampled prior is a "
            "147 2nd-stage capability, data/fsc147.py:259-284)"
        )

    if args.evaluate_predictions:
        from countdetr_tpu.cli.offline_eval import evaluate_predictions

        metrics = evaluate_predictions(
            args.evaluate_predictions, cfg.data.data_path,
            dataset=cfg.data.dataset, split=args.eval_split,
        )
        print(json.dumps(metrics, indent=2))
        return metrics

    from countdetr_tpu.core.mesh import make_mesh
    from countdetr_tpu.data.batching import Batcher
    from countdetr_tpu.models import CountingDetr
    from countdetr_tpu.train import checkpoints as ckpt
    from countdetr_tpu.train import engine
    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import (
        create_state, make_eval_step, make_forward, make_train_step,
    )

    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    model = CountingDetr(cfg.model)
    rng = jax.random.PRNGKey(cfg.train.seed)

    # init with a dummy batch of the smallest bucket
    H, W = cfg.data.buckets[0]
    B = cfg.data.batch_size
    dummy_img = np.zeros((B, H, W, 3), np.float32)
    dummy_mask = np.zeros((B, H, W), bool)
    if cfg.model.stage == 1:
        P = cfg.data.max_points if args.generate_pseudo_label else cfg.model.num_query_position
        params = model.init(
            rng, dummy_img, dummy_mask,
            np.full((B, P, 2), 0.5, np.float32), np.ones((B, P), bool),
        )
    else:
        init_kw = {}
        if cfg.model.spatial_prior == "sampled":
            S = max(cfg.data.num_sampled_points, 1)
            init_kw = dict(
                points=np.full((B, S, 2), 0.5, np.float32),
                points_valid=np.ones((B, S), bool),
            )
        params = model.init(
            rng, dummy_img, dummy_mask,
            exemplar_boxes=np.tile(
                np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (B, 3, 1)
            ),
            **init_kw,
        )

    # restore / import weights. In TRAINING mode a native --resume dir is
    # handled later, after the optimizer exists, so opt_state + epoch + the
    # StepLR position restore too (the reference restores
    # model+optimizer+lr_scheduler+epoch, main.py:217-238); here only the
    # params-consuming modes (infer/test/pseudo/eval) restore params.
    training_mode = not (
        args.generate_pseudo_label or args.test or args.infer or args.eval
    )
    if args.checkpoint_path or args.resume:
        path = args.checkpoint_path or args.resume
        if path.endswith(".pth"):
            sd = ckpt.load_torch_checkpoint(path)
            # strict: a mapping bug that leaves reference keys unconsumed
            # must fail loudly HERE (on the real pretrained checkpoint),
            # not silently run with init values in those layers
            params = ckpt.torch_state_dict_to_params(sd, params, strict=True)
            print(f"imported torch checkpoint {path}")
        elif not (training_mode and args.resume and not args.checkpoint_path):
            step = ckpt.latest_step(path)
            if step is not None:
                dummy_tx = build_optimizer(cfg.train, params, 1)
                st = create_state(params, dummy_tx)
                params, _, meta = ckpt.restore_checkpoint(path, step, st)
                print(f"restored {path} step {step}")

    forward = make_forward(model, cfg)

    if args.generate_pseudo_label:
        lvis = cfg.data.dataset == "fscd_lvis"
        for split in ("train", "val", "test"):
            ds = build_dataset(args.dataset_file + "_point", split, cfg)
            # reference naming: 147 consumers read pseudo_bbox_{split}.json;
            # LVIS consumers read pseudo_lvis_{split}_cxcywh.json and the
            # generator also writes an xywh twin (generate_pseudo.py:26-109)
            if lvis:
                out = os.path.join(
                    args.output_dir, f"pseudo_lvis_{split}_cxcywh.json"
                )
                xywh = os.path.join(
                    args.output_dir, f"pseudo_lvis_{split}_xywh.json"
                )
            else:
                out = os.path.join(args.output_dir, f"pseudo_bbox_{split}.json")
                xywh = None
            engine.generate_pseudo_labels(
                forward, params, ds, cfg, out, mesh, also_xywh_path=xywh
            )
            print(f"wrote {out}")
            if args.vis_pseudo:
                from countdetr_tpu.cli.offline_eval import visualize_predictions

                n = visualize_predictions(
                    out, cfg.data.data_path,
                    os.path.join(args.output_dir, "vis_pseudo", split),
                    image_dir=_image_dir(cfg),
                )
                print(f"visualized {n} images")
        return

    if args.test and cfg.model.stage == 1:
        # stage-1 test mode: GT box centers as anchors, top-100 emission
        # (reference 1st-stage engine.py:190-265)
        ds = build_dataset(args.dataset_file + "_test", "test", cfg)
        out = os.path.join(args.output_dir, "pseudo_test_anchor_detr_v3.json")
        vis = (
            os.path.join(args.output_dir, "vis_res") if args.vis_pseudo else None
        )
        engine.stage1_test(forward, params, ds, cfg, out, mesh, vis_dir=vis)
        print(f"wrote {out}")
        return

    if args.infer or args.test:
        from countdetr_tpu.cli.offline_eval import evaluate_results

        all_metrics = {}
        for split in ("val", "test"):
            ds = build_dataset(args.dataset_file + "_test", split, cfg)
            out = os.path.join(args.output_dir, f"predictions_{split}.json")
            results = engine.infer_detections(forward, params, ds, cfg, out, mesh)
            counting = engine.counting_summary(results)
            from countdetr_tpu.cli.offline_eval import (
                _gt_xywh_by_name, analyze_results, per_image_ap,
            )

            gt_by_name = _gt_xywh_by_name(ds)  # built once, used twice
            ap = evaluate_results(results, ds, by_name=gt_by_name)
            # per-split subdir: the val report must not be overwritten by test
            analyze_results(
                results, os.path.join(args.output_dir, f"report_{split}"),
                image_aps=per_image_ap(results, ds, by_name=gt_by_name),
            )
            if args.vis_pseudo:
                from countdetr_tpu.cli.offline_eval import visualize_predictions

                visualize_predictions(
                    out, cfg.data.data_path,
                    os.path.join(args.output_dir, "vis_res", split),
                    image_dir=_image_dir(cfg),
                )
            all_metrics[split] = {**counting, **ap}
            print(split, json.dumps(all_metrics[split], indent=2))
        with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
            json.dump(all_metrics, f, indent=2)
        return all_metrics

    if args.eval:
        # validation-only: run the criterion over the val split and exit
        # (reference main.py:240-247 evaluates data_loader_val and returns)
        val_ds = build_dataset(
            args.dataset_file, "val", cfg, pseudo=cfg.model.stage == 2
        )
        vb = Batcher(
            val_ds, B, cfg.data.buckets,
            max_points=cfg.data.max_points, max_boxes=cfg.data.max_boxes,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            pack_s2d=cfg.data.pack_s2d,
        )
        eval_step = make_eval_step(model, cfg, mesh=mesh)
        vstats = engine.evaluate(eval_step, params, vb, mesh)
        vstats = gather_metrics(
            vstats, weight=vstats.pop("real_samples", 1.0)
        )
        if is_main_process():
            print(json.dumps(vstats, indent=2))
            with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
                json.dump(vstats, f, indent=2)
        return vstats

    # ---- training ----------------------------------------------------------
    train_ds = build_dataset(
        args.dataset_file, "train", cfg, pseudo=cfg.model.stage == 2
    )
    val_ds = None
    try:
        val_ds = build_dataset(
            args.dataset_file, "val", cfg, pseudo=cfg.model.stage == 2
        )
    except (FileNotFoundError, KeyError):
        pass

    # stage-2 box capacity tiers: dense FSC-147 images carry up to ~3.7k
    # pseudo boxes; tiers let them reach the matcher whole (the reference's
    # scipy LAP sees ALL targets, matcher.py:243-246) while a few fixed
    # capacities bound recompiles
    mb = cfg.data.max_boxes
    box_tiers = (
        tuple(sorted({min(mb, 128), mb, max(8 * mb, 4096)}))
        if cfg.model.stage == 2 else None
    )
    batcher = Batcher(
        train_ds, B, cfg.data.buckets,
        max_points=cfg.data.max_points, max_boxes=cfg.data.max_boxes,
        shuffle=True, seed=cfg.train.seed,
        box_tiers=box_tiers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        num_workers=cfg.data.num_workers,
        pack_s2d=cfg.data.pack_s2d,
    )
    # exact per-epoch step count so the StepLR boundary lands on the true
    # epoch edge. The Batcher's schedule is GLOBAL (identical on every
    # host: same count, same per-step bucket/tier shapes), so multi-host
    # lockstep needs no cross-host negotiation here.
    steps_per_epoch = max(batcher.num_batches(), 1)
    tx = build_optimizer(cfg.train, params, steps_per_epoch)
    state = create_state(params, tx)

    start_epoch = args.start_epoch
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    saver = ckpt.AsyncSaver() if cfg.train.async_checkpoint else None

    def _full_restore(directory: str, label: str) -> bool:
        """params + opt_state (Adam moments, StepLR position) + epoch + the
        optimizer step counter — a mid-training restart continues the exact
        update sequence (reference main.py:217-238)."""
        nonlocal state, start_epoch
        step = ckpt.latest_step(directory)
        if step is None:
            return False
        p, o, meta = ckpt.restore_checkpoint(directory, step, state)
        state = state._replace(params=p, opt_state=o)
        if meta.get("opt_step") is not None:
            import jax.numpy as jnp

            state = state._replace(
                step=jnp.asarray(meta["opt_step"], jnp.int32)
            )
        start_epoch = meta.get("epoch", 0) + 1
        print(f"{label}: continuing at epoch {start_epoch}")
        return True

    resumed = args.auto_resume and _full_restore(ckpt_dir, "auto-resumed")
    if not resumed and args.resume and not args.resume.endswith(".pth"):
        _full_restore(args.resume, f"resumed {args.resume}")

    if jax.process_count() > 1:
        # jit over a multi-host mesh needs GLOBAL arrays on every input;
        # params/opt_state from init or restore are process-local
        from countdetr_tpu.core.mesh import replicate

        with mesh:
            state = state._replace(
                params=replicate(state.params, mesh),
                opt_state=replicate(state.opt_state, mesh),
                step=replicate(state.step, mesh),
                bad_steps=replicate(state.bad_steps, mesh),
            )

    train_step = make_train_step(model, tx, cfg, mesh=mesh)
    eval_step = (
        make_eval_step(model, cfg, mesh=mesh) if val_ds is not None else None
    )
    log_path = os.path.join(args.output_dir, "log.txt")
    vb = None
    if val_ds is not None and eval_step is not None:
        # built once (a per-epoch Batcher would respawn its worker pool);
        # global schedule => identical per-host val step counts/shapes, so
        # multi-host needs no step_cap negotiation (hosts running different
        # numbers of collective eval programs would deadlock)
        vb = Batcher(
            val_ds, B, cfg.data.buckets,
            max_points=cfg.data.max_points, max_boxes=cfg.data.max_boxes,
            box_tiers=box_tiers,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            num_workers=cfg.data.num_workers,
            pack_s2d=cfg.data.pack_s2d,
        )

    profiling = False
    steps_done = 0
    for epoch in range(start_epoch, cfg.train.epochs):
        if cfg.train.max_steps and steps_done >= cfg.train.max_steps:
            print(f"max_steps {cfg.train.max_steps} reached; stopping")
            break
        if args.profile and epoch == start_epoch and is_main_process():
            jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))
            profiling = True
        t0 = time.time()
        state, stats = engine.train_one_epoch(
            train_step, state, batcher, mesh, epoch, cfg.train.log_every,
            prefetch_depth=max(args.num_workers, 1),
            max_steps=(
                cfg.train.max_steps - steps_done
                if cfg.train.max_steps else None
            ),
        )
        steps_done += int(stats.pop("steps", 0))
        stats["epoch_time_s"] = time.time() - t0
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profile trace: {os.path.join(args.output_dir, 'profile')}")
        # cross-host metric averaging, weighted by each host's real
        # (non-padding) sample count (reference reduce_dict /
        # synchronize_between_processes); identity when single-process.
        # Val metrics are gathered SEPARATELY with the val host weight —
        # merging them pre-gather would weight them by the TRAIN host's
        # real-sample count, mis-weighting hosts with uneven val padding.
        host_weight = float(stats.pop("real_samples", 1.0))
        stats = {
            **gather_metrics(
                {k: v for k, v in stats.items()
                 if isinstance(v, (int, float, np.floating))},
                weight=host_weight,
            ),
            **{k: v for k, v in stats.items()
               if not isinstance(v, (int, float, np.floating))},
        }
        if vb is not None:
            vstats = engine.evaluate(eval_step, state.params, vb, mesh)
            vstats = gather_metrics(
                vstats, weight=float(vstats.pop("real_samples", 1.0))
            )
            stats.update({f"val_{k}": v for k, v in vstats.items()})
        if is_main_process():
            with open(log_path, "a") as f:
                f.write(json.dumps({k: float(v) if isinstance(v, (int, float, np.floating)) else v for k, v in stats.items()}) + "\n")
        if (epoch + 1) % cfg.train.checkpoint_every == 0 or epoch == cfg.train.epochs - 1:
            # ALL processes call the save (Orbax saving of global arrays is
            # a collective; rank 0 alone writes the side-car metadata —
            # unlike the reference's torch save_on_master, main.py:302-311)
            if saver is not None:
                saver.save(ckpt_dir, epoch, state, {"epoch": epoch}, cfg=cfg)
            else:
                ckpt.save_checkpoint(
                    ckpt_dir, epoch, state, {"epoch": epoch}, cfg=cfg
                )
    if saver is not None:
        # commit the in-flight write + publish latest.json before anything
        # (a follow-on --infer invocation, the user) reads the directory
        saver.finalize()
    if is_main_process():
        print("training done")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "Counting-DETR TPU", parents=[get_args_parser()]
    )
    main(parser.parse_args())


def cli_entry():
    parser = argparse.ArgumentParser(
        "Counting-DETR TPU", parents=[get_args_parser()]
    )
    main(parser.parse_args())

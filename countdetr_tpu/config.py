"""Typed configuration for the whole framework.

The reference scatters ~45 argparse flags per entry point
(reference CountDETR_147_1st_stage/main.py:27-132); here all of it is three
dataclasses with the same knobs, plus TPU-specific additions (buckets, mesh,
dtype policy). CLI flag names map 1:1 where the reference has the same flag.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """AnchorDETR-style model (reference models/transformer.py:20-97,
    models/anchor_detr.py:33-113 stage 1 / :34-140 stage 2)."""

    # backbone (reference main.py flags --backbone / --dilation)
    backbone: str = "resnet50"
    dilation: bool = True  # DC5: stride-16 C5 features
    num_feature_levels: int = 1

    # transformer
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.0
    activation: str = "relu"
    attention_type: str = "RCDA"  # "RCDA" | "MHA"

    # queries (reference transformer.py:99-143)
    num_query_position: int = 300
    num_query_pattern: int = 3
    spatial_prior: str = "learned"  # learned | grid | defined | sampled

    num_classes: int = 2  # cls head output width (reference transformer.py:76-78)

    # segmentation head (reference --masks, segmentation.py:19-60 DETRsegm —
    # dead code in the reference's scripts but part of its capability surface)
    masks: bool = False

    # stage switches
    stage: int = 1  # 1: point->wh pseudo-GT regressor; 2: uncertainty detector
    with_variance_head: bool = False  # stage-2 Laplace var head (stage2 transformer.py:82)
    exemplar_aggregation: bool = False  # stage-2 BackboneAgg (stage2 backbone.py:116-145)
    aux_loss: bool = False

    # TPU knobs
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 for speed once parity is pinned
    # Fused Pallas RCDA. Applied ENCODER-only by default
    # (COUNTDETR_PALLAS_RCDA_SCOPE in transformer.py): encoder v3 kernel +
    # einsum decoder measured 419 vs 395 img/s all-einsum vs 358 kernel-
    # everywhere at the 592px/B=32 eval geometry (PERFORMANCE.md round-5
    # combine table). Auto-falls back to the einsum cores off single-device
    # TPU processes (ops/rcda.py::_pallas_rcda_available); backward is the
    # rematerialized einsum either way.
    use_pallas_rcda: bool = True
    remat: bool = False  # jax.checkpoint each transformer layer (memory/FLOPs trade)

    @property
    def num_queries(self) -> int:
        if self.spatial_prior == "grid":
            n = round(math.sqrt(self.num_query_position))
            return n * n * self.num_query_pattern
        return self.num_query_position * self.num_query_pattern

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset + fixed-shape batching.

    The reference runs batch_size=1 with fully dynamic shapes
    (reference main.py:34, datasets/fscd_147.py:58-60). XLA wants static
    shapes, so images are resized to /scale_factor multiples (same as the
    reference) and then padded into a small set of (H, W) buckets with a
    boolean padding mask; points/boxes are padded to fixed counts with
    validity masks.
    """

    dataset: str = "fscd_147"  # fscd_147 | fscd_lvis
    data_path: str = ""
    scale_factor: int = 32
    batch_size: int = 8
    num_workers: int = 2
    # in-RAM raw-bytes image cache (reference --cache_mode,
    # torchvision_datasets/coco.py:54-73)
    cache_mode: bool = False
    # resized-uint8 decoded cache: epoch 2+ skip JPEG decode + resize
    # entirely (TPU addition — see data/fscd147.load_image); overrides
    # cache_mode when both are set
    decoded_cache: bool = False
    # on-disk decoded cache directory, SHARED across worker processes and
    # runs (data/cache.py); overrides decoded_cache/cache_mode when set
    decoded_cache_dir: str = ""
    # True: datasets emit ImageNet-normalized float32 (the reference's host
    # pipeline). False (CLI default): raw resized uint8 — the model
    # normalizes on device, host->device transfer shrinks 4x
    # (models/anchor_detr.py::normalize_uint8)
    host_normalize: bool = True
    # space-to-depth-pack batched images on the host: (B, H, W, 3) ->
    # (B, H/2, W/2, 12), so the device never touches a 3-channel-minor
    # tensor (22 ms/forward of layout tax at the 592px/B=32 eval geometry —
    # data/batching.py::pack_space_to_depth). The stem conv runs the exact
    # 4x4/s1 equivalent (models/resnet.py::StemConv). CLI default: on for
    # the raw-uint8 pipe, off under --host_normalize/--exact_replay.
    pack_s2d: bool = False

    # 'sampled' spatial prior: points drawn per image from the density map
    # (reference data/fsc147.py:127 — 300); 0 disables emission
    num_sampled_points: int = 0

    # padded-shape capacities
    max_points: int = 700  # dot annotations per image (FSC-147 max ~3700 on train outliers; bucketized)
    max_boxes: int = 700  # pseudo/GT boxes per image for stage-2 targets
    max_exemplars: int = 3

    # (H, W) buckets after /32 resize; images pad up to the smallest fitting bucket
    buckets: Tuple[Tuple[int, int], ...] = ((384, 384), (384, 512), (384, 672))

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization — reference defaults (main.py:29-45)."""

    lr: float = 1e-4
    lr_backbone: float = 1e-5
    weight_decay: float = 1e-4
    epochs: int = 30
    # optional global train-step cap (0 = unlimited) — smoke runs: prove
    # the real-data pipeline end-to-end in ~50 steps per phase before
    # committing to the multi-hour schedule
    max_steps: int = 0
    lr_drop: int = 20  # StepLR: lr *= 0.1 at epoch lr_drop
    # explicit drop epochs (MultiStepLR; overrides lr_drop when set —
    # reference 2nd-stage main.py:39 --lr_drop_epochs)
    lr_drop_epochs: Optional[Tuple[int, ...]] = None
    clip_max_norm: float = 0.1
    sgd: bool = False
    seed: int = 42

    # loss coefficients (reference main.py:96-121; stage1 anchor_detr.py:320)
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    variance_loss_coef: float = 2.0
    wh_loss_coef: float = 1.0  # stage-1 BoundingBoxCriterion weights
    stage1_giou_coef: float = 0.4
    focal_alpha: float = 0.25

    # matcher costs (reference main.py:96-99)
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0
    # --exact_replay: matching via a host callback to scipy's exact LAP so
    # the update sequence is bit-faithful to the reference's per-image
    # scipy matcher (2nd-stage matcher.py:243-246) instead of the on-device
    # eps-auction (measured gaps <= 0.05% of optimal)
    exact_match: bool = False

    # checkpointing
    output_dir: str = ""
    resume: str = ""
    auto_resume: bool = False
    checkpoint_every: int = 1  # epochs
    # retention (reference main.py:297-311: one rolling checkpoint + keep
    # every 10th epoch + lr-drop snapshots). keep_last <= 0 disables GC.
    checkpoint_keep_last: int = 1
    checkpoint_keep_every: int = 10
    # overlap the Orbax write with the next epoch's compute (the reference
    # blocks its loop on torch.save, main.py:297-311); --sync_checkpoint
    # restores blocking saves
    async_checkpoint: bool = True
    log_every: int = 100  # steps

    # parallelism
    mesh_shape: Tuple[int, ...] = (-1,)  # -1: all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def stage1_config(dataset: str = "fscd_147", **model_kw) -> Config:
    """Stage-1 pseudo-GT regressor: exemplar centers as anchors, no matching.

    Mirrors scripts/weakly_supervise_fscd_147.sh (reference) flags:
    --spatial_prior defined --num_query_pattern 1.
    """
    model = ModelConfig(
        stage=1,
        spatial_prior="defined",
        num_query_pattern=1,
        num_query_position=3,
        with_variance_head=False,
        exemplar_aggregation=False,
        **model_kw,
    )
    return Config(model=model, data=DataConfig(dataset=dataset))


def stage2_config(dataset: str = "fscd_147", **model_kw) -> Config:
    """Stage-2 uncertainty-aware detector: grid prior, 600 queries, 1 pattern,
    variance head, exemplar feature aggregation.

    Mirrors scripts/var_wh_laplace_600.sh (reference) flags:
    --spatial_prior grid --num_query_position 600 --num_query_pattern 1
    --no_aux_loss --epochs 1200.
    """
    model = ModelConfig(
        stage=2,
        spatial_prior="grid",
        num_query_pattern=1,
        num_query_position=600,
        with_variance_head=True,
        exemplar_aggregation=True,
        aux_loss=False,
        **model_kw,
    )
    return Config(
        model=model,
        data=DataConfig(dataset=dataset),
        train=TrainConfig(epochs=1200),
    )

"""CountingDetr — the full model for BOTH stages of the reference pipeline,
selected by ModelConfig.stage.

stage 1 (reference 1st-stage models/anchor_detr.py:33-113):
  backbone -> 1x1 input_proj(2048->256)+GroupNorm(32) -> transformer with
  'defined' prior (the annotated points ARE the anchors) -> heads; outputs
  {pred_logits, pred_points, pred_wh}.

stage 2 (reference 2nd-stage models/anchor_detr.py:34-140, backbone.py:116-145):
  backbone C5 + exemplar feature aggregation (per-exemplar center-pixel
  feature, mean over exemplars, channel-wise modulation, concat -> 4096ch)
  -> aggr_input_proj(4096->256)+GN -> transformer with grid prior and a
  Laplace variance head; outputs {pred_logits, pred_boxes, pred_vars,
  reference_points} (+aux_outputs when aux_loss).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from countdetr_tpu.config import ModelConfig
from countdetr_tpu.models.resnet import ResNetBackbone, downsample_mask
from countdetr_tpu.models.transformer import Transformer
from countdetr_tpu.ops.posemb import grid_reference_points


# ImageNet normalization constants — must match data/fscd147.py's
# IMAGENET_MEAN/STD (tests/test_model.py pins the equality). Defined here
# too so the model layer doesn't import the data layer (PIL etc.).
_IMNET_MEAN = (0.485, 0.456, 0.406)
_IMNET_STD = (0.229, 0.224, 0.225)


def normalize_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize raw uint8 images on device, in float32 — the same
    math the host path runs in numpy (data/fscd147.py::load_image). Raw
    uint8 through the input pipe means 4x less host->device traffic and no
    per-image host float math; the few fused VPU ops here are free next to
    the backbone convs.

    Accepts 3-channel images or the space-to-depth-packed 12-channel form
    (data/batching.py::pack_space_to_depth, channel fastest within each 2x2
    block) — the constants tile accordingly."""
    reps = images.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(_IMNET_MEAN, jnp.float32), reps)
    std = jnp.tile(jnp.asarray(_IMNET_STD, jnp.float32), reps)
    return (images.astype(jnp.float32) / 255.0 - mean) / std


def pack_mask_s2d(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) bool -> (B, H/2, W/2, 12) bool matching
    pack_space_to_depth's channel order ((a*2+b)*3 + c), for re-zeroing
    padded pixels of a packed image. Content sizes inside a bucket can be
    odd, so a packed cell may be half padding — per-channel masking keeps
    the packed path bit-faithful to the full-resolution one."""
    B, H, W = pad_mask.shape
    m4 = pad_mask.reshape(B, H // 2, 2, W // 2, 2).transpose(0, 1, 3, 2, 4)
    return jnp.repeat(m4.reshape(B, H // 2, W // 2, 4), 3, axis=-1)


def _xavier_conv(key, shape, dtype=jnp.float32):
    """torch xavier_uniform_ for a conv weight, gain=1 (reference
    anchor_detr.py:76-78). flax kernels are (kh, kw, in, out)."""
    kh, kw, cin, cout = shape
    rf = kh * kw
    limit = math.sqrt(6.0 / (cin * rf + cout * rf))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class MaskedGroupNorm(nn.Module):
    """GroupNorm(32) whose statistics only see VALID pixels.

    torch GroupNorm at batch=1 (the reference, anchor_detr.py:70) normalizes
    over the whole H x W map; with bucketed padding the padded zeros would
    shift every image's statistics by an amount that depends on the bucket,
    so the masked form is required for padding invariance. With no padding it
    is exactly torch GroupNorm.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, valid=None):
        B, H, W, C = x.shape
        G = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        # statistics always in fp32 (bf16 accumulation over H*W*C/G elements
        # loses too much precision)
        xg = x.reshape(B, H, W, G, C // G).astype(jnp.float32)
        if valid is None:
            mean = xg.mean(axis=(1, 2, 4), keepdims=True)
            var = jnp.square(xg - mean).mean(axis=(1, 2, 4), keepdims=True)
        else:
            v = valid[..., None, None].astype(jnp.float32)  # (B,H,W,1,1)
            n = jnp.maximum(v.sum(axis=(1, 2, 3, 4), keepdims=True), 1.0) * (C // G)
            mean = (xg * v).sum(axis=(1, 2, 4), keepdims=True) / n
            var = (jnp.square(xg - mean) * v).sum(axis=(1, 2, 4), keepdims=True) / n
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xg.reshape(B, H, W, C) * scale + bias
        return out.astype(x.dtype)


class InputProj(nn.Module):
    """conv + GroupNorm(32) (reference anchor_detr.py:49-73): 1x1 for single
    level; for multi-level, the lowest level uses a 3x3 stride-2 conv."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, valid=None):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), use_bias=True,
            kernel_init=_xavier_conv, bias_init=nn.initializers.zeros,
            name="conv",
        )(x)
        return MaskedGroupNorm(name="norm")(x, valid)


def exemplar_aggregate(feat: jnp.ndarray, rects: jnp.ndarray) -> jnp.ndarray:
    """Exemplar feature aggregation (reference 2nd-stage backbone.py:116-145).

    feat:  (B, h, w, C) C5 features
    rects: (B, K, 4) normalized xyxy exemplar boxes
    For each exemplar, sample the feature at the box-center pixel using the
    reference's exact int() truncation; mean over exemplars -> per-channel
    vector; return concat([feat, feat * vec]) with 2C channels.
    """
    B, h, w, C = feat.shape
    cx = (rects[..., 0] + rects[..., 2]) * 0.5 * w
    cy = (rects[..., 1] + rects[..., 3]) * 0.5 * h
    xi = jnp.clip(cx.astype(jnp.int32), 0, w - 1)  # int() truncation
    yi = jnp.clip(cy.astype(jnp.int32), 0, h - 1)

    def gather_one(f, ys, xs):
        return f[ys, xs]  # (K, C)

    point_feats = jax.vmap(gather_one)(feat, yi, xi)  # (B, K, C)
    vec = point_feats.mean(axis=1)  # (B, C)
    modulated = feat * vec[:, None, None, :]
    return jnp.concatenate([feat, modulated], axis=-1)


class CountingDetr(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) normalized f32 or raw uint8, or
        #                       (B, H/2, W/2, 12) s2d-packed (production pipe)
        pad_mask: jnp.ndarray,  # (B, H, W) bool, True on padding
        points: Optional[jnp.ndarray] = None,  # (B, P, 2) for defined/sampled prior
        points_valid: Optional[jnp.ndarray] = None,  # (B, P)
        exemplar_boxes: Optional[jnp.ndarray] = None,  # (B, K, 4) xyxy norm (stage 2)
        train: bool = False,  # enables dropout (needs a 'dropout' rng)
    ):
        cfg = self.cfg

        packed = images.shape[-1] == 12  # s2d-packed input pipe
        if images.dtype == jnp.uint8:
            images = normalize_uint8(images)
            # the host float pipe pads AFTER normalizing, so pad pixels are
            # exactly 0.0 there; raw-uint8 pads are 0 -> normalize gives
            # -mean/std, which conv1's 7x7 window would leak into border
            # features and break bucket-size invariance. Re-zero the pads.
            pm = pack_mask_s2d(pad_mask) if packed else pad_mask[..., None]
            images = jnp.where(pm, 0.0, images)
        dt = jnp.dtype(cfg.compute_dtype)
        multi_level = cfg.num_feature_levels > 1
        feats = ResNetBackbone(
            dilation=cfg.dilation,
            # the mask head needs the C4/C3/C2 fpn skips (reference DETRsegm
            # consumes the backbone's intermediate features)
            return_interm=multi_level or cfg.masks,
            return_c2=cfg.masks,
            dtype=None if dt == jnp.float32 else dt,
            name="backbone",
        )(images, pad_mask)
        feat = feats[-1]
        h, w = feat.shape[1], feat.shape[2]
        fmask = downsample_mask(pad_mask, h, w)
        fvalid = ~fmask

        if multi_level:
            # C3/C4/C5 at strides 8/16/16 (DC5); the 3x3-s2 proj on C3 brings
            # every level to the C5 resolution (reference anchor_detr.py:49-65)
            assert not cfg.exemplar_aggregation, (
                "exemplar aggregation is defined on the single C5 level"
            )
            srcs = []
            for lv, f in enumerate(feats):
                proj = InputProj(
                    cfg.hidden_dim,
                    kernel=3 if lv == 0 else 1,
                    stride=2 if lv == 0 else 1,
                    name=f"input_proj_{lv}",
                )
                srcs.append(proj(f, fvalid))
            src = jnp.stack(srcs, axis=1)  # (B, l, h, w, C)
        elif cfg.exemplar_aggregation:
            assert exemplar_boxes is not None, "stage 2 needs exemplar boxes"
            feat = exemplar_aggregate(feat, exemplar_boxes)
            src = InputProj(cfg.hidden_dim, name="aggr_input_proj")(feat, fvalid)
        else:
            src = InputProj(cfg.hidden_dim, name="input_proj")(feat, fvalid)

        # spatial prior -> reference points (reference transformer.py:104-137)
        B = images.shape[0]
        if cfg.spatial_prior == "learned":
            pos = self.param(
                "position",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.0, 1.0),
                (cfg.num_query_position, 2),
            )
            reference_points = jnp.broadcast_to(pos[None], (B, *pos.shape))
            query_valid = None
        elif cfg.spatial_prior == "grid":
            pos = grid_reference_points(cfg.num_query_position)
            reference_points = jnp.broadcast_to(pos[None], (B, *pos.shape))
            query_valid = None
        elif cfg.spatial_prior in ("defined", "sampled"):
            assert points is not None, f"{cfg.spatial_prior} prior needs points"
            reference_points = points
            query_valid = points_valid
        else:
            raise ValueError(f"unknown spatial prior {cfg.spatial_prior}")

        tr = Transformer(cfg, name="transformer")(
            src, fmask, reference_points, query_valid, train=train
        )

        cls, coord = tr["cls"], tr["coord"]
        if cfg.stage == 1:
            out = {
                "pred_logits": cls[-1],
                "pred_points": coord[-1][..., :2],
                "pred_wh": coord[-1][..., 2:],
            }
        else:
            out = {
                "pred_logits": cls[-1],
                "pred_boxes": coord[-1],
                "pred_vars": tr["var"][-1],
                "reference_points": tr["reference_points"],
            }
            if cfg.aux_loss:
                out["aux_outputs"] = [
                    {"pred_logits": cls[i], "pred_boxes": coord[i]}
                    for i in range(cls.shape[0] - 1)
                ]

        if cfg.masks:
            # DETRsegm-equivalent mask branch (reference 1st-stage
            # segmentation.py:19-72): per-query attention maps over the
            # encoder memory + FPN conv head with C4/C3/C2 skips (the
            # reference wires fpns = [features[2], features[1], features[0]]
            # with fpn_dims [1024, 512, 256], segmentation.py:41,63-66).
            from countdetr_tpu.models.segmentation import (
                MaskHeadSmallConv, MHAttentionMap,
            )

            assert not multi_level, "mask head is defined on one level"
            hs = tr["hs"].astype(jnp.float32)  # (B, L, C)
            mem = tr["memory"].astype(jnp.float32)  # (B, h, w, C)
            amaps = MHAttentionMap(
                cfg.hidden_dim, cfg.nheads, name="bbox_attention"
            )(hs, mem, fmask)  # (B, L, n, h, w)
            Bq, Lq = amaps.shape[:2]
            amaps_t = amaps.transpose(0, 1, 3, 4, 2)  # (B, L, h, w, n)
            mem_q = jnp.broadcast_to(
                mem[:, None], (Bq, Lq, h, w, cfg.hidden_dim)
            )
            x_in = jnp.concatenate([mem_q, amaps_t], axis=-1).reshape(
                Bq * Lq, h, w, cfg.hidden_dim + cfg.nheads
            )
            # feats = (C2, C3, C4, C5); skips coarse-to-fine: C4, C3, C2
            fpns = tuple(f.astype(jnp.float32) for f in feats[-2::-1])
            m = MaskHeadSmallConv(cfg.hidden_dim, name="mask_head")(
                x_in, fpns
            )  # (B*L, H/4, W/4)
            out["pred_masks"] = m.reshape(Bq, Lq, *m.shape[1:])
        return out

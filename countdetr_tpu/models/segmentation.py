"""Segmentation head family (reference models/segmentation.py:19-208).

In the reference this is DETR's panoptic head carried along as dead code —
gated behind --masks and used by no script (SURVEY.md 2.1). It is ported for
capability completeness: per-query attention maps over the feature map
(MHAttentionMap), an FPN-style conv mask head (MaskHeadSmallConv), the dice
loss, and mask postprocessing. All NHWC / fixed-shape.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from countdetr_tpu.ops.losses import sigmoid_focal_loss


class MHAttentionMap(nn.Module):
    """Per-query multi-head attention WEIGHTS over the feature map (no value
    projection) — reference segmentation.py's MHAttentionMap: returns
    (B, Q, n, h, w) softmaxed maps."""

    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, queries, features, pad_mask=None):
        # queries (B, Q, C); features (B, h, w, C)
        B, Qn, C = queries.shape
        h, w = features.shape[1], features.shape[2]
        n = self.num_heads
        d = C // n
        q = nn.Dense(self.hidden_dim, name="q_linear")(queries)
        k = nn.Dense(self.hidden_dim, name="k_linear")(features)
        qh = q.reshape(B, Qn, n, d)
        kh = k.reshape(B, h, w, n, d)
        attn = jnp.einsum("bqnd,bhwnd->bqnhw", qh, kh) * (d**-0.5)
        if pad_mask is not None:
            # finite bias, not -inf: fully-padded batch rows must give a
            # uniform softmax instead of NaN (see ops/rcda.mha_attention)
            attn = jnp.where(pad_mask[:, None, None, :, :], -1e30, attn)
        attn = jax.nn.softmax(attn.reshape(B, Qn, n, h * w), axis=-1)
        return attn.reshape(B, Qn, n, h, w)


class MaskHeadSmallConv(nn.Module):
    """FPN conv head upsampling (features + attention maps) to masks,
    structurally identical to the reference MaskHeadSmallConv
    (segmentation.py:74-146) so its weights import 1:1: channel progression
    [dim, ctx/2, ctx/4, ctx/8, ctx/16] where dim = input channels
    (hidden_dim + nheads) and ctx = context_dim; each of the THREE fpn skips
    is adapted by a 1x1 conv and ADDED to the resized trunk BEFORE the next
    3x3 conv. fpn_feats ordered coarse-to-fine: (C4, C3, C2)."""

    context_dim: int

    @nn.compact
    def __call__(self, x, fpn_feats: Sequence[jnp.ndarray]):
        # x: (B*Q, h, w, dim) concat of features + per-query attention maps
        ctx = self.context_dim
        dim = x.shape[-1]
        inter = [dim, ctx // 2, ctx // 4, ctx // 8, ctx // 16]

        def conv_gn_relu(y, feats, i):
            y = nn.Conv(feats, (3, 3), padding="SAME", name=f"lay{i}")(y)
            # 8 groups like the reference; adjusted only where the reference
            # is undefined (torch GroupNorm(8, c) raises unless 8 | c —
            # happens for context_dim < 128, i.e. test-scale models only)
            g = max(d for d in range(1, 9) if feats % d == 0)
            y = nn.GroupNorm(num_groups=g, name=f"gn{i}")(y)
            return nn.relu(y)

        y = conv_gn_relu(x, inter[0], 1)
        y = conv_gn_relu(y, inter[1], 2)
        for i, f in enumerate(fpn_feats):
            skip = nn.Conv(inter[i + 1], (1, 1), name=f"adapter{i + 1}")(f)
            # fpn feature comes per-image; tile to the per-query batch
            # (reference 'expand', segmentation.py:108-110)
            reps = y.shape[0] // skip.shape[0]
            skip = jnp.repeat(skip, reps, axis=0)
            # resize the trunk to the skip's spatial size (with DC5 the
            # first hop C5->C4 is stride 16->16, i.e. a no-op resize)
            B = y.shape[0]
            y = jax.image.resize(
                y, (B, skip.shape[1], skip.shape[2], y.shape[-1]), "nearest"
            )
            y = skip + y
            y = conv_gn_relu(y, inter[i + 2], i + 3)
        return nn.Conv(1, (3, 3), padding="SAME", name="out_lay")(y)[..., 0]


def dice_loss(pred_logits, targets, num_boxes):
    """(reference segmentation.py dice_loss): 1 - 2|X∩Y|/(|X|+|Y|), summed
    over masks / num_boxes. pred_logits/targets: (N, H*W)."""
    probs = jax.nn.sigmoid(pred_logits)
    num = 2.0 * (probs * targets).sum(axis=1)
    den = probs.sum(axis=1) + targets.sum(axis=1)
    loss = 1.0 - (num + 1.0) / (den + 1.0)
    return loss.sum() / num_boxes


def mask_losses(pred_masks, tgt_masks, valid, num_boxes):
    """Focal + dice on matched masks (reference loss_masks,
    anchor_detr.py:236-262). pred_masks/tgt_masks: (N, H, W); valid: (N,)."""
    N = pred_masks.shape[0]
    p = pred_masks.reshape(N, -1)
    t = tgt_masks.reshape(N, -1).astype(p.dtype)
    v = valid.astype(p.dtype)[:, None]
    focal = (sigmoid_focal_loss(p, t) * v).mean(axis=1).sum() / num_boxes
    dice = dice_loss(p * v, t * v, num_boxes)
    return {"loss_mask": focal, "loss_dice": dice}


def postprocess_masks(mask_logits, target_hw, threshold=0.5):
    """Resize per-query mask logits to the target size and binarize
    (reference PostProcessSegm)."""
    N, h, w = mask_logits.shape
    H, W = target_hw
    resized = jax.image.resize(mask_logits, (N, H, W), "bilinear")
    return jax.nn.sigmoid(resized) > threshold

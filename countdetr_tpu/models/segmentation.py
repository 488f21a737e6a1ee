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
    """FPN-ish conv head upsampling (features + attention maps) to masks
    (reference MaskHeadSmallConv). fpn_feats: higher-res backbone features
    ordered fine-to-coarse relative to the input, e.g. (C4, C3)."""

    dim: int

    @nn.compact
    def __call__(self, x, fpn_feats: Sequence[jnp.ndarray]):
        # x: (B*Q, h, w, C0) concat of per-query attention maps + features
        def conv_gn_relu(y, feats, name):
            y = nn.Conv(feats, (3, 3), padding="SAME", name=f"{name}_conv")(y)
            y = nn.GroupNorm(num_groups=8, name=f"{name}_gn")(y)
            return nn.relu(y)

        dims = [self.dim, self.dim // 2, self.dim // 4, self.dim // 8]
        y = conv_gn_relu(x, dims[0], "lay1")
        y = conv_gn_relu(y, dims[1], "lay2")
        for i, f in enumerate(fpn_feats):
            # upsample 2x and add an adapted skip
            B, h, w, _ = y.shape
            y = jax.image.resize(y, (B, h * 2, w * 2, y.shape[-1]), "nearest")
            skip = nn.Conv(y.shape[-1], (1, 1), name=f"adapter{i}")(f)
            # fpn feature comes per-image; tile to per-query batch
            reps = y.shape[0] // skip.shape[0]
            skip = jnp.repeat(skip, reps, axis=0)
            y = y + skip[:, : y.shape[1], : y.shape[2]]
            y = conv_gn_relu(y, dims[min(i + 2, 3)], f"lay{i + 3}")
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

"""Sinusoidal positional embeddings and anchor/reference-point priors.

Numerically matches the reference formulas (transformer.py:472-501):
  dim_t[i] = temperature ** (2 * (i // 2) / num_pos_feats)
  emb      = interleave(sin(x / dim_t[0::2]), cos(x / dim_t[1::2]))
with positions pre-scaled by 2*pi, and the mask->position cumsum trick
(mask2pos) that makes embeddings independent of right/bottom padding.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def pos2posemb1d(pos: jnp.ndarray, num_pos_feats: int = 256, temperature: float = 10000.0) -> jnp.ndarray:
    """pos (...,) -> (..., num_pos_feats). Reference transformer.py:485-492."""
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = pos[..., None] / dim_t
    # interleave sin of even slots with cos of odd slots
    emb = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    return emb.reshape(*emb.shape[:-2], num_pos_feats)


def pos2posemb2d(pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0) -> jnp.ndarray:
    """pos (..., 2) [x, y] -> (..., 2*num_pos_feats) as concat(emb_y, emb_x).

    NOTE the output order is (y, x) — reference transformer.py:481.
    """
    emb_x = pos2posemb1d(pos[..., 0], num_pos_feats, temperature)
    emb_y = pos2posemb1d(pos[..., 1], num_pos_feats, temperature)
    return jnp.concatenate([emb_y, emb_x], axis=-1)


def mask2pos(mask: jnp.ndarray):
    """Normalized axis coordinates of valid pixels from a padding mask.

    mask: (B, H, W) bool, True on PADDED pixels (reference convention).
    Returns (pos_col, pos_row): (B, H) y coords and (B, W) x coords in (0, 1],
    computed as (cumsum(valid) - 0.5) / num_valid along each axis
    (reference transformer.py:495-501). Padding changes nothing for the valid
    region, so bucketed padding does not perturb the embeddings.
    """
    not_mask = ~mask
    y_embed = jnp.cumsum(not_mask[:, :, 0].astype(jnp.float32), axis=1)
    x_embed = jnp.cumsum(not_mask[:, 0, :].astype(jnp.float32), axis=1)
    y_embed = (y_embed - 0.5) / y_embed[:, -1:]
    x_embed = (x_embed - 0.5) / x_embed[:, -1:]
    return y_embed, x_embed


def grid_reference_points(num_position: int) -> jnp.ndarray:
    """Uniform sqrt(n) x sqrt(n) grid of anchor points in [0,1]^2.

    Matches reference transformer.py:106-113 including the meshgrid('ij')
    ordering: output[k] = ((i + .5)/n, (j + .5)/n) with i the fast... —
    torch.meshgrid uses 'ij' indexing, xy[0] varies x along rows; flattening
    gives x-major order: [(x0,y0), (x0,y1), ...].
    """
    n = round(math.sqrt(num_position))
    x = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    y = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    xv, yv = jnp.meshgrid(x, y, indexing="ij")
    return jnp.stack([xv.reshape(-1), yv.reshape(-1)], axis=-1)  # (n*n, 2)

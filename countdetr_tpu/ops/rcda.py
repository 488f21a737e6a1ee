"""Row-Column Decoupled Attention (RCDA) — the AnchorDETR attention.

Semantics (reference models/row_column_decoupled_attention.py:23-272):
  * one packed input projection of shape (5E, E): q_row, q_col, k_row, k_col, v
  * projected keys are AXIS-AVERAGED: k_row = proj(key_row).mean(over H) ->
    (B, W, E); k_col = proj(key_col).mean(over W) -> (B, H, E)
  * two independent 1-D attentions per head:
      A_row = softmax(q_row . k_row^T / sqrt(d))   (B, n, L, W)
      A_col = softmax(q_col . k_col^T / sqrt(d))   (B, n, L, H)
  * output[q] = sum_h sum_w A_col[q,h] * A_row[q,w] * v[h,w]
  * final output projection (E, E)

This drops attention memory from O(L*HW) toward O(L*(H+W)) — the reference's
only sequence-scaling device (SURVEY.md section 2.8).

This module is the pure-jnp reference implementation (the einsum forms the
reference documents at row_column_decoupled_attention.py:228-230,243-245 are
the oracle); ops/pallas/rcda_kernel.py provides the fused TPU kernel and
falls back to this.

Layout note: everything is NHWC / (B, L, E) — TPU-native; no torch-style
(L, B, E) transposes survive here.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RCDAParams(NamedTuple):
    """Packed exactly like the reference for checkpoint portability:
    in_proj_weight rows are [q_row; q_col; k_row; k_col; v] (5E, E)."""

    in_proj_weight: jnp.ndarray  # (5E, E)
    in_proj_bias: jnp.ndarray  # (5E,)
    out_proj_weight: jnp.ndarray  # (E, E)
    out_proj_bias: jnp.ndarray  # (E,)


def _rcda_core_einsum(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads):
    """Attention core on pre-projected tensors (the part the Pallas kernel
    fuses). q_row/q_col: (B, L, E) pre-scaled; k_row: (B, W, E);
    k_col: (B, H, E); v: (B, H, W, E); biases additive (B, W)/(B, H)."""
    B, L, E = q_row.shape
    H, W = v.shape[1], v.shape[2]
    d = E // num_heads

    def heads(x):
        return x.reshape(*x.shape[:-1], num_heads, d)

    qr, qc = heads(q_row), heads(q_col)
    kr, kc = heads(k_row), heads(k_col)
    vh = heads(v)

    attn_row = jnp.einsum(
        "blnd,bwnd->bnlw", qr, kr, preferred_element_type=jnp.float32
    ) + bias_row[:, None, None, :]
    attn_col = jnp.einsum(
        "blnd,bhnd->bnlh", qc, kc, preferred_element_type=jnp.float32
    ) + bias_col[:, None, None, :]
    attn_row = jax.nn.softmax(attn_row, axis=-1).astype(v.dtype)
    attn_col = jax.nn.softmax(attn_col, axis=-1).astype(v.dtype)

    hid = jnp.einsum("bnlw,bhwnd->bnlhd", attn_row, vh)
    out = jnp.einsum("bnlh,bnlhd->blnd", attn_col, hid)
    return out.reshape(B, L, E)


def _rcda_core_einsum_grid(
    q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads
):
    """Grid-query variant of _rcda_core_einsum: queries live on the (H, W)
    feature grid — the ENCODER's self-attention case, where L == H*W.

    Why a separate formulation: merging (H, W) -> L=H*W on a tiled TPU
    tensor is not free — H=W=37 is tile-unaligned, so XLA materializes a
    relayout copy per encoder layer (6 x 1.02 ms/forward at the 592px/B=32
    geometry, round-5 profile, fusion.4539...). Keeping the query axes
    (x, y) unmerged through every einsum removes the merge point entirely;
    the math is identical (tests/test_rcda.py pins it against the flat
    core).

    q_row/q_col: (B, H, W, E) pre-scaled; k/v/biases as in the flat core.
    Returns (B, H, W, E)."""
    B, H, W, E = q_row.shape
    d = E // num_heads

    def heads(x):
        return x.reshape(*x.shape[:-1], num_heads, d)

    qr, qc = heads(q_row), heads(q_col)
    kr, kc = heads(k_row), heads(k_col)
    vh = heads(v)

    attn_row = jnp.einsum(
        "bxynd,bwnd->bnxyw", qr, kr, preferred_element_type=jnp.float32
    ) + bias_row[:, None, None, None, :]
    attn_col = jnp.einsum(
        "bxynd,bhnd->bnxyh", qc, kc, preferred_element_type=jnp.float32
    ) + bias_col[:, None, None, None, :]
    attn_row = jax.nn.softmax(attn_row, axis=-1).astype(v.dtype)
    attn_col = jax.nn.softmax(attn_col, axis=-1).astype(v.dtype)

    if GRID_COMBINE == "rank1":
        # Single full-grid GEMM: out[q] = (A_col[q] (x) A_row[q]) . V with
        # contraction H*W = 1369. MEASURED WORSE on v5e at 592px/B=32
        # (254 vs 395 img/s end-to-end): XLA materializes the ~1 GB
        # (B, n, x, y, H, W) weight tensor instead of fusing the
        # outer-product producer into the dot. Kept as a knob for
        # geometries with small grids.
        w2 = attn_col[..., :, None] * attn_row[..., None, :]
        out = jnp.einsum("bnxyhw,bhwnd->bxynd", w2, vh)
        return out.reshape(B, H, W, E)

    # Two-stage combine. The second einsum is a batched MATVEC (b,n,x,y
    # all batch dims, contraction h) — XLA:TPU lowers it to a kLoop VPU
    # fusion, and WITHOUT the barrier it also fuses the col-softmax
    # normalize into that loop, recomputing exp/div over the 50M-element
    # logits once PER d-channel (~1.6B transcendentals/layer: the round-5
    # profile's 6 x 3.2 ms/forward hotspot, fusion.4850). The barrier
    # forces the bf16 probs to materialize once (22 MB) so the loop only
    # multiplies.
    if GRID_COMBINE == "two_stage":
        attn_col = jax.lax.optimization_barrier(attn_col)
    hid = jnp.einsum("bnxyw,bhwnd->bnxyhd", attn_row, vh)
    out = jnp.einsum("bnxyh,bnxyhd->bxynd", attn_col, hid)
    return out.reshape(B, H, W, E)


# Encoder grid-query combine formulation (startup knob, read once):
#   two_stage (default) - short-axis two-einsum form with a barrier that
#                         stops XLA re-fusing the softmax normalize into
#                         the combine loop (see _rcda_core_einsum_grid)
#   two_stage_fused     - no barrier (the round-5 profile's 3.2 ms/layer
#                         exp-recompute kLoop; for A/B only)
#   rank1               - one full-grid GEMM (measured worse: XLA
#                         materializes the ~1 GB outer-product weights)
#   flat                - flatten grid queries up front and use the flat
#                         core (the pre-round-5 formulation; for A/B)
GRID_COMBINE = os.environ.get("COUNTDETR_RCDA_GRID", "two_stage")

# v3 (default): the two-stage short-axis form — the faster of the two
# kernels at the measured geometry (333 vs 326 img/s, PERFORMANCE.md);
# rank1: single full-width H*W contraction, for much larger H, W.
# Read ONCE at import: the primal below runs at trace time, so the choice is
# frozen into cached compilations anyway — a startup-only knob by design.
PALLAS_VARIANT = os.environ.get("COUNTDETR_PALLAS_VARIANT", "v3")


def _pallas_rcda_available() -> bool:
    """The fused RCDA kernel applies only on a single-device TPU process:
    no interpret path is wired for CPU here (tests exercise the kernel via
    tests/test_pallas_rcda.py explicitly), and pallas_call has no SPMD
    partitioning rule, so multi-device programs keep the einsum cores
    (mirrors ops/matching.py::_pallas_auction_mode)."""
    import jax

    return (
        jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and jax.process_count() == 1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _rcda_core_pallas(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads):
    from countdetr_tpu.ops.pallas.rcda_kernel import fused_rcda, fused_rcda_rank1

    fn = fused_rcda_rank1 if PALLAS_VARIANT == "rank1" else fused_rcda
    return fn(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads)


def _rcda_pallas_fwd(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads):
    out = _rcda_core_pallas(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads)
    return out, (q_row, q_col, k_row, k_col, v, bias_row, bias_col)


def _rcda_pallas_bwd(num_heads, res, g):
    # rematerialized backward through the einsum formulation — same math,
    # recomputes the softmaxes instead of saving the (B,n,L,H,d) intermediate
    _, vjp = jax.vjp(
        lambda *args: _rcda_core_einsum(*args, num_heads), *res
    )
    return vjp(g)


_rcda_core_pallas.defvjp(_rcda_pallas_fwd, _rcda_pallas_bwd)


def rcda_attention(
    query_row: jnp.ndarray,  # (B, L, E), or (B, H, W, E) grid queries
    query_col: jnp.ndarray,  # same shape as query_row
    key_row: jnp.ndarray,  # (B, H, W, E)
    key_col: jnp.ndarray,  # (B, H, W, E)
    value: jnp.ndarray,  # (B, H, W, E)
    params: RCDAParams,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, H, W) True = pad
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Returns (B, L, E) for flat queries, (B, H, W, E) for grid queries.

    Grid queries (the encoder, where queries ARE the feature-map pixels)
    stay 4-D through the whole computation — see _rcda_core_einsum_grid for
    why merging H*W is a per-layer relayout copy on TPU. The Pallas kernel
    keeps the flat interface, so use_pallas flattens grid queries at the
    kernel boundary (and the kernel's VMEM tiling makes the layout moot)."""
    grid_q = query_row.ndim == 4
    if grid_q and GRID_COMBINE == "flat":
        # measurement knob: flatten grid queries up front and run the flat
        # einsum core — the pre-round-5 formulation, kept A/B-able because
        # the grid core's backward schedule differs (train-vs-eval trades)
        H_, W_ = query_row.shape[1], query_row.shape[2]
        E_ = query_row.shape[-1]
        query_row = query_row.reshape(-1, H_ * W_, E_)
        query_col = query_col.reshape(-1, H_ * W_, E_)
        grid_q = False
        flat_grid = (H_, W_)
    else:
        flat_grid = None
    if use_pallas and not _pallas_rcda_available():
        use_pallas = False
    B, E = query_row.shape[0], query_row.shape[-1]
    H, W = key_row.shape[1], key_row.shape[2]
    d = E // num_heads
    scaling = d**-0.5

    w = params.in_proj_weight
    b = params.in_proj_bias
    wq_r, wq_c, wk_r, wk_c, wv = (w[i * E : (i + 1) * E] for i in range(5))
    bq_r, bq_c, bk_r, bk_c, bv = (b[i * E : (i + 1) * E] for i in range(5))

    # torch F.linear(x, W, b) = x @ W.T + b
    q_row = query_row @ wq_r.T + bq_r  # (B, L, E)
    q_col = query_col @ wq_c.T + bq_c
    k_row_full = key_row @ wk_r.T + bk_r  # (B, H, W, E)
    k_col_full = key_col @ wk_c.T + bk_c
    if key_padding_mask is None:
        k_row = k_row_full.mean(axis=1)  # (B, W, E)  mean over H
        k_col = k_col_full.mean(axis=2)  # (B, H, E)  mean over W
    else:
        # masked axis-means: the reference averages over the FULL axis
        # (row_column_decoupled_attention.py:163-164) because it never pads
        # (batch=1); with bucketed padding the mean must only see valid
        # rows/cols or padding would leak into every key.
        valid_h = (~key_padding_mask[:, :, 0]).astype(k_row_full.dtype)  # (B, H)
        valid_w = (~key_padding_mask[:, 0, :]).astype(k_row_full.dtype)  # (B, W)
        nh = jnp.maximum(valid_h.sum(1), 1.0)[:, None, None]
        nw = jnp.maximum(valid_w.sum(1), 1.0)[:, None, None]
        k_row = (k_row_full * valid_h[:, :, None, None]).sum(axis=1) / nh
        k_col = (k_col_full * valid_w[:, None, :, None]).sum(axis=2) / nw
    v = value @ wv.T + bv  # (B, H, W, E)

    q_row = q_row * scaling
    q_col = q_col * scaling

    if key_padding_mask is not None:
        bias_row = jnp.where(key_padding_mask[:, 0, :], -1e30, 0.0).astype(q_row.dtype)
        bias_col = jnp.where(key_padding_mask[:, :, 0], -1e30, 0.0).astype(q_row.dtype)
    else:
        bias_row = jnp.zeros((B, W), dtype=q_row.dtype)
        bias_col = jnp.zeros((B, H), dtype=q_row.dtype)

    if grid_q and use_pallas:
        q_row = q_row.reshape(B, H * W, E)
        q_col = q_col.reshape(B, H * W, E)
    if use_pallas:
        core = _rcda_core_pallas
    elif grid_q:
        core = _rcda_core_einsum_grid
    else:
        core = _rcda_core_einsum
    out = core(q_row, q_col, k_row, k_col, v, bias_row, bias_col, num_heads)
    if grid_q and use_pallas:
        out = out.reshape(B, H, W, E)
    if flat_grid is not None:
        out = out.reshape(B, flat_grid[0], flat_grid[1], E)
    return out @ params.out_proj_weight.T + params.out_proj_bias


def mha_attention(
    query: jnp.ndarray,  # (B, L, E)
    key: jnp.ndarray,  # (B, S, E)
    value: jnp.ndarray,  # (B, S, E)
    in_proj_weight: jnp.ndarray,  # (3E, E) packed q,k,v like torch nn.MHA
    in_proj_bias: jnp.ndarray,  # (3E,)
    out_proj_weight: jnp.ndarray,  # (E, E)
    out_proj_bias: jnp.ndarray,  # (E,)
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
) -> jnp.ndarray:
    """Standard multi-head attention with torch-nn.MultiheadAttention packed
    weights — used for decoder query self-attention (reference
    transformer.py:336,368) and as the non-RCDA attention_type option."""
    B, L, E = query.shape
    d = E // num_heads

    wq, wk, wv = (in_proj_weight[i * E : (i + 1) * E] for i in range(3))
    bq, bk, bv = (in_proj_bias[i * E : (i + 1) * E] for i in range(3))

    q = (query @ wq.T + bq) * (d**-0.5)  # (B, L, E)
    k = key @ wk.T + bk  # (B, S, E)
    v = value @ wv.T + bv
    S = k.shape[1]

    # Finite large-negative bias, NOT -inf: rows whose keys are ALL
    # padding (e.g. batch-padding rows where points_valid is entirely
    # False) must produce a uniform softmax instead of NaN — a single
    # remainder batch would otherwise poison the params permanently
    # (0 * NaN = NaN survives the loss masking).
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, -1e30, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((B, S), dtype=jnp.float32)

    from countdetr_tpu.ops.pallas import mha_kernel

    # The fused kernel removes the HBM-resident f32 (B, n, L, S) probs
    # array (11% of eval device time at the production geometry — see
    # ops/pallas/mha_kernel.py). XLA einsum elsewhere: CPU tests, or
    # geometries whose full (S, E) K/V plus (L<=1024, S) f32 logits would
    # not fit a VMEM program.
    if (
        mha_kernel.on_tpu()
        and os.environ.get("COUNTDETR_FUSED_MHA", "1") == "1"
        and (2 * S * E * q.dtype.itemsize + min(L, 1024) * S * 4) <= 8 * 2**20
    ):
        out = mha_kernel.mha_core_fused(q, k, v, bias, num_heads)
    else:
        out = mha_kernel.mha_core_einsum(q, k, v, bias, num_heads)
    return out @ out_proj_weight.T + out_proj_bias

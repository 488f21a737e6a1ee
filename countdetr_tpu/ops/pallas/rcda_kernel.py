"""Fused RCDA attention kernel for TPU (Pallas/Mosaic).

What it fuses (reference row_column_decoupled_attention.py:184-245): the two
1-D attention score matmuls, both softmaxes, and the two-stage combine
  out[l] = sum_h a_col[l,h] * (sum_w a_row[l,w] * v[h,w,:])
into one VMEM-resident pass per (batch, head, query-block) program.

Why: the jnp/einsum fallback (ops/rcda.py) materializes the (B, n, L, H, d)
intermediate in HBM — ~52 MB per image at the 600px eval geometry
(L=1369, H=W=37, n=8, d=32) per encoder layer. Here that intermediate only
ever exists as a (BLOCK_L, H*d) VMEM tile.

Mosaic constraints shape the design (first attempt used a 3-D-rhs
dot_general, which lowers to an unsupported in-kernel reshape):
  * every dot is strictly 2-D;
  * no in-kernel reshapes that merge/split unaligned trailing dims —
    the head split and the (W, H*d) value flattening happen OUTSIDE the
    kernel in XLA, where layout changes are free to fuse;
  * the head-weighted combine sum_h a_col[l,h] * hid[l, h*d:(h+1)*d] is a
    lane-repeat (pltpu.repeat) + elementwise product + one dot with a
    constant 0/1 fold matrix S[h*d+j, j'] = [j == j'], instead of a
    strided segment reduction.

Inputs (pre-projected, exactly what the fallback computes at this point):
  q_row, q_col : (B, L, E)   pre-scaled by d**-0.5
  k_row        : (B, W, E)   axis-meaned key rows
  k_col        : (B, H, E)
  v            : (B, H, W, E)
  bias_row     : (B, W)      additive mask (0 valid / -1e30 padded)
  bias_col     : (B, H)
Returns (B, L, E); matches the einsum oracle (tests/test_pallas_rcda.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rcda_kernel(
    q_row_ref,  # (1, 1, BL, d)
    q_col_ref,  # (1, 1, BL, d)
    k_row_ref,  # (1, 1, W, d)
    k_col_ref,  # (1, 1, H, d)
    v_ref,      # (1, 1, W, H*d)  value, head-sliced + (h, d)-flattened
    bias_row_ref,  # (1, 1, W)
    bias_col_ref,  # (1, 1, H)
    fold_ref,   # (H*d, d) constant 0/1 fold matrix
    out_ref,    # (1, 1, BL, d)
    *,
    head_dim: int,
):
    d = head_dim
    qr = q_row_ref[0, 0]  # (BL, d)
    qc = q_col_ref[0, 0]
    kr = k_row_ref[0, 0]  # (W, d)
    kc = k_col_ref[0, 0]  # (H, d)
    vf = v_ref[0, 0]  # (W, H*d)
    bias_row = bias_row_ref[0, 0]  # (W,)
    bias_col = bias_col_ref[0, 0]  # (H,)

    s_row = (
        jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bias_row[None, :]
    )  # (BL, W)
    s_col = (
        jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bias_col[None, :]
    )  # (BL, H)
    a_row = jax.nn.softmax(s_row, axis=-1).astype(vf.dtype)
    a_col = jax.nn.softmax(s_col, axis=-1)  # fp32

    # hid[l, j*H + h] = sum_w a_row[l, w] v[h, w, j]
    hid = jax.lax.dot_general(
        a_row, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BL, H*d)

    # out[l, j] = sum_h a_col[l, h] * hid[l, j*H + h]
    a_col_exp = pltpu.repeat(a_col, d, axis=1)  # (BL, H*d)
    prod = (hid * a_col_exp).astype(vf.dtype)
    out = jax.lax.dot_general(
        prod, fold_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BL, d)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _rcda_rank1_kernel(
    q_row_ref,  # (1, 1, BL, d)
    q_col_ref,  # (1, 1, BL, d)
    k_row_ref,  # (1, 1, W, d)
    k_col_ref,  # (1, 1, H, d)
    v_ref,      # (1, 1, H*W, d)  value flattened to (h*W + w, d)
    bias_row_ref,  # (1, 1, W)
    bias_col_ref,  # (1, 1, H)
    expand_ref,  # (H, H*W) constant: expand[h, h*W + w] = 1
    out_ref,    # (1, 1, BL, d)
    *,
    height: int,
):
    """Rank-1 full-attention formulation: RCDA's output is exactly a 2-D
    attention whose weights factorize, out[l] = sum_{h,w} a_col[l,h] *
    a_row[l,w] * v[h,w]. Materializing P[l, h*W+w] in VMEM turns the combine
    into ONE dot contracting over H*W (1369 at the 600px geometry — a full
    128-wide MXU pass), instead of the two-stage form whose dots contract
    over W=37 / H=37 (<=29% utilization) and whose (B,n,L,H,d) intermediate
    round-trips HBM in the XLA einsum path."""
    qr = q_row_ref[0, 0]
    qc = q_col_ref[0, 0]
    kr = k_row_ref[0, 0]
    kc = k_col_ref[0, 0]
    vf = v_ref[0, 0]  # (H*W, d)
    bias_row = bias_row_ref[0, 0]
    bias_col = bias_col_ref[0, 0]

    s_row = (
        jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bias_row[None, :]
    )  # (BL, W)
    s_col = (
        jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bias_col[None, :]
    )  # (BL, H)
    a_row = jax.nn.softmax(s_row, axis=-1)  # fp32
    a_col = jax.nn.softmax(s_col, axis=-1)  # fp32

    # P[l, h*W + w] = a_col[l, h] * a_row[l, w]
    a_col_exp = jax.lax.dot_general(
        a_col, expand_ref[:].astype(a_col.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (BL, H*W): element-repeat of a_col W times
    a_row_tile = pltpu.repeat(a_row, height, axis=1)  # (BL, H*W): tile H times
    p = (a_col_exp * a_row_tile).astype(vf.dtype)
    out = jax.lax.dot_general(
        p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BL, d) — contraction over H*W
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_l"))
def fused_rcda_rank1(
    q_row: jnp.ndarray,  # (B, L, E)
    q_col: jnp.ndarray,
    k_row: jnp.ndarray,  # (B, W, E)
    k_col: jnp.ndarray,  # (B, H, E)
    v: jnp.ndarray,  # (B, H, W, E)
    bias_row: jnp.ndarray,  # (B, W)
    bias_col: jnp.ndarray,  # (B, H)
    num_heads: int,
    block_l: int = 256,
) -> jnp.ndarray:
    B, L, E = q_row.shape
    H, W = v.shape[1], v.shape[2]
    n = num_heads
    d = E // n
    bl = min(block_l, L)

    def split_heads(x):  # (B, S, E) -> (B, n, S, d)
        return x.reshape(B, -1, n, d).transpose(0, 2, 1, 3)

    qrh = split_heads(q_row)
    qch = split_heads(q_col)
    krh = split_heads(k_row)
    kch = split_heads(k_col)
    # (B, H, W, E) -> (B, n, H*W, d), flat index h*W + w
    vflat = v.reshape(B, H * W, n, d).transpose(0, 2, 1, 3)

    expand = jnp.repeat(jnp.eye(H, dtype=v.dtype), W, axis=1)  # (H, H*W)

    grid = (B, n, pl.cdiv(L, bl))
    out = pl.pallas_call(
        functools.partial(_rcda_rank1_kernel, height=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H * W, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H * W), lambda b, h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, L, d), q_row.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * L * (d * (H + W) + H * (H * W) + (H * W) * d),
            bytes_accessed=4 * B * (2 * L * E + (H + W) * E + H * W * E + L * E),
            transcendentals=B * n * L * (H + W),
        ),
    )(
        qrh, qch, krh, kch, vflat,
        bias_row[:, None, :], bias_col[:, None, :], expand,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, L, E)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_l"))
def fused_rcda(
    q_row: jnp.ndarray,  # (B, L, E)
    q_col: jnp.ndarray,
    k_row: jnp.ndarray,  # (B, W, E)
    k_col: jnp.ndarray,  # (B, H, E)
    v: jnp.ndarray,  # (B, H, W, E)
    bias_row: jnp.ndarray,  # (B, W)
    bias_col: jnp.ndarray,  # (B, H)
    num_heads: int,
    block_l: int = 256,
) -> jnp.ndarray:
    B, L, E = q_row.shape
    H, W = v.shape[1], v.shape[2]
    n = num_heads
    d = E // n
    bl = min(block_l, L)

    # head split + value flatten in XLA (free layout changes)
    def split_heads(x):  # (B, S, E) -> (B, n, S, d)
        return x.reshape(B, -1, n, d).transpose(0, 2, 1, 3)

    qrh = split_heads(q_row)
    qch = split_heads(q_col)
    krh = split_heads(k_row)
    kch = split_heads(k_col)
    # v: (B, H, W, E) -> (B, n, W, d*H) with flat index j*H + h. The (d, H)
    # order (not (H, d)) matches pltpu.repeat's TILE semantics: repeating
    # a_col (BL, H) d times along lanes yields index j*H + h -> a_col[l, h].
    vt = v.reshape(B, H, W, n, d).transpose(0, 3, 2, 4, 1).reshape(B, n, W, d * H)

    # constant fold matrix S[j*H + h, j'] = 1 if j == j'
    fold = jnp.repeat(jnp.eye(d, dtype=v.dtype), H, axis=0)  # (d*H, d)

    grid = (B, n, pl.cdiv(L, bl))

    out = pl.pallas_call(
        functools.partial(_rcda_kernel, head_dim=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, H * d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H * d, d), lambda b, h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bl, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, L, d), q_row.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * E * (H + W) + 4 * B * L * H * W * E,
            bytes_accessed=4 * B * (2 * L * E + (H + W) * E + H * W * E + L * E),
            transcendentals=B * n * L * (H + W),
        ),
    )(
        qrh, qch, krh, kch, vt,
        bias_row[:, None, :], bias_col[:, None, :], fold,
    )
    # (B, n, L, d) -> (B, L, E)
    return out.transpose(0, 2, 1, 3).reshape(B, L, E)

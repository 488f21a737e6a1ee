"""Fused RCDA attention kernel for TPU (Pallas/Mosaic).

What it fuses (reference row_column_decoupled_attention.py:184-245): the two
1-D attention score matmuls, both softmaxes, and the two-stage combine
  out[l] = sum_h a_col[l,h] * (sum_w a_row[l,w] * v[h,w,:])
into one VMEM-resident pass, blocked over the query axis.

Why: the jnp/einsum fallback (ops/rcda.py) materializes the (B, n, L, H, d)
intermediate in HBM — ~52 MB per image at the 600px eval geometry
(L=1369, H=W=37, n=8, d=32) per encoder layer. Here each (batch, L-block)
program holds only (BLOCK_L, H, d) per head in VMEM (~1.2 MB), so the op is
compute-bound on the MXU instead of HBM-bound.

The in/out projections stay in XLA (plain matmuls it already schedules
optimally); this kernel takes pre-projected, pre-scaled q and pre-axis-mean
k, exactly the tensors the fallback computes at the same point.

Inputs
  q_row, q_col : (B, L, E)   pre-scaled by d**-0.5
  k_row        : (B, W, E)   axis-meaned key rows
  k_col        : (B, H, E)
  v            : (B, H, W, E)
  bias_row     : (B, W)      additive mask (0 valid / -1e30 padded)
  bias_col     : (B, H)
Returns (B, L, E), bitwise-equivalent (up to fp reassociation) to the
fallback — tested against it in tests/test_pallas_rcda.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rcda_kernel(
    q_row_ref, q_col_ref, k_row_ref, k_col_ref, v_ref, bias_row_ref, bias_col_ref,
    out_ref, *, num_heads: int,
):
    E = q_row_ref.shape[-1]
    d = E // num_heads
    H = k_col_ref.shape[1]
    W = k_row_ref.shape[1]

    bias_row = bias_row_ref[0, :]  # (W,)
    bias_col = bias_col_ref[0, :]  # (H,)

    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qr = q_row_ref[0, :, sl]  # (BL, d)
        qc = q_col_ref[0, :, sl]
        kr = k_row_ref[0, :, sl]  # (W, d)
        kc = k_col_ref[0, :, sl]  # (H, d)
        vh = v_ref[0, :, :, sl]  # (H, W, d)

        s_row = (
            jax.lax.dot_general(
                qr, kr,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_row[None, :]
        )  # (BL, W)
        s_col = (
            jax.lax.dot_general(
                qc, kc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_col[None, :]
        )  # (BL, H)
        a_row = jax.nn.softmax(s_row, axis=-1)
        a_col = jax.nn.softmax(s_col, axis=-1)

        # hid[l, h', :] = sum_w a_row[l, w] v[h', w, :]
        hid = jax.lax.dot_general(
            a_row, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BL, H, d)
        out_h = jnp.sum(a_col[:, :, None] * hid, axis=1)  # (BL, d)
        out_ref[0, :, sl] = out_h.astype(out_ref.dtype)


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
    bl = min(block_l, L)
    grid = (B, pl.cdiv(L, bl))

    return pl.pallas_call(
        functools.partial(_rcda_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bl, E), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl, E), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, E), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, E), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, H, W, E), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, W), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bl, E), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, E), q_row.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * E * (H + W) + 2 * B * L * H * W * E,
            bytes_accessed=4 * B * (2 * L * E + (H + W) * E + H * W * E + L * E),
            transcendentals=B * L * (H + W),
        ),
    )(q_row, q_col, k_row, k_col, v, bias_row, bias_col)

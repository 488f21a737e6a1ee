"""Fused multi-head attention Pallas kernel for the decoder's query
self-attention (reference transformer.py:336,368 — torch nn.MultiheadAttention
on 576 queries at the production geometry).

Why: the round-4 op-level profile (scripts/profile_eval.py) showed the XLA
einsum path materializing the f32 (B, n, L, S) logits/probs array in HBM —
f32[32,8,576,576] = 340 MB of write+read traffic per decoder layer at 72-83%
HBM utilization, 11.2% of total eval device time, with near-zero MXU work.

Layout lesson (measured, round 4): a first version that blocked over
(B, n, L, d) arrays was a WASH (530.9 vs 532.2 img/s) — every array with a
trailing dim of d=32 is tile-padded 32->128 in HBM (4x traffic), the three
(B,L,n,d)->(B,n,L,d) transposes cost full HBM passes, and each of the
B*n*ceil(L/qb) programs re-read its (S, d) K/V block. This version keeps
q/k/v flat (B, L, E) — E=256 is exactly two 128-lane tiles, no padding, no
transposes — runs ONE program per batch element, and loops the heads
in-kernel over static lane slices. HBM per layer drops to reads+writes of
the four (B, L, E) arrays (~38 MB vs ~700 MB).

Semantics match ops/rcda.mha_attention's einsum core exactly:
  * q is pre-scaled by d^-0.5 by the caller,
  * additive key bias (0 or -1e30) instead of a boolean where — identical in
    fp32 (|logit| << 1e30) and it keeps fully-masked rows NaN-free (uniform
    softmax), the batch-padding guarantee documented in ops/rcda.py,
  * logits and softmax in f32, probabilities cast to the value dtype, PV
    accumulated in f32 (what the MXU does for the einsum path too).

The backward pass rematerializes through the einsum formulation (same
pattern as ops/rcda._rcda_core_pallas): same math, no saved probs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mha_kernel(num_heads, q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0]  # (qb, E)
    k = k_ref[0]  # (S, E)
    v = v_ref[0]  # (S, E)
    bias = bias_ref[0].astype(jnp.float32)  # (1, S)
    E = q.shape[-1]
    d = E // num_heads
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (qb, S)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def fused_mha(
    q: jnp.ndarray,  # (B, L, E), pre-scaled
    k: jnp.ndarray,  # (B, S, E)
    v: jnp.ndarray,  # (B, S, E)
    bias: jnp.ndarray,  # (B, S) additive key bias (0 / -1e30)
    num_heads: int,
    q_block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, L, E) in q.dtype. Grid: (B, ceil(L / q_block)); each
    program holds the full key axis and all heads, so per-program VMEM is
    (q_block + 2S) * E values plus one (q_block, S) f32 logits buffer
    (~2.2 MB at the production geometry L=S=576, E=256)."""
    B, L, E = q.shape
    S = k.shape[1]
    qb = L if L <= q_block else q_block
    grid = (B, pl.cdiv(L, qb))
    return pl.pallas_call(
        functools.partial(_mha_kernel, num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, E), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, E), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, E), lambda b, i: (b, 0, 0)),
            # (B, 1, S): block last-two dims equal the array's — the TPU
            # lowering requires (8, 128)-divisible or full dims
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, E), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, E), q.dtype),
        interpret=interpret,
    )(q, k, v, bias[:, None, :])


def mha_core_einsum(q, k, v, bias, num_heads):
    """The XLA oracle the kernel must match (and the backward formulation):
    q/k/v (B, L|S, E), q pre-scaled, bias (B, S) additive."""
    B, L, E = q.shape
    d = E // num_heads
    qh = q.reshape(B, L, num_heads, d)
    kh = k.reshape(B, -1, num_heads, d)
    vh = v.reshape(B, -1, num_heads, d)
    attn = jnp.einsum(
        "blnd,bsnd->bnls", qh, kh, preferred_element_type=jnp.float32
    )
    attn = attn + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bnls,bsnd->blnd", p, vh).reshape(B, L, E)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mha_core_fused(q, k, v, bias, num_heads):
    return fused_mha(q, k, v, bias, num_heads)


def _fwd(q, k, v, bias, num_heads):
    return mha_core_fused(q, k, v, bias, num_heads), (q, k, v, bias)


def _bwd(num_heads, res, g):
    _, vjp = jax.vjp(
        lambda *a: mha_core_einsum(*a, num_heads), *res
    )
    return vjp(g)


mha_core_fused.defvjp(_fwd, _bwd)


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"

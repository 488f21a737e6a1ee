"""Fused Pallas RCDA kernel vs the einsum oracle (the reference documents the
einsum form at row_column_decoupled_attention.py:228-245). Runs in Pallas
interpret mode so it works on the CPU test mesh; the same kernel is
exercised compiled on real TPU by bench.py and the TPU test job."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from countdetr_tpu.ops.rcda import _rcda_core_einsum
from countdetr_tpu.ops.pallas.rcda_kernel import fused_rcda


@pytest.mark.parametrize("L,H,W,E,n", [(64, 6, 9, 32, 4), (100, 7, 7, 64, 8)])
def test_fused_rcda_matches_einsum(rng, L, H, W, E, n):
    B = 2
    q_row = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    q_col = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    k_row = jnp.array(rng.normal(size=(B, W, E)).astype(np.float32))
    k_col = jnp.array(rng.normal(size=(B, H, E)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, H, W, E)).astype(np.float32))
    bias_row = jnp.zeros((B, W))
    bias_col = jnp.zeros((B, H))

    want = np.asarray(
        _rcda_core_einsum(q_row, q_col, k_row, k_col, v, bias_row, bias_col, n)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_rcda(q_row, q_col, k_row, k_col, v, bias_row, bias_col, n,
                       block_l=32)
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_rcda_masked(rng):
    B, L, H, W, E, n = 1, 32, 8, 10, 32, 4
    q_row = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    q_col = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    k_row = jnp.array(rng.normal(size=(B, W, E)).astype(np.float32))
    k_col = jnp.array(rng.normal(size=(B, H, E)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, H, W, E)).astype(np.float32))
    bias_row = jnp.where(jnp.arange(W) >= 7, -1e30, 0.0)[None, :].astype(jnp.float32)
    bias_col = jnp.where(jnp.arange(H) >= 5, -1e30, 0.0)[None, :].astype(jnp.float32)

    want = np.asarray(
        _rcda_core_einsum(q_row, q_col, k_row, k_col, v, bias_row, bias_col, n)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_rcda(q_row, q_col, k_row, k_col, v, bias_row, bias_col, n,
                       block_l=16)
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("L,H,W,E,n", [(64, 6, 9, 32, 4), (100, 7, 7, 64, 8)])
def test_fused_rcda_rank1_matches_einsum(rng, L, H, W, E, n):
    from countdetr_tpu.ops.pallas.rcda_kernel import fused_rcda_rank1

    B = 2
    q_row = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    q_col = jnp.array(rng.normal(size=(B, L, E)).astype(np.float32))
    k_row = jnp.array(rng.normal(size=(B, W, E)).astype(np.float32))
    k_col = jnp.array(rng.normal(size=(B, H, E)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, H, W, E)).astype(np.float32))
    bias_row = jnp.where(jnp.arange(W) >= W - 2, -1e30, 0.0)[None, :] * jnp.ones((B, 1))
    bias_col = jnp.where(jnp.arange(H) >= H - 1, -1e30, 0.0)[None, :] * jnp.ones((B, 1))
    bias_row = bias_row.astype(jnp.float32)
    bias_col = bias_col.astype(jnp.float32)

    want = np.asarray(
        _rcda_core_einsum(q_row, q_col, k_row, k_col, v, bias_row, bias_col, n)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_rcda_rank1(
                q_row, q_col, k_row, k_col, v, bias_row, bias_col, n,
                block_l=32,
            )
        )
    np.testing.assert_allclose(got, want, atol=2e-5)

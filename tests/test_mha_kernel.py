"""Fused-MHA Pallas kernel vs the XLA einsum oracle (interpret mode on CPU).

The kernel replaces the decoder self-attention einsum core on TPU
(ops/rcda.mha_attention); profile-backed rationale and the measured layout
lesson live in ops/pallas/mha_kernel.py. The contract: identical outputs
(f32 exact-ish, bf16 to tolerance) for masked, unmasked, fully-masked-row,
and non-block-aligned-L cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countdetr_tpu.ops.pallas.mha_kernel import fused_mha, mha_core_einsum


def _mk(rng, B, L, S, E, dtype, d):
    q = jnp.asarray(rng.normal(size=(B, L, E)), dtype) * (d ** -0.5)
    k = jnp.asarray(rng.normal(size=(B, S, E)), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, E)), dtype)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_einsum(dtype):
    rng = np.random.default_rng(0)
    B, L, S, n, d = 2, 40, 40, 2, 8
    q, k, v = _mk(rng, B, L, S, n * d, dtype, d)
    bias = jnp.zeros((B, S), jnp.float32)
    got = fused_mha(q, k, v, bias, n, interpret=True)
    want = mha_core_einsum(q, k, v, bias, n)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_with_key_mask_and_dead_rows():
    """Masked keys get -1e30 bias; a batch row whose keys are ALL masked
    must yield the uniform-softmax mean of v, never NaN."""
    rng = np.random.default_rng(1)
    B, L, S, n, d = 2, 12, 20, 2, 8
    q, k, v = _mk(rng, B, L, S, n * d, jnp.float32, d)
    mask = np.zeros((B, S), bool)
    mask[0, 13:] = True
    mask[1, :] = True  # fully masked batch row
    bias = jnp.where(jnp.asarray(mask), -1e30, 0.0).astype(jnp.float32)
    got = fused_mha(q, k, v, bias, n, interpret=True)
    want = mha_core_einsum(q, k, v, bias, n)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    uniform = np.broadcast_to(
        np.asarray(v.mean(axis=1))[1, None], np.asarray(got)[1].shape
    )
    np.testing.assert_allclose(np.asarray(got)[1], uniform, atol=1e-6)


def test_fused_partial_final_block():
    """L > q_block exercises the multi-block grid path (and a final block
    that does not divide L)."""
    rng = np.random.default_rng(2)
    B, L, S, n, d = 1, 50, 50, 1, 8
    q, k, v = _mk(rng, B, L, S, n * d, jnp.float32, d)
    bias = jnp.zeros((B, S), jnp.float32)
    got = fused_mha(q, k, v, bias, n, q_block=16, interpret=True)
    want = mha_core_einsum(q, k, v, bias, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_grad_path_matches_einsum_grads():
    """mha_core_fused's custom backward rematerializes the einsum form —
    its gradients must equal differentiating the einsum core directly.
    (Runs the einsum vjp on both sides; the fused forward is TPU-only, so
    on CPU we check the registered bwd rule in isolation.)"""
    from countdetr_tpu.ops.pallas import mha_kernel

    rng = np.random.default_rng(3)
    B, L, S, n, d = 1, 8, 8, 2, 4
    q, k, v = _mk(rng, B, L, S, n * d, jnp.float32, d)
    bias = jnp.zeros((B, S), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, L, n * d)), jnp.float32)
    got = mha_kernel._bwd(n, (q, k, v, bias), g)
    _, vjp = jax.vjp(lambda *a: mha_core_einsum(*a, n), q, k, v, bias)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mha_attention_cpu_path_unchanged():
    """On CPU mha_attention routes to the einsum core; the bias-add mask
    formulation must equal the previous where() formulation."""
    from countdetr_tpu.ops import rcda

    rng = np.random.default_rng(3)
    B, L, E, n = 2, 10, 16, 2
    q = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3 * E, E)) * 0.1, jnp.float32)
    b = jnp.zeros((3 * E,), jnp.float32)
    ow = jnp.asarray(rng.normal(size=(E, E)) * 0.1, jnp.float32)
    ob = jnp.zeros((E,), jnp.float32)
    mask = np.zeros((B, L), bool)
    mask[0, 7:] = True
    out = rcda.mha_attention(q, kv, kv, w, b, ow, ob, n, jnp.asarray(mask))

    # where() oracle
    d = E // n
    qq = (q @ w[:E].T).reshape(B, L, n, d) * (d ** -0.5)
    kk = (kv @ w[E : 2 * E].T).reshape(B, L, n, d)
    vv = (kv @ w[2 * E :].T).reshape(B, L, n, d)
    attn = jnp.einsum("blnd,bsnd->bnls", qq, kk)
    attn = jnp.where(jnp.asarray(mask)[:, None, None, :], -1e30, attn)
    p = jax.nn.softmax(attn, axis=-1)
    want = jnp.einsum("bnls,bsnd->blnd", p, vv).reshape(B, L, E) @ ow.T + ob
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-6, atol=2e-6
    )

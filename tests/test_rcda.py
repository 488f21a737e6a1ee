"""Golden parity: our jnp RCDA vs the reference torch MultiheadRCDA module
(loaded read-only from /root/reference as a test oracle; pure-torch, no CUDA).
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from countdetr_tpu.ops import rcda

REF = "/root/reference/src/CountDETR_147_1st_stage/models/row_column_decoupled_attention.py"


def _load_ref_rcda():
    spec = importlib.util.spec_from_file_location("ref_rcda", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_available = os.path.exists(REF)


@pytest.mark.skipif(not ref_available, reason="reference tree not mounted")
@pytest.mark.parametrize("with_mask", [False, True])
def test_rcda_matches_reference_torch(rng, with_mask):
    mod = _load_ref_rcda()
    E, n, B, L, H, W = 32, 4, 2, 11, 6, 9
    torch.manual_seed(0)
    m = mod.MultiheadRCDA(E, n, dropout=0.0)
    m.eval()

    qr = rng.normal(size=(B, L, E)).astype(np.float32)
    qc = rng.normal(size=(B, L, E)).astype(np.float32)
    kr = rng.normal(size=(B, H, W, E)).astype(np.float32)
    kc = rng.normal(size=(B, H, W, E)).astype(np.float32)
    v = rng.normal(size=(B, H, W, E)).astype(np.float32)

    mask = None
    if with_mask:
        mask = np.zeros((B, H, W), dtype=bool)
        mask[:, 4:, :] = True  # pad bottom rows
        mask[:, :, 7:] = True  # pad right cols

    # Torch oracle. In the masked case we compare against the reference run
    # on the CROPPED (unpadded) inputs: our masked RCDA (masked softmaxes AND
    # masked axis-means) is defined to equal the computation on the valid
    # region — the property bucketed padding relies on. (The reference's own
    # masked path still axis-averages over padded rows because it never pads
    # in practice — batch size 1.)
    hv, wv = (4, 7) if with_mask else (H, W)
    with torch.no_grad():
        want, _ = m(
            torch.tensor(qr),
            torch.tensor(qc),
            torch.tensor(kr[:, :hv, :wv]),
            torch.tensor(kc[:, :hv, :wv]),
            torch.tensor(v[:, :hv, :wv]),
        )
    want = want.transpose(0, 1).numpy()  # reference returns (L, B, E)

    params = rcda.RCDAParams(
        in_proj_weight=jnp.array(m.in_proj_weight.detach().numpy()),
        in_proj_bias=jnp.array(m.in_proj_bias.detach().numpy()),
        out_proj_weight=jnp.array(m.out_proj.weight.detach().numpy()),
        out_proj_bias=jnp.array(m.out_proj.bias.detach().numpy()),
    )
    got = np.asarray(
        rcda.rcda_attention(
            jnp.array(qr), jnp.array(qc), jnp.array(kr), jnp.array(kc), jnp.array(v),
            params, num_heads=n,
            key_padding_mask=None if mask is None else jnp.array(mask),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mha_matches_torch(rng):
    E, n, B, L, S = 32, 4, 2, 7, 13
    torch.manual_seed(1)
    m = torch.nn.MultiheadAttention(E, n, dropout=0.0)
    m.eval()

    q = rng.normal(size=(B, L, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)

    with torch.no_grad():
        want, _ = m(
            torch.tensor(q).transpose(0, 1),
            torch.tensor(k).transpose(0, 1),
            torch.tensor(v).transpose(0, 1),
        )
    want = want.transpose(0, 1).numpy()

    got = np.asarray(
        rcda.mha_attention(
            jnp.array(q), jnp.array(k), jnp.array(v),
            jnp.array(m.in_proj_weight.detach().numpy()),
            jnp.array(m.in_proj_bias.detach().numpy()),
            jnp.array(m.out_proj.weight.detach().numpy()),
            jnp.array(m.out_proj.bias.detach().numpy()),
            num_heads=n,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_grid_query_core_matches_flat(rng, with_mask):
    """The encoder's grid-query path (queries kept (B,H,W,E), ops/rcda.py::
    _rcda_core_einsum_grid) must equal the flat (B,L,E) core exactly up to
    float reorder — same projections, same softmaxes, different einsum
    shapes."""
    E, n, B, H, W = 32, 4, 2, 6, 9
    qr = rng.normal(size=(B, H, W, E)).astype(np.float32)
    qc = rng.normal(size=(B, H, W, E)).astype(np.float32)
    kr = rng.normal(size=(B, H, W, E)).astype(np.float32)
    kc = rng.normal(size=(B, H, W, E)).astype(np.float32)
    v = rng.normal(size=(B, H, W, E)).astype(np.float32)
    params = rcda.RCDAParams(
        in_proj_weight=jnp.asarray(
            rng.normal(size=(5 * E, E)).astype(np.float32)
        ),
        in_proj_bias=jnp.asarray(rng.normal(size=(5 * E,)).astype(np.float32)),
        out_proj_weight=jnp.asarray(
            rng.normal(size=(E, E)).astype(np.float32)
        ),
        out_proj_bias=jnp.asarray(rng.normal(size=(E,)).astype(np.float32)),
    )
    mask = None
    if with_mask:
        mask = np.zeros((B, H, W), dtype=bool)
        mask[:, 4:, :] = True
        mask[:, :, 7:] = True
        mask = jnp.asarray(mask)

    flat = rcda.rcda_attention(
        jnp.asarray(qr.reshape(B, H * W, E)),
        jnp.asarray(qc.reshape(B, H * W, E)),
        jnp.asarray(kr), jnp.asarray(kc), jnp.asarray(v),
        params, n, key_padding_mask=mask,
    )
    grid = rcda.rcda_attention(
        jnp.asarray(qr), jnp.asarray(qc),
        jnp.asarray(kr), jnp.asarray(kc), jnp.asarray(v),
        params, n, key_padding_mask=mask,
    )
    assert grid.shape == (B, H, W, E)
    np.testing.assert_allclose(
        np.asarray(grid).reshape(B, H * W, E), np.asarray(flat),
        rtol=2e-5, atol=2e-5,
    )

"""Golden parity: full reference AnchorDETR (torch, CPU, random weights)
vs our flax model with the weights imported through
train/checkpoints.torch_state_dict_to_params. This pins the entire forward
stack — backbone, input projection, posembs, RCDA encoder/decoder, heads —
to the reference bit-for-bit (fp32 tolerances).

Small dims keep the torch side fast; the mapping logic is dimension-blind.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.checkpoints import torch_state_dict_to_params
from tests.ref_oracle import REF_TREES, ReferenceStage

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_TREES[1]), reason="reference tree not mounted"
)]

# the reference hardcodes 256-dim positional embeddings (pos2posemb1d default,
# transformer.py:485) so hidden_dim must stay 256; shrink layers instead
DIMS = dict(enc_layers=2, dec_layers=2, hidden_dim=256, nheads=8, dim_feedforward=256)


def _np(x):
    return x.detach().cpu().numpy()


def test_stage1_forward_parity(rng):
    H, W, P = 96, 128, 3
    img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
    pts = rng.uniform(0.2, 0.8, (1, P, 2)).astype(np.float32)

    with ReferenceStage(1) as ref:
        torch.manual_seed(0)
        model = ref.build_model(
            spatial_prior="defined", num_query_pattern=1, **DIMS
        )
        with torch.no_grad():
            out = model(torch.tensor(img), torch.tensor(pts))
        want_logits = _np(out["pred_logits"])
        want_wh = _np(out["pred_wh"])
        want_points = _np(out["pred_points"])
        sd = {k: _np(v) for k, v in model.state_dict().items()}

    cfg = cfglib.stage1_config().model.replace(**DIMS)
    jmodel = CountingDetr(cfg)
    images = jnp.array(np.transpose(img, (0, 2, 3, 1)))
    mask = jnp.zeros((1, H, W), dtype=bool)
    jpts = jnp.array(pts)
    pvalid = jnp.ones((1, P), dtype=bool)
    template = jmodel.init(jax.random.PRNGKey(0), images, mask, jpts, pvalid)
    params = torch_state_dict_to_params(sd, template)
    got = jmodel.apply(params, images, mask, jpts, pvalid)

    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), want_logits, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(got["pred_wh"]), want_wh, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got["pred_points"]), want_points, atol=2e-4
    )


def test_stage2_forward_parity(rng):
    H, W, K = 96, 96, 3
    img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
    rects = rng.uniform(0.1, 0.6, (1, K, 4)).astype(np.float32)
    rects[..., 2:] = rects[..., :2] + 0.2

    with ReferenceStage(2) as ref:
        torch.manual_seed(0)
        model = ref.build_model(
            spatial_prior="grid", num_query_position=25, num_query_pattern=1,
            **DIMS,
        )
        with torch.no_grad():
            out, ref_points = model(
                torch.tensor(img), points=None, rects=torch.tensor(rects)
            )
        want_logits = _np(out["pred_logits"])
        want_boxes = _np(out["pred_boxes"])
        want_vars = _np(out["pred_vars"])
        want_refs = _np(ref_points)
        sd = {k: _np(v) for k, v in model.state_dict().items()}

    cfg = cfglib.stage2_config().model.replace(num_query_position=25, **DIMS)
    jmodel = CountingDetr(cfg)
    images = jnp.array(np.transpose(img, (0, 2, 3, 1)))
    mask = jnp.zeros((1, H, W), dtype=bool)
    jrects = jnp.array(rects)
    template = jmodel.init(
        jax.random.PRNGKey(0), images, mask, exemplar_boxes=jrects
    )
    params = torch_state_dict_to_params(sd, template)
    got = jmodel.apply(params, images, mask, exemplar_boxes=jrects)

    np.testing.assert_allclose(
        np.asarray(got["reference_points"]), want_refs, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), want_logits, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(got["pred_boxes"]), want_boxes, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["pred_vars"]), want_vars, atol=2e-4)

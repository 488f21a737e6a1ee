"""Torch-import coverage for the long-tail architectures: multi-level
(num_feature_levels=3) and the --masks DETRsegm wrap. Both import STRICTLY
(every reference key consumed or allowlisted) and land bit-exactly on the
matching leaves of our param tree.

The reference's DETRsegm.forward cannot execute on AnchorDETR (it reads
self.detr.query_embed, which AnchorDETR doesn't define — dead original-DETR
code, segmentation.py:52), so the masks check is at the parameter level;
the multilevel check also pins the full forward against the live reference.
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

DIMS = dict(enc_layers=2, dec_layers=2, hidden_dim=256, nheads=8,
            dim_feedforward=256)


def _np(x):
    return x.detach().cpu().numpy()


def test_multilevel_import_and_forward_parity(rng):
    H, W, P = 96, 128, 3
    img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
    pts = rng.uniform(0.2, 0.8, (1, P, 2)).astype(np.float32)

    with ReferenceStage(1) as ref:
        torch.manual_seed(0)
        model = ref.build_model(
            spatial_prior="defined", num_query_pattern=1,
            num_feature_levels=3, **DIMS,
        )
        with torch.no_grad():
            out = model(torch.tensor(img), torch.tensor(pts))
        want_logits = _np(out["pred_logits"])
        want_wh = _np(out["pred_wh"])
        sd = {k: _np(v) for k, v in model.state_dict().items()}

    cfg = cfglib.stage1_config().model.replace(num_feature_levels=3, **DIMS)
    jmodel = CountingDetr(cfg)
    images = jnp.array(np.transpose(img, (0, 2, 3, 1)))
    mask = jnp.zeros((1, H, W), dtype=bool)
    jpts = jnp.array(pts)
    pvalid = jnp.ones((1, P), dtype=bool)
    template = jmodel.init(jax.random.PRNGKey(0), images, mask, jpts, pvalid)
    params = torch_state_dict_to_params(sd, template, strict=True)

    # spot-check bit-exact landings of the multilevel-only params
    tr = params["params"]["transformer"]
    np.testing.assert_array_equal(
        np.asarray(tr["level_embed"]), sd["transformer.level_embed.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(tr["decoder_0"]["level_fc"]["weight"]),
        sd["transformer.decoder_layers.0.level_fc.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["params"]["input_proj_1"]["conv"]["kernel"]),
        np.transpose(sd["input_proj.1.0.weight"], (2, 3, 1, 0)),
    )
    assert "encoder_level_0" in tr

    got = jmodel.apply(params, images, mask, jpts, pvalid)
    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), want_logits, atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(got["pred_wh"]), want_wh, atol=3e-4)


def test_masks_import_bit_exact(rng):
    with ReferenceStage(1) as ref:
        import importlib

        torch.manual_seed(0)
        inner = ref.build_model(
            spatial_prior="defined", num_query_pattern=1, **DIMS
        )
        seg_mod = importlib.import_module("models.segmentation")
        model = seg_mod.DETRsegm(inner)
        sd = {k: _np(v) for k, v in model.state_dict().items()}

    cfg = cfglib.stage1_config().model.replace(masks=True, **DIMS)
    jmodel = CountingDetr(cfg)
    H, W, P = 96, 96, 2
    images = jnp.array(
        rng.normal(size=(1, H, W, 3)).astype(np.float32)
    )
    mask = jnp.zeros((1, H, W), dtype=bool)
    jpts = jnp.array(rng.uniform(0.2, 0.8, (1, P, 2)).astype(np.float32))
    pvalid = jnp.ones((1, P), dtype=bool)
    template = jmodel.init(jax.random.PRNGKey(0), images, mask, jpts, pvalid)
    params = torch_state_dict_to_params(sd, template, strict=True)

    p = params["params"]
    np.testing.assert_array_equal(
        np.asarray(p["bbox_attention"]["q_linear"]["kernel"]),
        sd["bbox_attention.q_linear.weight"].T,
    )
    for mod in ("lay1", "lay5", "out_lay", "adapter3"):
        np.testing.assert_array_equal(
            np.asarray(p["mask_head"][mod]["kernel"]),
            np.transpose(sd[f"mask_head.{mod}.weight"], (2, 3, 1, 0)),
        )
    for j in (1, 5):
        np.testing.assert_array_equal(
            np.asarray(p["mask_head"][f"gn{j}"]["scale"]),
            sd[f"mask_head.gn{j}.weight"],
        )
    # the imported model still runs our (working) mask forward
    out = jmodel.apply(params, images, mask, jpts, pvalid)
    assert out["pred_masks"].shape[0] == 1
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

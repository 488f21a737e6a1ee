"""num_feature_levels > 1: multi-scale projections, cross-level encoder
attention, decoder level_fc merge (reference transformer.py:51-58,281-312,
398-399; anchor_detr.py:49-65)."""

import jax
import jax.numpy as jnp
import numpy as np

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr


def test_multilevel_forward(rng):
    cfg = cfglib.stage1_config().model.replace(
        enc_layers=2, dec_layers=1, hidden_dim=32, nheads=4,
        dim_feedforward=64, num_feature_levels=3,
    )
    model = CountingDetr(cfg)
    B, H, W, P = 1, 64, 64, 3
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.zeros((B, H, W), dtype=bool)
    points = jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    pvalid = jnp.ones((B, P), dtype=bool)

    params = model.init(jax.random.PRNGKey(0), images, mask, points, pvalid)
    # level-specific params exist
    tp = params["params"]["transformer"]
    assert "level_embed" in tp
    assert "encoder_level_0" in tp
    assert "level_fc" in tp["decoder_0"]
    assert "input_proj_0" in params["params"]
    assert "input_proj_2" in params["params"]

    out = model.apply(params, images, mask, points, pvalid)
    assert out["pred_wh"].shape == (B, P, 2)
    assert np.isfinite(np.asarray(out["pred_wh"])).all()

"""attention_type='MHA' (the reference's nn.MultiheadAttention option,
main.py:85-92) must run end-to-end alongside the default RCDA."""

import jax
import jax.numpy as jnp
import numpy as np

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr


def test_mha_attention_type_forward(rng):
    cfg = cfglib.stage1_config().model.replace(
        enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
        dim_feedforward=64, attention_type="MHA",
    )
    model = CountingDetr(cfg)
    B, H, W, P = 1, 64, 96, 3
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = np.zeros((B, H, W), dtype=bool)
    mask[0, 48:, :] = True
    points = jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    pvalid = jnp.ones((B, P), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, jnp.array(mask), points, pvalid)
    out = model.apply(params, images, jnp.array(mask), points, pvalid)
    assert out["pred_wh"].shape == (B, P, 2)
    assert np.isfinite(np.asarray(out["pred_wh"])).all()

    # padding invariance holds for the MHA path too
    images2 = jnp.pad(images, ((0, 0), (0, 0), (0, 32), (0, 0)))
    mask2 = np.pad(mask, ((0, 0), (0, 0), (0, 32)), constant_values=True)
    out2 = model.apply(params, images2, jnp.array(mask2), points, pvalid)
    np.testing.assert_allclose(
        np.asarray(out["pred_wh"]), np.asarray(out2["pred_wh"]), atol=2e-5
    )

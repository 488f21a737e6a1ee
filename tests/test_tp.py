"""Tensor-parallel sharding: a (data=2, model=4) mesh must reproduce the
single-device forward and train step (XLA inserts the collectives from the
param shardings alone — the scaling-book recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.core.mesh import (
    make_mesh, shard_batch, shard_params_tp, tp_param_spec,
)
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_forward_matches_single_device(rng):
    cfg = cfglib.stage1_config().model.replace(
        enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64
    )
    model = CountingDetr(cfg)
    B, H, W, P = 2, 32, 32, 3
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.zeros((B, H, W), dtype=bool)
    points = jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    pvalid = jnp.ones((B, P), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, mask, points, pvalid)

    want = np.asarray(model.apply(params, images, mask, points, pvalid)["pred_wh"])

    mesh = make_mesh((2, 4), ("data", "model"))
    with mesh:
        sp = shard_params_tp(params, mesh)
        db = shard_batch(
            {"images": images, "pad_mask": mask, "points": points,
             "points_valid": pvalid},
            mesh,
        )
        got = np.asarray(
            jax.jit(model.apply)(
                sp, db["images"], db["pad_mask"], db["points"], db["points_valid"]
            )["pred_wh"]
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_train_step(rng):
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64, num_query_position=16,
        )
    )
    model = CountingDetr(cfg.model)
    B, H, W, T, K = 2, 32, 32, 4, 3
    boxes = rng.uniform(0.3, 0.7, (B, T, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., 2:], 0.05, 0.2)
    rects = rng.uniform(0.1, 0.6, (B, K, 4)).astype(np.float32)
    rects[..., 2:] = rects[..., :2] + 0.15
    batch = {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "boxes": jnp.array(boxes),
        "boxes_valid": jnp.ones((B, T), dtype=bool),
        "exemplar_boxes": jnp.array(rects),
        "batch_valid": jnp.ones((B,), dtype=bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        exemplar_boxes=batch["exemplar_boxes"],
    )
    tx = build_optimizer(cfg.train, params, 10)
    mesh = make_mesh((2, 4), ("data", "model"))
    with mesh:
        sp = shard_params_tp(params, mesh)
        state = create_state(sp, tx)
        step = make_train_step(model, tx, cfg)
        db = shard_batch(batch, mesh)
        state, m = step(state, db)
        assert np.isfinite(float(m["loss"]))


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    class K:  # fake DictKey
        def __init__(self, k):
            self.key = k

    w = np.zeros((160, 32))
    assert tp_param_spec([K("transformer"), K("encoder_0"), K("self_attn"),
                          K("in_proj_weight")], w) == P("model", None)
    assert tp_param_spec([K("transformer"), K("decoder_0"), K("cross_attn"),
                          K("out_proj_weight")], np.zeros((32, 32))) == P(None, "model")
    assert tp_param_spec([K("transformer"), K("encoder_0"), K("ffn"),
                          K("linear1"), K("weight")], np.zeros((64, 32))) == P("model", None)
    assert tp_param_spec([K("backbone"), K("conv1"), K("kernel")],
                         np.zeros((7, 7, 3, 64))) == P()

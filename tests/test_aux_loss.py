import jax
import jax.numpy as jnp
import numpy as np

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step


def test_stage2_aux_loss_trains(rng):
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=2, hidden_dim=32, nheads=4,
            dim_feedforward=64, num_query_position=16, aux_loss=True,
        )
    )
    model = CountingDetr(cfg.model)
    B, H, W, T, K = 2, 64, 64, 4, 3
    boxes = rng.uniform(0.2, 0.7, (B, T, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., 2:], 0.05, 0.25)
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
    tx = build_optimizer(cfg.train, params, steps_per_epoch=10)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch)
    # per-layer aux losses present (dec_layers=2 -> one aux layer, index 0)
    assert "loss_ce_0" in m and np.isfinite(float(m["loss_ce_0"]))
    assert "loss_bbox_0" in m
    assert np.isfinite(float(m["loss"]))
    # aux raises the total loss above the last-layer-only weighted sum
    last_only = (
        2 * float(m["loss_ce"]) + 5 * float(m["loss_bbox"])
        + 2 * float(m["loss_giou"]) + 2 * float(m["loss_variance"])
    )
    assert float(m["loss"]) > last_only

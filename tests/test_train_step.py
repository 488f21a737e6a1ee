"""End-to-end train-step tests on tiny models: loss decreases, grads flow to
the right params, frozen params stay frozen."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.optimizer import build_optimizer, _label
from countdetr_tpu.train.train_step import create_state, make_train_step


def _tiny(model_cfg):
    return model_cfg.replace(
        enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64
    )


def _stage1_batch(rng, B=2, H=64, W=64, P=3):
    return {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "points": jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
        "points_valid": jnp.ones((B, P), dtype=bool),
        "whs": jnp.array(rng.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32)),
    }


def test_stage1_train_step_loss_decreases(rng):
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=_tiny(cfg.model), train=cfg.train.replace(lr=1e-3))
    model = CountingDetr(cfg.model)
    batch = _stage1_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_stage1_frozen_params_do_not_move(rng):
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=_tiny(cfg.model))
    model = CountingDetr(cfg.model)
    batch = _stage1_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    # train_step donates its state: snapshot params to host numpy first
    params_before = jax.tree_util.tree_map(np.asarray, params)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    # two steps: the bbox head is zero-init (reference transformer.py:90-91),
    # so upstream gradients are exactly zero on the very first step
    new_state, _ = step(state, batch)
    new_state, _ = step(new_state, batch)

    flat0 = jax.tree_util.tree_flatten_with_path(params_before)[0]
    flat1 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    }
    moved_frozen, moved_backbone, moved_main = [], 0, 0
    for path, v0 in flat0:
        label = _label(path)
        v1 = flat1[jax.tree_util.keystr(path)]
        changed = not np.allclose(np.asarray(v0), np.asarray(v1))
        if label == "frozen" and changed:
            moved_frozen.append(jax.tree_util.keystr(path))
        moved_backbone += changed and label == "backbone"
        moved_main += changed and label == "main"
    assert not moved_frozen, moved_frozen[:5]
    assert moved_backbone > 0
    assert moved_main > 0


def test_stage2_train_step_more_targets_than_queries(rng):
    """Dense images: more VALID targets than queries (the FSC-147 regime —
    up to ~3.7k dots vs 576 grid queries). The default stage-2 config has
    max_boxes=700 > 576 queries; training must run and stay finite, with
    only min(Q, T) targets matched per image."""
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=_tiny(cfg.model).replace(num_query_position=16),  # 4x4 grid
        train=cfg.train.replace(lr=1e-3),
    )
    Q = cfg.model.num_queries
    model = CountingDetr(cfg.model)
    B, H, W, T, K = 2, 64, 64, 40, 3
    assert T > Q
    boxes = rng.uniform(0.2, 0.7, (B, T, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., 2:], 0.05, 0.25)
    rects = rng.uniform(0.1, 0.6, (B, K, 4)).astype(np.float32)
    rects[..., 2:] = rects[..., :2] + 0.15
    bvalid = np.ones((B, T), dtype=bool)
    bvalid[1, 30:] = False  # still 30 valid > 16 queries
    batch = {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "boxes": jnp.array(boxes),
        "boxes_valid": jnp.array(bvalid),
        "exemplar_boxes": jnp.array(rects),
        "batch_valid": jnp.ones((B,), dtype=bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        exemplar_boxes=batch["exemplar_boxes"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for k in ("loss", "loss_ce", "loss_bbox", "loss_giou", "loss_variance"):
        assert np.isfinite(float(m0[k])), k
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_stage1_all_masked_row_stays_finite(rng):
    """Regression: a batch-padding row (points_valid all False, as produced
    by Batcher partial batches where points_valid &= batch_valid) must NOT
    poison training. The decoder self-attention used a -inf
    key_padding_mask, so an all-masked row produced softmax NaN that
    survived the loss masking (0 * NaN = NaN) and corrupted the params
    after one step."""
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=_tiny(cfg.model), train=cfg.train.replace(lr=1e-3))
    model = CountingDetr(cfg.model)
    batch = _stage1_batch(rng)
    pv = np.asarray(batch["points_valid"]).copy()
    pv[1, :] = False  # row 1 is pure batch padding
    batch["points_valid"] = jnp.array(pv)
    batch["batch_valid"] = jnp.array([True, False])
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"])), m
    assert np.isfinite(float(m["grad_norm"])), m
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # and a second step still trains
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))


def test_stage2_train_step(rng):
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=_tiny(cfg.model).replace(num_query_position=16),
        train=cfg.train.replace(lr=1e-3),
    )
    model = CountingDetr(cfg.model)
    B, H, W, T, K = 2, 64, 64, 5, 3
    boxes = rng.uniform(0.2, 0.7, (B, T, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., 2:], 0.05, 0.25)
    rects = rng.uniform(0.1, 0.6, (B, K, 4)).astype(np.float32)
    rects[..., 2:] = rects[..., :2] + 0.15
    bvalid = np.ones((B, T), dtype=bool)
    bvalid[1, 3:] = False
    batch = {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "boxes": jnp.array(boxes),
        "boxes_valid": jnp.array(bvalid),
        "exemplar_boxes": jnp.array(rects),
        "batch_valid": jnp.ones((B,), dtype=bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        exemplar_boxes=batch["exemplar_boxes"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    state, m0 = step(state, batch)
    for k in ("loss", "loss_ce", "loss_bbox", "loss_giou", "loss_variance"):
        assert np.isfinite(float(m0[k])), k
    losses = [float(m0["loss"])]
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_dropout_trains_and_is_deterministic_at_eval(rng):
    """--dropout is honored: nonzero rate changes the train-mode forward
    across steps (different masks) but eval/infer stays deterministic."""
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=_tiny(cfg.model).replace(dropout=0.5),
        train=cfg.train.replace(lr=1e-3),
    )
    model = CountingDetr(cfg.model)
    batch = _stage1_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    # eval mode: no rngs needed, bitwise deterministic
    o1 = model.apply(
        params, batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    o2 = model.apply(
        params, batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    assert np.array_equal(
        np.asarray(o1["pred_logits"]), np.asarray(o2["pred_logits"])
    )
    # train mode: different dropout keys -> different outputs
    t1 = model.apply(
        params, batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"], train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    t2 = model.apply(
        params, batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"], train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    # pred_wh is constant at init (zero-init bbox head) — compare logits
    assert not np.array_equal(
        np.asarray(t1["pred_logits"]), np.asarray(t2["pred_logits"])
    )
    # and the train step runs finite with dropout active
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_stage2_sampled_prior_trains(rng):
    """--spatial_prior sampled: density-drawn points are the anchors
    (reference 2nd-stage transformer.py:131-133, engine.py:26-33)."""
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=_tiny(cfg.model).replace(spatial_prior="sampled"),
        train=cfg.train.replace(lr=1e-3),
    )
    model = CountingDetr(cfg.model)
    B, H, W, T, K, S = 2, 64, 64, 5, 3, 12
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
        "sampled_points": jnp.array(
            rng.uniform(0.1, 0.9, (B, S, 2)).astype(np.float32)
        ),
        "sampled_points_valid": jnp.ones((B, S), dtype=bool),
        "batch_valid": jnp.ones((B,), dtype=bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        points=batch["sampled_points"],
        points_valid=batch["sampled_points_valid"],
        exemplar_boxes=batch["exemplar_boxes"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_multistep_lr_schedule():
    """--lr_drop_epochs MultiStepLR parity (reference 2nd-stage main.py:39):
    one 0.1 factor per listed epoch reached; overrides the periodic drop."""
    import numpy as np

    from countdetr_tpu.train.optimizer import make_schedule

    sched = make_schedule(1.0, 20, steps_per_epoch=10, drop_epochs=[2, 5])
    # epoch 0-1: 1.0; epoch 2-4: 0.1; epoch 5+: 0.01
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0
    assert float(sched(20)) == np.float32(0.1)
    assert float(sched(49)) == np.float32(0.1)
    assert abs(float(sched(50)) - 0.01) < 1e-9
    # without drop_epochs: periodic StepLR
    s2 = make_schedule(1.0, 2, steps_per_epoch=10)
    assert float(s2(19)) == 1.0 and float(s2(20)) == np.float32(0.1)


def test_label_stem_vs_block_conv1():
    """Regression for the round-4 frozen-set fix: the STEM conv1
    (backbone/conv1) is frozen, but every bottleneck's conv1 inside
    layer2-4 trains at lr_backbone (reference backbone.py:66-68 freezes
    only the stem + layer1; block convs are ordinary trainable params)."""
    import jax.tree_util as jtu

    tree = {
        "params": {
            "backbone": {
                "conv1": {"kernel": 0},                 # stem -> frozen
                "layer1_0": {"conv1": {"kernel": 0}},   # layer1 -> frozen
                "layer2_0": {
                    "conv1": {"kernel": 0},             # block -> backbone
                    "conv2": {"kernel": 0},
                    "bn1": {"scale": 0},                # FrozenBN -> frozen
                    "downsample_conv": {"kernel": 0},
                },
            },
            "transformer": {"cls_embed": {"weight": 0}},
        }
    }
    labels = jtu.tree_map_with_path(lambda p, _: _label(p), tree)
    bb = labels["params"]["backbone"]
    assert bb["conv1"]["kernel"] == "frozen"
    assert bb["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert bb["layer2_0"]["conv1"]["kernel"] == "backbone"
    assert bb["layer2_0"]["conv2"]["kernel"] == "backbone"
    assert bb["layer2_0"]["bn1"]["scale"] == "frozen"
    assert bb["layer2_0"]["downsample_conv"]["kernel"] == "backbone"
    assert labels["params"]["transformer"]["cls_embed"]["weight"] == "main"


def test_train_one_epoch_max_steps(rng):
    """The smoke-run step cap: train_one_epoch stops after max_steps and
    reports the count."""
    from countdetr_tpu.train import engine

    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=_tiny(cfg.model))
    model = CountingDetr(cfg.model)
    batch = _stage1_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    class FiveBatches:
        def __iter__(self):
            return iter([dict(batch) for _ in range(5)])

    state, stats = engine.train_one_epoch(
        step, state, FiveBatches(), None, epoch=0, max_steps=2
    )
    assert stats["steps"] == 2
    assert int(jax.device_get(state.step)) == 2

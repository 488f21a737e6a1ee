"""Orbax checkpoint save/restore round-trip + torch import edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train import checkpoints as ckpt
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step


def test_orbax_roundtrip(tmp_path, rng):
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64
        )
    )
    model = CountingDetr(cfg.model)
    B, H, W, P = 2, 32, 32, 3
    batch = {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "points": jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
        "points_valid": jnp.ones((B, P), dtype=bool),
        "whs": jnp.array(rng.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, 10)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    snap = jax.tree_util.tree_map(np.asarray, state.params)
    ckpt.save_checkpoint(str(tmp_path), 7, state, {"epoch": 3})
    assert ckpt.latest_step(str(tmp_path)) == 7

    # fresh state, restore into it
    params2 = model.init(
        jax.random.PRNGKey(1), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    state2 = create_state(params2, tx)
    rparams, ropt, meta = ckpt.restore_checkpoint(str(tmp_path), 7, state2)
    assert meta["epoch"] == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(snap), jax.tree_util.tree_leaves(rparams)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state continues training without error
    state3 = state2._replace(params=rparams, opt_state=ropt)
    state3, m = step(state3, batch)
    assert np.isfinite(float(m["loss"]))


def test_async_saver_roundtrip_and_commit_ordering(tmp_path, rng):
    """AsyncSaver: (1) latest.json must NOT advance until the pending write
    is finalized (a crash mid-write resumes from the previous committed
    step); (2) back-to-back saves finalize the earlier one; (3) the restored
    state equals what was saved."""
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64,
        )
    )
    model = CountingDetr(cfg.model)
    B, H, W, P = 2, 32, 32, 3
    batch = {
        "images": jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "points": jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
        "points_valid": jnp.ones((B, P), dtype=bool),
        "whs": jnp.array(rng.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, 10)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, _ = step(state, batch)

    saver = ckpt.AsyncSaver()
    snap0 = jax.tree_util.tree_map(np.asarray, state.params)
    saver.save(str(tmp_path), 0, state, {"epoch": 0})
    # pending write: not yet visible to auto-resume
    assert ckpt.latest_step(str(tmp_path)) is None

    state, _ = step(state, batch)  # compute overlapping the write
    snap1 = jax.tree_util.tree_map(np.asarray, state.params)
    saver.save(str(tmp_path), 1, state, {"epoch": 1})
    # the second save must have finalized (published) the first
    assert ckpt.latest_step(str(tmp_path)) == 0
    saver.finalize()
    assert ckpt.latest_step(str(tmp_path)) == 1
    saver.finalize()  # idempotent

    for step_id, snap in ((0, snap0), (1, snap1)):
        rparams, _, meta = ckpt.restore_checkpoint(
            str(tmp_path), step_id, state
        )
        assert meta["epoch"] == step_id
        for a, b in zip(
            jax.tree_util.tree_leaves(snap),
            jax.tree_util.tree_leaves(rparams),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_import_rejects_shape_mismatch(rng):
    """A wrong-shaped tensor must fail loudly, not silently broadcast."""
    from countdetr_tpu.train.checkpoints import torch_state_dict_to_params

    template = {"params": {"transformer": {"adapt_pos1d": {
        "0": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
        "2": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
    }, "adapt_pos2d": {
        "0": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
        "2": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
    }}}}
    sd = {}
    for ap in ("adapt_pos1d", "adapt_pos2d"):
        for i in ("0", "2"):
            sd[f"transformer.{ap}.{i}.weight"] = np.zeros((4, 4), np.float32)
            sd[f"transformer.{ap}.{i}.bias"] = np.zeros((4,), np.float32)
    sd["transformer.adapt_pos1d.0.weight"] = np.zeros((8, 4), np.float32)  # wrong
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_state_dict_to_params(sd, template)


def test_torch_import_skip_mismatched():
    """Reference behavior when query counts change: drop the mismatched
    pattern weight, keep init (reference main.py:229-232)."""
    from countdetr_tpu.train.checkpoints import torch_state_dict_to_params

    init_val = np.full((3, 4), 7.0, np.float32)
    template = {"params": {"transformer": {
        "adapt_pos1d": {
            "0": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
            "2": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
        },
        "adapt_pos2d": {
            "0": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
            "2": {"weight": np.zeros((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
        },
        "pattern": init_val,
    }}}
    sd = {"transformer.modify_pattern.weight": np.ones((5, 4), np.float32)}
    for ap in ("adapt_pos1d", "adapt_pos2d"):
        for i in ("0", "2"):
            sd[f"transformer.{ap}.{i}.weight"] = np.ones((4, 4), np.float32)
            sd[f"transformer.{ap}.{i}.bias"] = np.ones((4,), np.float32)
    out = torch_state_dict_to_params(sd, template, skip_mismatched=True)
    np.testing.assert_array_equal(out["params"]["transformer"]["pattern"], init_val)
    np.testing.assert_array_equal(
        out["params"]["transformer"]["adapt_pos1d"]["0"]["weight"],
        np.ones((4, 4), np.float32),
    )


def test_resume_matches_uninterrupted_run(tmp_path, rng):
    """Full-state resume: train 2+2 steps with a checkpoint/restore in the
    middle and the second half's loss sequence must EXACTLY match an
    uninterrupted 4-step run — i.e. opt_state (Adam moments + schedule
    count) and the step counter survive the round trip (the reference
    restores model+optimizer+lr_scheduler+epoch, main.py:217-238)."""
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64, dropout=0.1,  # dropout keys off state.step
        ),
        # lr_drop at "epoch" 1 with steps_per_epoch=2: the schedule changes
        # mid-run, so a lost schedule position would change losses
        train=cfg.train.replace(lr=1e-3, lr_drop=1),
    )
    model = CountingDetr(cfg.model)
    B, H, W, P = 2, 32, 32, 3
    batches = []
    for i in range(4):
        r = np.random.default_rng(50 + i)
        batches.append({
            "images": jnp.array(r.normal(size=(B, H, W, 3)).astype(np.float32)),
            "pad_mask": jnp.zeros((B, H, W), dtype=bool),
            "points": jnp.array(r.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
            "points_valid": jnp.ones((B, P), dtype=bool),
            "whs": jnp.array(r.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32)),
        })
    params = model.init(
        jax.random.PRNGKey(0), batches[0]["images"], batches[0]["pad_mask"],
        batches[0]["points"], batches[0]["points_valid"],
    )
    params = jax.tree_util.tree_map(np.asarray, params)

    def fresh(ps):
        tx = build_optimizer(cfg.train, ps, steps_per_epoch=2)
        return tx, create_state(jax.tree_util.tree_map(jnp.array, ps), tx)

    # uninterrupted 4-step run
    tx, state = fresh(params)
    step_fn = make_train_step(model, tx, cfg)
    ref_losses = []
    for b in batches:
        state, m = step_fn(state, b)
        ref_losses.append(float(m["loss"]))

    # interrupted: 2 steps, save, REBUILD everything, full restore, 2 steps
    tx, state = fresh(params)
    step_fn = make_train_step(model, tx, cfg)
    for b in batches[:2]:
        state, _ = step_fn(state, b)
    ckpt.save_checkpoint(str(tmp_path), 0, state, {"epoch": 0})

    tx2, state2 = fresh(params)  # fresh moments — must all be overwritten
    step_fn2 = make_train_step(model, tx2, cfg)
    p, o, meta = ckpt.restore_checkpoint(str(tmp_path), 0, state2)
    state2 = state2._replace(params=p, opt_state=o)
    assert meta.get("opt_step") is not None
    state2 = state2._replace(step=jnp.asarray(meta["opt_step"], jnp.int32))
    resumed_losses = []
    for b in batches[2:]:
        state2, m = step_fn2(state2, b)
        resumed_losses.append(float(m["loss"]))
    np.testing.assert_allclose(resumed_losses, ref_losses[2:], rtol=0, atol=0)


def test_retention_policy(tmp_path, rng):
    """A 25-'epoch' run with the reference's retention policy (keep latest +
    every 10 epochs + lr-drop snapshots, main.py:297-311) leaves exactly the
    configured set on disk, with bounded total count."""
    import os

    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64,
        ),
        train=cfg.train.replace(
            lr_drop=20, checkpoint_keep_last=1, checkpoint_keep_every=10,
        ),
    )
    model = CountingDetr(cfg.model)
    B, H, W, P = 1, 32, 32, 2
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    pad = jnp.zeros((B, H, W), dtype=bool)
    pts = jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    pv = jnp.ones((B, P), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, pad, pts, pv)
    tx = build_optimizer(cfg.train, params, 10)
    state = create_state(params, tx)

    for epoch in range(25):
        ckpt.save_checkpoint(str(tmp_path), epoch, state, {"epoch": epoch},
                             cfg=cfg)

    kept = sorted(
        int(n.split("_")[1]) for n in os.listdir(tmp_path)
        if n.startswith("checkpoint_") and not n.endswith(".json")
    )
    # epochs 9, 19 ((e+1)%10==0), 19 again ((e+1)%lr_drop==0), latest 24
    assert kept == [9, 19, 24], kept
    assert ckpt.latest_step(str(tmp_path)) == 24
    # the survivors remain restorable
    st2 = create_state(params, tx)
    rparams, _, meta = ckpt.restore_checkpoint(str(tmp_path), 19, st2)
    assert meta["epoch"] == 19


def test_retention_never_touches_uncommitted(tmp_path):
    """An in-flight async write (directory present, no meta yet) must
    survive GC."""
    import os

    os.makedirs(tmp_path / "checkpoint_3")
    os.makedirs(tmp_path / "checkpoint_4")  # uncommitted: no meta
    with open(tmp_path / "checkpoint_3.meta.json", "w") as f:
        f.write('{"step": 3}')
    with open(tmp_path / "latest.json", "w") as f:
        f.write('{"step": 3}')
    ckpt.gc_checkpoints(str(tmp_path), keep_last=1, keep_every=10)
    assert (tmp_path / "checkpoint_3").exists()
    assert (tmp_path / "checkpoint_4").exists()


def test_strict_import_errors_on_renamed_key(rng):
    """strict=True (what the CLI uses for .pth imports) must fail loudly
    when a reference key goes unconsumed — the silent-mapping-bug guard."""
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=cfg.model.replace(
        enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
        dim_feedforward=64,
    ))
    model = CountingDetr(cfg.model)
    B, H, W, P = 1, 32, 32, 2
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    template = model.init(
        jax.random.PRNGKey(0), images, jnp.zeros((B, H, W), dtype=bool),
        jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
        jnp.ones((B, P), dtype=bool),
    )
    sd = {"transformer.surprise.weight": np.zeros((3, 3), np.float32)}
    with pytest.raises(KeyError, match="unconsumed"):
        ckpt.torch_state_dict_to_params(sd, template, strict=True)
    # thop's profiling counters are allowlisted like the reference
    # (main.py:231) — but the import still fails on the MISSING params,
    # proving the allowlist doesn't mask absence
    sd2 = {"backbone.total_params": np.zeros((), np.float32)}
    with pytest.raises(KeyError, match="missing param"):
        ckpt.torch_state_dict_to_params(sd2, template, strict=True)

"""Distributed-without-a-cluster tests (SURVEY.md section 4 item 4): 8
virtual CPU devices emulate the mesh; the pjit-sharded step must equal the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.core.mesh import make_mesh, shard_batch
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_sharded_step_matches_single_device(rng):
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64,
        )
    )
    model = CountingDetr(cfg.model)
    B, H, W, P = 8, 32, 32, 3
    batch = {
        "images": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "pad_mask": np.zeros((B, H, W), dtype=bool),
        "points": rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32),
        "points_valid": np.ones((B, P), dtype=bool),
        "whs": rng.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=10)
    # train steps donate their state — give each run an independent copy
    host_params = jax.tree_util.tree_map(np.asarray, params)

    # single-device
    state1 = create_state(jax.tree_util.tree_map(jnp.array, host_params), tx)
    step1 = make_train_step(model, tx, cfg)
    state1, m1 = step1(state1, {k: jnp.array(v) for k, v in batch.items()})

    # 8-device data-parallel mesh
    mesh = make_mesh((8,), ("data",))
    state8 = create_state(jax.tree_util.tree_map(jnp.array, host_params), tx)
    step8 = make_train_step(model, tx, cfg)
    with mesh:
        db = shard_batch(batch, mesh)
        state8, m8 = step8(state8, db)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_weighted_reduce_semantics():
    """Pure-numpy unit test of the cross-host metric reduction: real-sample
    weighting, NaN-on-zero-weight-host masking, and f64 accumulation with
    large weights (advisor round-4 finding on core/mesh.py)."""
    from countdetr_tpu.core.mesh import _weighted_reduce

    # weighted mean: (1*3 + 5*1) / 4 = 2.0
    out = _weighted_reduce(np.array([[1.0, 3.0], [5.0, 1.0]], np.float32))
    np.testing.assert_allclose(out, [2.0])

    # NaN on a ZERO-weight host must not poison the mean ...
    out = _weighted_reduce(np.array([[np.nan, 0.0], [7.0, 2.0]], np.float32))
    np.testing.assert_allclose(out, [7.0])
    # ... but a NaN on a host with real samples still propagates
    out = _weighted_reduce(np.array([[np.nan, 1.0], [7.0, 2.0]], np.float32))
    assert np.isnan(out[0])

    # all-zero weights: defined (0.0), not a div-by-zero
    out = _weighted_reduce(np.array([[3.0, 0.0], [7.0, 0.0]], np.float32))
    np.testing.assert_allclose(out, [0.0])

    # f64 accumulation: 64 hosts x weight 1e6, values differing by 1e-3 —
    # an f32 weighted sum (~1e8 magnitude, eps ~8) would lose the signal
    n = 64
    vals = 100.0 + 1e-3 * np.arange(n)
    mat = np.stack([vals, np.full(n, 1e6)], axis=1)
    out = _weighted_reduce(mat)
    np.testing.assert_allclose(out, [vals.mean()], rtol=1e-12)

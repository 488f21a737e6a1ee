"""Seed reproducibility (SURVEY.md section 7 'hardening'): same seed -> same
init, same shuffled batches, same losses; remat does not change results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step

TINY = dict(enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4, dim_feedforward=64)


def _run(seed, rng_data, remat=False):
    cfg = cfglib.stage1_config()
    cfg = cfg.replace(model=cfg.model.replace(**TINY, remat=remat))
    model = CountingDetr(cfg.model)
    B, H, W, P = 2, 32, 32, 3
    batch = {
        "images": jnp.array(rng_data.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "points": jnp.array(rng_data.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32)),
        "points_valid": jnp.ones((B, P), dtype=bool),
        "whs": jnp.array(rng_data.uniform(0.1, 0.3, (B, P, 2)).astype(np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(seed), batch["images"], batch["pad_mask"],
        batch["points"], batch["points_valid"],
    )
    tx = build_optimizer(cfg.train, params, 10)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses


def test_same_seed_same_losses():
    l1 = _run(0, np.random.default_rng(7))
    l2 = _run(0, np.random.default_rng(7))
    np.testing.assert_allclose(l1, l2, rtol=0, atol=0)


def test_different_seed_differs():
    l1 = _run(0, np.random.default_rng(7))
    l2 = _run(1, np.random.default_rng(7))
    assert l1 != l2


def test_remat_matches_no_remat():
    l1 = _run(0, np.random.default_rng(7), remat=False)
    l2 = _run(0, np.random.default_rng(7), remat=True)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_batcher_epoch_shuffle_reproducible(tmp_path_factory):
    from countdetr_tpu.data.batching import Batcher
    from tests.synth import make_fscd147
    from countdetr_tpu.data.fscd147 import FSCD147Exemplars

    root = make_fscd147(str(tmp_path_factory.mktemp("repro")))
    ds = FSCD147Exemplars(root, "train")
    b1 = Batcher(ds, 2, ((96, 128),), max_points=8, shuffle=True, seed=3)
    b2 = Batcher(ds, 2, ((96, 128),), max_points=8, shuffle=True, seed=3)
    n1 = [m["image_name"] for batch in b1 for m in batch["meta"]]
    n2 = [m["image_name"] for batch in b2 for m in batch["meta"]]
    assert n1 == n2
    # second epoch differs (epoch-seeded shuffle, reference samplers.py:18-141)
    n3 = [m["image_name"] for batch in b1 for m in batch["meta"]]
    assert n3 != n1

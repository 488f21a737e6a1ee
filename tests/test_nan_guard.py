"""Amortized NaN guard: a non-finite loss is caught within the check
interval without per-step host syncs (engine.train_one_epoch +
TrainState.bad_steps; the reference exits on the first non-finite loss,
engine.py:64-67)."""

import jax.numpy as jnp
import numpy as np
import pytest

from countdetr_tpu.train import engine
from countdetr_tpu.train.train_step import TrainState


def _batches(n):
    return [
        {"images": np.zeros((1, 4, 4, 3), np.float32), "meta": [], "bucket": (4, 4)}
        for _ in range(n)
    ]


def _fake_step(bad_at):
    def step(state, batch):
        s = int(state.step)
        loss = jnp.float32(np.inf) if s >= bad_at else jnp.float32(1.0)
        bad = state.bad_steps + (~jnp.isfinite(loss)).astype(jnp.int32)
        return (
            TrainState(state.params, state.opt_state, state.step + 1, bad),
            {"loss": loss},
        )

    return step


def _state():
    return TrainState({}, {}, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def test_nan_raises_within_check_interval():
    with pytest.raises(FloatingPointError):
        engine.train_one_epoch(
            _fake_step(3), _state(), _batches(40), mesh=None, epoch=0,
            log_every=100,
        )


def test_nan_on_final_partial_window_still_raises():
    """Epoch shorter than the check interval: the end-of-epoch check fires."""
    with pytest.raises(FloatingPointError):
        engine.train_one_epoch(
            _fake_step(4), _state(), _batches(5), mesh=None, epoch=0,
            log_every=100,
        )


def test_finite_epoch_completes():
    state, stats = engine.train_one_epoch(
        _fake_step(10**9), _state(), _batches(7), mesh=None, epoch=0,
        log_every=100,
    )
    assert int(state.step) == 7
    assert int(state.bad_steps) == 0

"""Space-to-depth stem equivalence: StemConv's s2d path is the SAME linear
map as the direct 7x7/s2 convolution (models/resnet.py::StemConv), to
float32 summation-reorder tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countdetr_tpu.models.resnet import StemConv


@pytest.mark.parametrize("hw", [(32, 48), (64, 64)])
def test_s2d_matches_direct(monkeypatch, hw):
    H, W = hw
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, H, W, 3)), jnp.float32
    )
    m = StemConv()
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("COUNTDETR_S2D_STEM", "1")
    got = m.apply(params, x)
    monkeypatch.setenv("COUNTDETR_S2D_STEM", "0")
    want = m.apply(params, x)
    assert got.shape == want.shape == (2, H // 2, W // 2, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_odd_input_falls_back(monkeypatch):
    monkeypatch.setenv("COUNTDETR_S2D_STEM", "1")
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 33, 47, 3)), jnp.float32
    )
    m = StemConv()
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 17, 24, 64)

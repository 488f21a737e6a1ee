"""Shape/finite-ness tests for the full model, both stages, on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr


def _tiny(cfg):
    return cfg.replace(enc_layers=2, dec_layers=2, hidden_dim=32, nheads=4,
                       dim_feedforward=64)


@pytest.fixture(scope="module")
def stage1_setup():
    cfg = _tiny(cfglib.stage1_config().model)
    model = CountingDetr(cfg)
    B, H, W, P = 2, 64, 96, 3
    rng = np.random.default_rng(0)
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = np.zeros((B, H, W), dtype=bool)
    mask[1, 48:, :] = True  # image 1 is padded at the bottom
    points = jnp.array(rng.uniform(0.1, 0.9, (B, P, 2)).astype(np.float32))
    pvalid = jnp.ones((B, P), dtype=bool)
    params = model.init(
        jax.random.PRNGKey(0), images, jnp.array(mask), points, pvalid
    )
    return model, params, images, jnp.array(mask), points, pvalid


def test_stage1_shapes(stage1_setup):
    model, params, images, mask, points, pvalid = stage1_setup
    out = model.apply(params, images, mask, points, pvalid)
    B, P = points.shape[0], points.shape[1]
    assert out["pred_logits"].shape == (B, P, 2)
    assert out["pred_points"].shape == (B, P, 2)
    assert out["pred_wh"].shape == (B, P, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_stage1_wh_bias_init(stage1_setup):
    """bbox head zero-init + wh bias -2 => pred_wh == sigmoid(-2) at init
    (reference transformer.py:90-95)."""
    model, params, images, mask, points, pvalid = stage1_setup
    out = model.apply(params, images, mask, points, pvalid)
    np.testing.assert_allclose(
        np.asarray(out["pred_wh"]), jax.nn.sigmoid(-2.0), atol=1e-6
    )
    # and pred_points == the reference points at init (delta == 0)
    np.testing.assert_allclose(
        np.asarray(out["pred_points"]), np.asarray(points), atol=1e-4
    )


def test_stage2_shapes():
    cfg = _tiny(cfglib.stage2_config().model).replace(num_query_position=25)
    model = CountingDetr(cfg)
    B, H, W, K = 2, 64, 64, 3
    rng = np.random.default_rng(1)
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.zeros((B, H, W), dtype=bool)
    rects = jnp.array(rng.uniform(0.1, 0.8, (B, K, 4)).astype(np.float32))
    rects = rects.at[..., 2:].set(rects[..., :2] + 0.1)

    params = model.init(jax.random.PRNGKey(0), images, mask, exemplar_boxes=rects)
    out = model.apply(params, images, mask, exemplar_boxes=rects)
    Q = cfg.num_queries
    assert out["pred_logits"].shape == (B, Q, 2)
    assert out["pred_boxes"].shape == (B, Q, 4)
    assert out["pred_vars"].shape == (B, Q, 2)
    assert out["reference_points"].shape == (B, Q, 2)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    # grid prior: reference points form a 5x5 grid
    ref = np.asarray(out["reference_points"][0])
    assert abs(ref[0, 0] - 0.1) < 1e-6 and abs(ref[0, 1] - 0.1) < 1e-6


def test_padding_invariance(stage1_setup):
    """The masked model must produce identical outputs for an image with and
    without extra padding — the core guarantee that bucketed padding does not
    change the math."""
    model, params, images, mask, points, pvalid = stage1_setup
    B, H, W, _ = images.shape

    out = model.apply(params, images, mask, points, pvalid)

    # pad 32 more pixels on the right, mark them in the mask
    images2 = jnp.pad(images, ((0, 0), (0, 0), (0, 32), (0, 0)))
    mask2 = jnp.pad(mask, ((0, 0), (0, 0), (0, 32)), constant_values=True)
    out2 = model.apply(params, images2, mask2, points, pvalid)

    np.testing.assert_allclose(
        np.asarray(out["pred_wh"]), np.asarray(out2["pred_wh"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(out2["pred_logits"]), atol=2e-5
    )


def test_padding_invariance_uint8(stage1_setup):
    """Bucket-size invariance must hold on the raw-uint8 pipe too: uint8 pad
    pixels are 0, which device-side normalize maps to -mean/std, so the model
    re-zeros pads after normalizing (anchor_detr.py) — otherwise conv1's 7x7
    window leaks pad values into border features."""
    model, params, _, mask, points, pvalid = stage1_setup
    B, H, W = mask.shape
    rng = np.random.default_rng(7)
    raw = jnp.array(rng.integers(0, 256, size=(B, H, W, 3), dtype=np.uint8))

    out = model.apply(params, raw, mask, points, pvalid)
    raw2 = jnp.pad(raw, ((0, 0), (0, 0), (0, 32), (0, 0)))
    mask2 = jnp.pad(mask, ((0, 0), (0, 0), (0, 32)), constant_values=True)
    out2 = model.apply(params, raw2, mask2, points, pvalid)

    np.testing.assert_allclose(
        np.asarray(out["pred_wh"]), np.asarray(out2["pred_wh"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(out2["pred_logits"]), atol=2e-5
    )


def test_learned_prior_with_patterns(rng):
    """'learned' spatial prior + num_query_pattern 3 (the reference's
    AnchorDETR defaults, main.py:72-76): L = positions x patterns queries,
    learned anchors are trainable params."""
    cfg = _tiny(cfglib.stage1_config().model).replace(
        spatial_prior="learned", num_query_position=7, num_query_pattern=3,
    )
    model = CountingDetr(cfg)
    B, H, W = 1, 64, 64
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.zeros((B, H, W), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, mask)
    out = model.apply(params, images, mask)
    L = 7 * 3
    assert out["pred_logits"].shape == (B, L, 2)
    assert out["pred_points"].shape == (B, L, 2)
    assert np.isfinite(np.asarray(out["pred_wh"])).all()
    # the learned anchor positions are a parameter
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [jax.tree_util.keystr(p) for p, _ in flat]
    assert any("position" in n for n in names)


def test_grid_prior_stage1(rng):
    """grid prior at stage 1 (reference var_wh uses grid at stage 2; the
    flag is stage-independent)."""
    cfg = _tiny(cfglib.stage1_config().model).replace(
        spatial_prior="grid", num_query_position=9, num_query_pattern=1,
    )
    model = CountingDetr(cfg)
    B, H, W = 1, 64, 64
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.zeros((B, H, W), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, mask)
    out = model.apply(params, images, mask)
    assert out["pred_logits"].shape == (B, 9, 2)  # 3x3 grid


def test_uint8_input_matches_host_normalized(stage1_setup):
    """Raw-uint8 images (device-side ImageNet normalize,
    models/anchor_detr.py::normalize_uint8) must produce the same outputs
    as the host-normalized float32 pipeline — same math, different place."""
    from countdetr_tpu.data.fscd147 import (
        IMAGENET_MEAN, IMAGENET_STD, load_image,
    )
    from countdetr_tpu.models.anchor_detr import _IMNET_MEAN, _IMNET_STD

    # the model-layer constants must never drift from the data layer's
    np.testing.assert_array_equal(IMAGENET_MEAN, np.float32(_IMNET_MEAN))
    np.testing.assert_array_equal(IMAGENET_STD, np.float32(_IMNET_STD))

    model, params, _, mask, points, pvalid = stage1_setup
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(2, 64, 96, 3), dtype=np.uint8)
    host = ((raw.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    # the host pipe normalizes THEN pads (pad_to_bucket) — pad pixels are
    # exactly 0.0; the uint8 device path re-zeros pads to match
    host = np.where(np.asarray(mask)[..., None], 0.0, host)
    out_u8 = model.apply(params, jnp.array(raw), mask, points, pvalid)
    out_f32 = model.apply(params, jnp.array(host), mask, points, pvalid)
    for k in out_f32:
        np.testing.assert_allclose(
            np.asarray(out_u8[k]), np.asarray(out_f32[k]),
            rtol=2e-5, atol=2e-5,
        )

"""Space-to-depth packed input pipe: host packing (data/batching.py) +
model consumption (models/anchor_detr.py / models/resnet.py::StemConv).

The packed pipe must be numerically the same model: same math, different
tensor layout. The only tolerated difference is float summation reorder in
the stem conv (7x7/s2 direct vs the exact 4x4/s1 rewrite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countdetr_tpu import config as cfglib
from countdetr_tpu.data.batching import (
    Batcher,
    pack_space_to_depth,
    unpack_space_to_depth,
)
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.models.anchor_detr import pack_mask_s2d
from countdetr_tpu.models.resnet import StemConv


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    p = pack_space_to_depth(x)
    assert p.shape == (2, 16, 24, 12)
    np.testing.assert_array_equal(unpack_space_to_depth(p), x)
    # channel order: out[..., (a*2+b)*3 + c] == in[..., 2i+a, 2j+b, c]
    assert p[0, 3, 5, (1 * 2 + 0) * 3 + 2] == x[0, 2 * 3 + 1, 2 * 5 + 0, 2]


def test_pack_mask_matches_image_packing():
    """pack_mask_s2d must use the same (a, b, c) channel order as
    pack_space_to_depth: packing the mask as a fake 3-channel image and
    packing it with pack_mask_s2d must agree elementwise."""
    rng = np.random.default_rng(1)
    m = rng.random((2, 16, 24)) < 0.3
    as_img = np.repeat(m[..., None], 3, axis=-1)
    want = pack_space_to_depth(as_img.astype(np.uint8)).astype(bool)
    got = np.asarray(pack_mask_s2d(jnp.asarray(m)))
    np.testing.assert_array_equal(got, want)


def test_stem_packed_input_matches_direct():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    m = StemConv()
    params = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(params, x)  # direct 7x7/s2
    packed = jnp.asarray(pack_space_to_depth(np.asarray(x)))
    got = m.apply(params, packed)
    assert got.shape == want.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("content", [(64, 96), (49, 77)])  # odd content too
def test_model_packed_equals_unpacked_uint8(content):
    """Full model on the raw-uint8 pipe: packed input reproduces the
    full-resolution input, including odd content sizes inside the even
    bucket (a packed 2x2 cell that is half padding)."""
    cfg = cfglib.stage1_config().model.replace(
        enc_layers=2, dec_layers=2, hidden_dim=32, nheads=4,
        dim_feedforward=64,
    )
    model = CountingDetr(cfg)
    B, H, W, P = 2, 64, 96, 3
    ch, cw = content
    rng = np.random.default_rng(3)
    raw = np.zeros((B, H, W, 3), np.uint8)
    raw[:, :ch, :cw] = rng.integers(0, 256, (B, ch, cw, 3), dtype=np.uint8)
    mask = np.ones((B, H, W), dtype=bool)
    mask[:, :ch, :cw] = False
    points = jnp.asarray(rng.uniform(0.1, 0.9, (B, P, 2)), jnp.float32)
    pvalid = jnp.ones((B, P), dtype=bool)
    mask = jnp.asarray(mask)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(raw), mask,
                        points, pvalid)
    want = model.apply(params, jnp.asarray(raw), mask, points, pvalid)
    packed = jnp.asarray(pack_space_to_depth(raw))
    got = model.apply(params, packed, mask, points, pvalid)
    for k in ("pred_logits", "pred_points", "pred_wh"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_batcher_pack_s2d():
    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            img = rng.integers(0, 256, (30 + i, 40, 3), dtype=np.uint8)
            return {"image": img, "points": rng.uniform(0.1, 0.9, (4, 2))}

    kw = dict(max_points=8)
    plain = list(Batcher(DS(), 2, [(32, 48)], **kw))
    packed = list(Batcher(DS(), 2, [(32, 48)], pack_s2d=True, **kw))
    assert len(plain) == len(packed)
    for bp, bq in zip(plain, packed):
        assert bq["images"].shape == (2, 16, 24, 12)
        np.testing.assert_array_equal(
            unpack_space_to_depth(bq["images"]), bp["images"]
        )
        np.testing.assert_array_equal(bq["pad_mask"], bp["pad_mask"])

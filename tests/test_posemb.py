import math

import jax.numpy as jnp
import numpy as np

from countdetr_tpu.ops import posemb


def _torch_posemb1d(pos, num_pos_feats=256, temperature=10000):
    """Independent torch oracle implementing the published AnchorDETR formula
    (reference transformer.py:485-492)."""
    import torch

    pos = torch.as_tensor(pos, dtype=torch.float32) * (2 * math.pi)
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = pos[..., None] / dim_t
    out = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1).flatten(-2)
    return out.numpy()


def test_posemb1d_matches_torch_oracle(rng):
    pos = rng.uniform(0, 1, (4, 13)).astype(np.float32)
    got = np.asarray(posemb.pos2posemb1d(jnp.array(pos)))
    want = _torch_posemb1d(pos)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_posemb2d_order_is_y_then_x(rng):
    pos = rng.uniform(0, 1, (7, 2)).astype(np.float32)
    out = np.asarray(posemb.pos2posemb2d(jnp.array(pos)))
    ex = _torch_posemb1d(pos[:, 0], 128)
    ey = _torch_posemb1d(pos[:, 1], 128)
    np.testing.assert_allclose(out[:, :128], ey, atol=1e-5)
    np.testing.assert_allclose(out[:, 128:], ex, atol=1e-5)


def test_mask2pos_ignores_padding():
    # valid 4x6 region inside an 8x8 padded canvas
    mask = np.ones((1, 8, 8), dtype=bool)
    mask[0, :4, :6] = False
    pos_col, pos_row = posemb.mask2pos(jnp.array(mask))
    # y positions: (cumsum-0.5)/4 over the 4 valid rows
    want_y = (np.arange(1, 5) - 0.5) / 4
    np.testing.assert_allclose(np.asarray(pos_col)[0, :4], want_y, atol=1e-6)
    want_x = (np.arange(1, 7) - 0.5) / 6
    np.testing.assert_allclose(np.asarray(pos_row)[0, :6], want_x, atol=1e-6)

    # no padding at all gives the same prefix
    mask2 = np.zeros((1, 4, 6), dtype=bool)
    pc2, pr2 = posemb.mask2pos(jnp.array(mask2))
    np.testing.assert_allclose(np.asarray(pc2)[0], want_y, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pr2)[0], want_x, atol=1e-6)


def test_grid_reference_points_is_x_major():
    pts = np.asarray(posemb.grid_reference_points(9))
    assert pts.shape == (9, 2)
    # torch meshgrid 'ij': x varies slowest in the flattened output
    np.testing.assert_allclose(pts[0], [1 / 6, 1 / 6], atol=1e-6)
    np.testing.assert_allclose(pts[1], [1 / 6, 3 / 6], atol=1e-6)
    np.testing.assert_allclose(pts[3], [3 / 6, 1 / 6], atol=1e-6)

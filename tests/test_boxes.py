import jax.numpy as jnp
import numpy as np

from countdetr_tpu.ops import boxes as box_ops


def _np_giou(b1, b2):
    """Hand-rolled numpy pairwise GIoU oracle."""
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    area = wh2[..., 0] * wh2[..., 1]
    return iou - (area - union) / area


def random_boxes(rng, n):
    cx = rng.uniform(0.2, 0.8, n)
    cy = rng.uniform(0.2, 0.8, n)
    w = rng.uniform(0.05, 0.3, n)
    h = rng.uniform(0.05, 0.3, n)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_cxcywh_roundtrip(rng):
    b = random_boxes(rng, 17)
    out = box_ops.box_xyxy_to_cxcywh(box_ops.box_cxcywh_to_xyxy(jnp.array(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_giou_pairwise_matches_numpy(rng):
    b1 = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 12)))
    b2 = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 9)))
    got = np.asarray(box_ops.generalized_box_iou_pairwise(b1, b2))
    want = _np_giou(np.asarray(b1), np.asarray(b2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_giou_aligned_is_pairwise_diag(rng):
    b1 = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 11)))
    b2 = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 11)))
    full = np.asarray(box_ops.generalized_box_iou_pairwise(b1, b2))
    diag = np.asarray(box_ops.generalized_box_iou_aligned(b1, b2))
    np.testing.assert_allclose(diag, np.diag(full), atol=1e-6)


def test_identical_boxes_giou_is_one(rng):
    b = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 5)))
    np.testing.assert_allclose(
        np.asarray(box_ops.generalized_box_iou_aligned(b, b)), 1.0, atol=1e-5
    )


def test_inverse_sigmoid_roundtrip():
    x = jnp.array([0.01, 0.25, 0.5, 0.75, 0.99])
    y = jax_sigmoid(box_ops.inverse_sigmoid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)

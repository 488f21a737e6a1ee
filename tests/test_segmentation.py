import jax
import jax.numpy as jnp
import numpy as np

from countdetr_tpu.models.segmentation import (
    MaskHeadSmallConv, MHAttentionMap, dice_loss, mask_losses,
    postprocess_masks,
)


def test_attention_map_shapes(rng):
    m = MHAttentionMap(hidden_dim=32, num_heads=4)
    q = jnp.array(rng.normal(size=(2, 5, 32)).astype(np.float32))
    f = jnp.array(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), q, f)
    out = m.apply(params, q, f)
    assert out.shape == (2, 5, 4, 8, 8)
    np.testing.assert_allclose(
        np.asarray(out.reshape(2, 5, 4, -1).sum(-1)), 1.0, atol=1e-5
    )


def test_mask_head(rng):
    # reference-shaped: three fpn skips coarse-to-fine (C4, C3, C2); the
    # trunk resizes to each skip's spatial size before the next conv
    head = MaskHeadSmallConv(context_dim=32)
    x = jnp.array(rng.normal(size=(4, 8, 8, 36)).astype(np.float32))
    fpn = [
        jnp.array(rng.normal(size=(2, 8, 8, 48)).astype(np.float32)),
        jnp.array(rng.normal(size=(2, 16, 16, 24)).astype(np.float32)),
        jnp.array(rng.normal(size=(2, 32, 32, 12)).astype(np.float32)),
    ]
    params = head.init(jax.random.PRNGKey(0), x, fpn)
    out = head.apply(params, x, fpn)
    assert out.shape == (4, 32, 32)


def test_dice_loss_perfect():
    t = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    logits = jnp.array([[20.0, 20.0, -20.0, -20.0]])
    assert float(dice_loss(logits, t, 1)) < 1e-3
    worst = float(dice_loss(-logits, t, 1))
    assert worst > 0.5


def test_mask_losses_and_postprocess(rng):
    pm = jnp.array(rng.normal(size=(3, 8, 8)).astype(np.float32))
    tm = (rng.uniform(size=(3, 8, 8)) > 0.5).astype(np.float32)
    valid = jnp.array([True, True, False])
    out = mask_losses(pm, jnp.array(tm), valid, 2.0)
    assert np.isfinite(float(out["loss_mask"]))
    assert np.isfinite(float(out["loss_dice"]))
    masks = postprocess_masks(pm, (16, 16))
    assert masks.shape == (3, 16, 16) and masks.dtype == bool


def test_counting_detr_masks_integration(rng):
    """--masks wires a DETRsegm-equivalent branch into CountingDetr: the
    model emits pred_masks (B, L, 2h, 2w) and mask_losses computes on them
    (reference segmentation.py:19-60; dead code in the reference's scripts
    but a callable capability here)."""
    import jax

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr
    from countdetr_tpu.models.segmentation import mask_losses

    cfg = cfglib.stage1_config().model.replace(
        enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
        dim_feedforward=64, masks=True,
    )
    model = CountingDetr(cfg)
    B, H, W, P = 1, 64, 96, 3
    images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, H, W), dtype=bool)
    points = jnp.array(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    pvalid = jnp.ones((B, P), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, points, pvalid)
    out = model.apply(params, images, pad_mask, points, pvalid)
    # masks end at the C2 (stride-4) resolution after the three fpn hops
    assert out["pred_masks"].shape == (B, P, 16, 24), out["pred_masks"].shape
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

    masks = out["pred_masks"].reshape(B * P, 16, 24)
    tgt = jnp.array(rng.integers(0, 2, (B * P, 16, 24)).astype(np.float32))
    losses = mask_losses(masks, tgt, jnp.ones((B * P,), bool), float(B * P))
    assert np.isfinite(float(losses["loss_mask"]))
    assert np.isfinite(float(losses["loss_dice"]))

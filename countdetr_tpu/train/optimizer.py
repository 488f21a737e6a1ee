"""Optimizer with the reference's parameter groups and schedule.

Reference (1st-stage main.py:172-204):
  * AdamW (or SGD with --sgd), lr 1e-4, weight_decay 1e-4
  * backbone params at lr_backbone 1e-5
  * StepLR: lr *= 0.1 at epoch lr_drop (default 20)
  * clip_grad_norm 0.1 over all trainable params (engine.py:71-72)

Trainability mirrors reference backbone.py:66-68 + FrozenBatchNorm: the stem
and layer1 are frozen, all BN buffers are frozen, backbone layer2-4 convs
train at lr_backbone, everything else at lr.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from countdetr_tpu.config import TrainConfig


def _label(path) -> str:
    """'frozen' | 'backbone' | 'main' from a flattened param path."""
    keys = ["/".join(str(getattr(p, "key", p)) for p in path)][0]
    parts = keys.split("/")
    if "backbone" in parts:
        leaf = parts[-1]
        mod = parts[-2] if len(parts) >= 2 else ""
        # the module directly under 'backbone' tells stem/layer apart:
        # backbone/conv1 is the frozen stem; backbone/layerN_i/conv1 is a
        # bottleneck's 1x1 reduce conv, trainable at lr_backbone (reference
        # backbone.py:66-68 freezes only the stem + layer1)
        bi = parts.index("backbone")
        top = parts[bi + 1] if len(parts) > bi + 1 else ""
        if leaf in ("running_mean", "running_var"):
            return "frozen"
        if mod.startswith("bn") or mod == "downsample_bn":
            # FrozenBatchNorm weight/bias are buffers in the reference
            # (util/misc.py FrozenBatchNorm2d) — never trained anywhere
            return "frozen"
        if top == "conv1" or top.startswith("layer1_"):
            return "frozen"
        return "backbone"
    return "main"


def make_schedule(base_lr: float, lr_drop_epoch: int, steps_per_epoch: int,
                  drop_epochs=None):
    """StepLR parity: multiply by 0.1 every lr_drop epochs. With
    drop_epochs (a list), MultiStepLR parity instead: one 0.1 factor per
    listed epoch reached (reference main.py --lr_drop_epochs)."""
    if drop_epochs:
        import jax.numpy as jnp

        boundaries = jnp.asarray(sorted(drop_epochs), jnp.int32)

        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            n_drops = (boundaries <= epoch).sum()
            return base_lr * jax.numpy.power(0.1, n_drops)

        return sched

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jax.numpy.power(0.1, epoch // lr_drop_epoch)

    return sched


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ parity: scale by
    max_norm / (global_norm + 1e-6) when clipping (torch adds 1e-6 to the
    denominator; optax.clip_by_global_norm does not). The difference is
    ~1e-6 relative per step — invisible to training but a bit-faithfulness
    gap for --exact_replay, so we mirror torch exactly."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = jax.numpy.minimum(1.0, max_norm / (g_norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: TrainConfig, params, steps_per_epoch: int
) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _label(p), params)

    main_sched = make_schedule(
        cfg.lr, cfg.lr_drop, steps_per_epoch, drop_epochs=cfg.lr_drop_epochs
    )
    bb_sched = make_schedule(
        cfg.lr_backbone, cfg.lr_drop, steps_per_epoch,
        drop_epochs=cfg.lr_drop_epochs,
    )

    def adamw(sched):
        if cfg.sgd:
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(sched, momentum=0.9),
            )
        return optax.adamw(
            sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay
        )

    tx = optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "backbone": adamw(bb_sched),
            "main": adamw(main_sched),
        },
        labels,
    )
    # zero frozen grads BEFORE the global-norm clip so the clip norm only
    # sees trainable params (torch: frozen params have no grads at all)
    zero_frozen = optax.masked(
        optax.set_to_zero(),
        jax.tree_util.tree_map_with_path(
            lambda p, _: _label(p) == "frozen", params
        ),
    )
    return optax.chain(
        zero_frozen, clip_by_global_norm_torch(cfg.clip_max_norm), tx
    )

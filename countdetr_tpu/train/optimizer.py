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
        if leaf in ("running_mean", "running_var"):
            return "frozen"
        if mod.startswith("bn") or mod == "downsample_bn":
            return "frozen"
        if mod == "conv1" or any(p.startswith("layer1_") for p in parts):
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
    return optax.chain(zero_frozen, optax.clip_by_global_norm(cfg.clip_max_norm), tx)

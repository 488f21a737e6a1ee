"""jit/pjit train and eval steps for both stages.

Each step is ONE XLA program: forward, (stage 2) on-device auction matching,
loss, backward, clipped AdamW update. No host round-trips — the reference's
per-step scipy matcher and .item() logging (reference engine.py:63,
matcher.py:243-246) are the two hot-loop host syncs this design removes.

Data parallelism: the caller shards batches over the mesh 'data' axis
(core/mesh.py) and jit partitions the step; gradient reduction and the
global num_boxes normalization (reference's all_reduce, anchor_detr.py:321-325)
become XLA collectives automatically because losses are computed over the
globally-sharded batch.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from countdetr_tpu.config import Config
from countdetr_tpu.ops import losses as loss_ops
from countdetr_tpu.ops import matching
from countdetr_tpu.ops.losses import MatchedTargets


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # cumulative count of steps whose loss was non-finite, accumulated ON
    # DEVICE so the NaN guard needs a host fetch only every K steps (the
    # reference .item()s the loss every step, engine.py:63-67; a per-step
    # device->host sync at multi-host scale stalls the pipeline)
    bad_steps: jnp.ndarray


def create_state(params, tx) -> TrainState:
    return TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )


def stage1_loss(model, params, batch, cfg: Config, rngs=None):
    out = model.apply(
        params,
        batch["images"],
        batch["pad_mask"],
        batch["points"],
        batch["points_valid"],
        train=rngs is not None,
        rngs=rngs,
    )
    parts = loss_ops.stage1_criterion(
        out["pred_wh"], batch["points"], batch["whs"], batch["points_valid"]
    )
    t = cfg.train
    total = t.wh_loss_coef * parts["loss_wh"] + t.stage1_giou_coef * parts["loss_giou"]
    parts["loss"] = total
    return total, parts


def stage2_loss(model, params, batch, cfg: Config, rngs=None, mesh=None,
                data_axis="data"):
    # 'sampled' prior: density-drawn points become the anchors (reference
    # engine.py:26-33 passes ret['sampled_points'] into the model)
    out = model.apply(
        params,
        batch["images"],
        batch["pad_mask"],
        points=batch.get("sampled_points"),
        points_valid=batch.get("sampled_points_valid"),
        exemplar_boxes=batch["exemplar_boxes"],
        train=rngs is not None,
        rngs=rngs,
    )
    t = cfg.train

    def match(logits, boxes):
        cost = loss_ops.stage2_cost_matrix(
            jax.lax.stop_gradient(logits),
            jax.lax.stop_gradient(boxes),
            batch["boxes"],
            batch["labels"],
            cost_class=t.set_cost_class,
            cost_bbox=t.set_cost_bbox,
            cost_giou=t.set_cost_giou,
        )
        if cfg.train.exact_match:
            return matching.exact_batched_match(cost, batch["boxes_valid"])
        # mesh keeps the fused Pallas auction on multi-device programs
        # (shard_mapped over the data axis; see ops/matching.batched_match)
        return matching.batched_match(
            cost, batch["boxes_valid"], mesh=mesh, data_axis=data_axis
        )

    tgt2query, matched = match(out["pred_logits"], out["pred_boxes"])
    parts = loss_ops.stage2_criterion(
        out["pred_logits"],
        out["pred_boxes"],
        out["pred_vars"],
        batch["boxes"],
        batch["labels"],
        MatchedTargets(tgt2query, batch["boxes_valid"], matched),
        focal_alpha=t.focal_alpha,
        batch_valid=batch.get("batch_valid"),
    )
    total = (
        t.cls_loss_coef * parts["loss_ce"]
        + t.bbox_loss_coef * parts["loss_bbox"]
        + t.giou_loss_coef * parts["loss_giou"]
        + t.variance_loss_coef * parts["loss_variance"]
    )

    # auxiliary per-decoder-layer losses with their own matching (reference
    # SetCriterion, 2nd-stage anchor_detr.py:334-347; no variance term on aux
    # outputs since only the last layer has the var head wired to the loss)
    if cfg.model.aux_loss and "aux_outputs" in out:
        for i, aux in enumerate(out["aux_outputs"]):
            tq_i, matched_i = match(aux["pred_logits"], aux["pred_boxes"])
            dummy_vars = jnp.ones_like(out["pred_vars"])
            p_i = loss_ops.stage2_criterion(
                aux["pred_logits"],
                aux["pred_boxes"],
                dummy_vars,
                batch["boxes"],
                batch["labels"],
                MatchedTargets(tq_i, batch["boxes_valid"], matched_i),
                focal_alpha=t.focal_alpha,
                batch_valid=batch.get("batch_valid"),
            )
            total = total + (
                t.cls_loss_coef * p_i["loss_ce"]
                + t.bbox_loss_coef * p_i["loss_bbox"]
                + t.giou_loss_coef * p_i["loss_giou"]
            )
            parts[f"loss_ce_{i}"] = p_i["loss_ce"]
            parts[f"loss_bbox_{i}"] = p_i["loss_bbox"]
            parts[f"loss_giou_{i}"] = p_i["loss_giou"]

    parts["loss"] = total
    return total, parts


def _prepare_stage2_batch(batch: Dict) -> Dict:
    if "labels" not in batch:
        batch = dict(batch)
        batch["labels"] = jnp.zeros(batch["boxes"].shape[:2], dtype=jnp.int32)
    return batch


def _stage2_loss_with_mesh(cfg: Config, mesh):
    """stage2_loss with the matcher's mesh routing bound in (the data axis
    is the first mesh axis by the framework's layout convention)."""
    if mesh is None:
        return stage2_loss
    data_axis = mesh.axis_names[0]
    return functools.partial(stage2_loss, mesh=mesh, data_axis=data_axis)


def make_train_step(model, tx, cfg: Config, mesh=None):
    loss_fn = (
        stage1_loss if cfg.model.stage == 1
        else _stage2_loss_with_mesh(cfg, mesh)
    )
    # dropout only materializes an rng stream when the rate is nonzero —
    # the reference's published runs all use --dropout 0.0
    use_dropout = cfg.model.dropout > 0.0
    base_key = jax.random.PRNGKey(cfg.train.seed ^ 0x5EED)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if cfg.model.stage == 2:
            batch = _prepare_stage2_batch(batch)
        rngs = (
            {"dropout": jax.random.fold_in(base_key, state.step)}
            if use_dropout else None
        )

        (_, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, cfg, rngs), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        bad = state.bad_steps + (
            ~jnp.isfinite(metrics["loss"])
        ).astype(jnp.int32)
        return TrainState(params, opt_state, state.step + 1, bad), metrics

    return train_step


def make_eval_step(model, cfg: Config, mesh=None):
    loss_fn = (
        stage1_loss if cfg.model.stage == 1
        else _stage2_loss_with_mesh(cfg, mesh)
    )

    @jax.jit
    def eval_step(params, batch) -> Dict:
        if cfg.model.stage == 2:
            batch = _prepare_stage2_batch(batch)
        _, metrics = loss_fn(model, params, batch, cfg)
        return metrics

    return eval_step


def make_forward(model, cfg: Config):
    """jitted inference forward (stage-dependent signature)."""

    if cfg.model.stage == 1:

        @jax.jit
        def forward(params, images, pad_mask, points, points_valid):
            return model.apply(params, images, pad_mask, points, points_valid)

    elif cfg.model.spatial_prior == "sampled":

        @jax.jit
        def forward(params, images, pad_mask, exemplar_boxes, points,
                    points_valid):
            return model.apply(
                params, images, pad_mask, points=points,
                points_valid=points_valid, exemplar_boxes=exemplar_boxes,
            )

    else:

        @jax.jit
        def forward(params, images, pad_mask, exemplar_boxes):
            return model.apply(
                params, images, pad_mask, exemplar_boxes=exemplar_boxes
            )

    return forward

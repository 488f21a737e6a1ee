"""Capture a device-side profile of the stage-2 eval forward (bench.py
geometry) and print a per-op-category time breakdown.

This replaces A/B-subtraction guesses (VERDICT r3 weak #3): jax.profiler
writes an XSpace protobuf; we parse the TPU op-level trace lines directly
and aggregate device time by HLO category (convolution / fusion kinds /
copy / etc.) and by top individual ops.

Usage:  python scripts/profile_eval.py [--iters N] [--batch B]
Output: a sorted table of device-time share per op category + top-20 ops,
        written to stdout and /tmp/profile_eval_summary.json.
"""

import argparse
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def capture(trace_dir: str, batch: int, iters: int, dtype: str):
    import jax
    import jax.numpy as jnp

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr

    cfg = cfglib.stage2_config().model.replace(compute_dtype=dtype)
    model = CountingDetr(cfg)
    B, H, W = batch, 592, 592
    rng = np.random.default_rng(0)
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
            return img + (0.0 * out["pred_logits"][0, 0, 0]).astype(img.dtype)

        img = jax.lax.fori_loop(0, iters, body, images)
        out = model.apply(params, img, pad_mask, exemplar_boxes=rects)
        return out["pred_logits"][0, 0, 0]

    # compile + warmup outside the trace
    float(run_k(params, images, pad_mask, rects))
    jax.profiler.start_trace(trace_dir)
    float(run_k(params, images, pad_mask, rects))
    jax.profiler.stop_trace()


def parse(trace_dir: str):
    """Aggregate device time per op from the xplane protobuf."""
    from xprof.convert import _pywrap_profiler_plugin as pp  # noqa: F401

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)

    # third_party xplane proto is bundled with xprof / tensorboard plugin
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = {}
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # op-level lines: "XLA Ops" / "XLA Modules" etc.; we want ops
            if "op" not in lname or "module" in lname:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e12
                cat = None
                for st in ev.stats:
                    sname = stats_meta.get(st.metadata_id, "")
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value or None
                rec = per_op.setdefault(name, [0.0, 0, cat])
                rec[0] += dur
                rec[1] += 1
                if cat and not rec[2]:
                    rec[2] = cat
                total += dur
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trace_dir", default="/tmp/profile_eval")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        capture(args.trace_dir, args.batch, args.iters, args.dtype)

    per_op, total = parse(args.trace_dir)
    by_cat = {}
    for name, (dur, cnt, cat) in per_op.items():
        c = cat or "uncategorized"
        by_cat[c] = by_cat.get(c, 0.0) + dur

    print(f"\ntotal device op time: {total * 1e3:.2f} ms")
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

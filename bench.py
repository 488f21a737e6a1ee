"""Throughput benchmark: images/sec/chip for the stage-2 detector at the
600px eval geometry (592x592 -> 37x37 DC5 features; SURVEY.md section 3.5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: the forward is iterated inside a single jitted
lax.fori_loop with a data dependency between iterations, so one dispatch +
one host fetch brackets K real executions. (On the axon tunnel,
block_until_ready alone does not reliably await remote completion, so
naive dispatch-loop timing overreports absurdly.)

Baseline note: the reference publishes no throughput numbers
(BASELINE.md), so vs_baseline is computed against 19 images/sec — the
AnchorDETR paper's published DC5 inference speed on a V100 (arXiv
2109.07107, Table 1: AnchorDETR-DC5 19 FPS), the same architecture family
and resolution class as this model. The BASELINE.json target is >= 5x.

Env knobs: BENCH_BATCH (default 8), BENCH_ITERS (default 20),
BENCH_DTYPE (float32 | bfloat16, default bfloat16),
BENCH_PALLAS (1 | 0, default 0 — measured on v5e at this geometry the
XLA einsum path is faster than the fused kernel: 495.6 vs 315.8 img/s/chip;
the kernel wins only when the (B,n,L,H,d) einsum intermediate would spill,
i.e. much larger images).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REFERENCE_GPU_IMG_PER_S = 19.0


def main():
    import jax
    import jax.numpy as jnp

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    cfg = cfglib.stage2_config().model.replace(
        compute_dtype=dtype, use_pallas_rcda=use_pallas
    )
    model = CountingDetr(cfg)

    B, H, W = int(os.environ.get("BENCH_BATCH", "32")), 592, 592
    iters = int(os.environ.get("BENCH_ITERS", "10"))
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
            # data dependency forces each iteration to fully execute
            return img + (0.0 * out["pred_logits"][0, 0, 0]).astype(img.dtype)

        img = jax.lax.fori_loop(0, iters, body, images)
        out = model.apply(params, img, pad_mask, exemplar_boxes=rects)
        return out["pred_logits"][0, 0, 0]

    # compile + warmup
    float(run_k(params, images, pad_mask, rects))
    t0 = time.perf_counter()
    float(run_k(params, images, pad_mask, rects))
    dt = time.perf_counter() - t0

    n_chips = max(jax.device_count(), 1)
    img_per_s_per_chip = (B * (iters + 1)) / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "images/sec/chip at 600px eval (stage-2 forward)",
                "value": round(img_per_s_per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(
                    img_per_s_per_chip / REFERENCE_GPU_IMG_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

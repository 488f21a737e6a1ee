"""Throughput benchmark: images/sec/chip for the stage-2 detector at the
600px eval geometry (592x592 -> 37x37 DC5 features; SURVEY.md section 3.5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md), so vs_baseline is computed against 19 images/sec — the
AnchorDETR paper's published DC5 inference speed on a V100 (arXiv
2109.07107, Table 1: AnchorDETR-DC5 19 FPS), the same architecture family
and resolution class as this model. The BASELINE.json target is >= 5x.
"""

import json
import os
import time

import numpy as np

REFERENCE_GPU_IMG_PER_S = 19.0


def main():
    import jax

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr

    cfg = cfglib.stage2_config()
    # production dtype policy: bf16 matmul inputs on the MXU (DEFAULT
    # precision); parity tests use fp32 (tests/conftest.py)
    model = CountingDetr(cfg.model)

    B, H, W = int(os.environ.get("BENCH_BATCH", "8")), 592, 592
    rng = np.random.default_rng(0)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    pad_mask = np.zeros((B, H, W), dtype=bool)
    rects = np.tile(
        np.array(
            [[0.1, 0.1, 0.3, 0.3], [0.4, 0.4, 0.6, 0.6], [0.2, 0.5, 0.4, 0.7]],
            np.float32,
        )[None],
        (B, 1, 1),
    )
    params = model.init(
        jax.random.PRNGKey(0), images, pad_mask, exemplar_boxes=rects
    )

    @jax.jit
    def forward(params, images, pad_mask, rects):
        return model.apply(params, images, pad_mask, exemplar_boxes=rects)

    # warmup / compile
    out = forward(params, images, pad_mask, rects)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, images, pad_mask, rects)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_chips = max(jax.device_count(), 1)
    img_per_s_per_chip = (B * iters) / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "images/sec/chip at 600px eval (stage-2 forward)",
                "value": round(img_per_s_per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s_per_chip / REFERENCE_GPU_IMG_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

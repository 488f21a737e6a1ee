from countdetr_tpu.ops import boxes, losses, matching, posemb, rcda  # noqa: F401

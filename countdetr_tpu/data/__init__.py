from countdetr_tpu.data.batching import Batcher, pad_to_bucket, pick_bucket  # noqa: F401
from countdetr_tpu.data.coco_io import CocoJson  # noqa: F401

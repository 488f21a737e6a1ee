from countdetr_tpu.models.anchor_detr import CountingDetr  # noqa: F401
from countdetr_tpu.models.resnet import ResNetBackbone  # noqa: F401
from countdetr_tpu.models.transformer import Transformer  # noqa: F401

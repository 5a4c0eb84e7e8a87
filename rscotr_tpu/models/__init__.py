from rscotr_tpu.models import backbones, heads, layers, necks  # noqa: F401
from rscotr_tpu.models.build import build_model
from rscotr_tpu.models.mtl import MTL, SUPPORTED_TASKS

__all__ = ["build_model", "MTL", "SUPPORTED_TASKS"]

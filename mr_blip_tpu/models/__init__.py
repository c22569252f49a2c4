"""Model zoo. Importing this package registers all model classes."""

from mr_blip_tpu.models.base import BaseModel
from mr_blip_tpu.models.eva_vit import EvaViT, eva_vit_g_config
from mr_blip_tpu.models.qformer import QFormer, qformer_base_config

__all__ = [
    "BaseModel",
    "EvaViT",
    "eva_vit_g_config",
    "QFormer",
    "qformer_base_config",
]

from mr_blip_tpu.common.registry import registry

__all__ = ["registry"]

from mr_blip_tpu.ops.attention import dot_product_attention

__all__ = ["dot_product_attention"]

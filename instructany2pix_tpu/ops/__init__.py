from .attention import dot_product_attention
from .flash_attention import flash_attention
from .groupnorm import group_norm

__all__ = ["dot_product_attention", "flash_attention", "group_norm"]

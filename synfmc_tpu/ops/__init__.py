from synfmc_tpu.ops.attention import dot_product_attention
from synfmc_tpu.ops.norms import group_norm, layer_norm

__all__ = ["dot_product_attention", "group_norm", "layer_norm"]

"""Attention modules: the four reference "processor" behaviors as one
parameterized module, plus the spatial transformer stack.

The reference dispatches per-layer at runtime among {AttnProcessor,
LoRAAttnProcessor, PoseAdaptorAttnProcessor, LORAPoseAdaptorAttnProcessor}
via set_all_attn_processor reflection (fmc/models/unet.py:897-1031).  Here the
variant is static module configuration: ``lora_rank > 0`` adds LoRA branches
(attention_processor.py:85-169), ``pose_cond != 'none'`` adds the zero-init
merge projection (attention_processor.py:172-293), and both compose
(attention_processor.py:296-420).  Same math, compile-time structure.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.layers import FeedForward, GroupNorm, LayerNorm, lora_down_init, sinusoidal_positional_encoding
from synfmc_tpu.ops.attention import dot_product_attention


class LoRADense(nn.Module):
    """diffusers LoRALinearLayer: up(down(x)), down ~ N(0, 1/rank), up = 0."""

    out_features: int
    rank: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.rank, use_bias=False, kernel_init=lora_down_init(self.rank),
            dtype=self.dtype, name="down",
        )(x)
        return nn.Dense(
            self.out_features, use_bias=False, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="up",
        )(h)


class Attention(nn.Module):
    """Multi-head attention with optional LoRA and pose-merge conditioning.

    pose_cond:
      'none' — vanilla (reference AttnProcessor).
      'qkv'  — q=k=v = qkv_merge(h + pose)*pose_scale + h; self-attention only
               (reference attention_processor.py:255-258; configs set
               query_condition=key_value_condition=true, cam.yaml:127-128).
      'q'    — query conditioned only (attention_processor.py:259-261).
      'kv'   — key/value conditioned only (attention_processor.py:262-264).

    temporal_pe_max_len > 0 adds the fixed sinusoidal PE to the input tokens
    (reference TemporalSelfAttention, motion_module.py:355-356) *before* any
    pose merge, matching the reference op order.
    """

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None -> self-attention
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    lora_rank: int = 0
    lora_scale: float = 1.0
    pose_cond: str = "none"
    pose_scale: float = 1.0
    temporal_pe_max_len: int = 0
    rescale_output_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        pose_feature: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, seq, dim = hidden_states.shape
        inner = self.heads * self.dim_head
        out_dim = self.out_dim or dim

        if self.temporal_pe_max_len > 0:
            pe = sinusoidal_positional_encoding(self.temporal_pe_max_len, dim)
            hidden_states = hidden_states + pe[None, :seq, :].astype(hidden_states.dtype)

        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name
        )
        zero_dense = lambda feats, name: nn.Dense(
            feats, use_bias=True, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )

        if self.pose_cond == "none":
            q_in = hidden_states
            kv_in = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        elif self.pose_cond == "qkv":
            assert encoder_hidden_states is None, "pose 'qkv' merge is self-attention only"
            assert pose_feature is not None
            merged = zero_dense(dim, "qkv_merge")(hidden_states + pose_feature)
            q_in = merged * self.pose_scale + hidden_states
            kv_in = q_in
        elif self.pose_cond == "q":
            assert pose_feature is not None
            merged = zero_dense(dim, "q_merge")(hidden_states + pose_feature)
            q_in = merged * self.pose_scale + hidden_states
            kv_in = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        elif self.pose_cond == "kv":
            assert pose_feature is not None
            kv_src = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
            merged = zero_dense(kv_src.shape[-1], "kv_merge")(kv_src + pose_feature)
            kv_in = merged * self.pose_scale + kv_src
            q_in = hidden_states
        else:
            raise ValueError(f"unknown pose_cond {self.pose_cond!r}")

        q = dense(inner, "to_q", self.qkv_bias)(q_in)
        k = dense(inner, "to_k", self.qkv_bias)(kv_in)
        v = dense(inner, "to_v", self.qkv_bias)(kv_in)
        if self.lora_rank > 0:
            q = q + self.lora_scale * LoRADense(inner, self.lora_rank, dtype=self.dtype, name="to_q_lora")(q_in)
            k = k + self.lora_scale * LoRADense(inner, self.lora_rank, dtype=self.dtype, name="to_k_lora")(kv_in)
            v = v + self.lora_scale * LoRADense(inner, self.lora_rank, dtype=self.dtype, name="to_v_lora")(kv_in)

        q = q.reshape(b, -1, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        attn_out = dot_product_attention(q, k, v, scale=self.dim_head**-0.5, mask=mask)
        attn_out = attn_out.reshape(b, seq, inner)

        out = dense(out_dim, "to_out", True)(attn_out)
        if self.lora_rank > 0:
            out = out + self.lora_scale * LoRADense(out_dim, self.lora_rank, dtype=self.dtype, name="to_out_lora")(attn_out)
        return out / self.rescale_output_factor


class BasicTransformerBlock(nn.Module):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU FF.

    The spatial transformer unit inside every CrossAttn block
    (reference uses diffusers Transformer2DModel, unet_blocks.py:300-312).
    ``lora_rank``/``spatial_lora`` reproduce the stage-1 Domain LoRA placement:
    LoRA on both attn1 and attn2 (train_image_lora.py:152-170).
    """

    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    lora_rank: int = 0
    lora_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            heads=self.heads, dim_head=self.dim_head, lora_rank=self.lora_rank,
            lora_scale=self.lora_scale, dtype=self.dtype, name="attn1",
        )(h)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            heads=self.heads, dim_head=self.dim_head,
            cross_attention_dim=self.cross_attention_dim, lora_rank=self.lora_rank,
            lora_scale=self.lora_scale, dtype=self.dtype, name="attn2",
        )(h, encoder_hidden_states=context)
        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel (use_linear_projection=False).

    GroupNorm -> 1x1 conv proj_in -> tokens -> blocks -> 1x1 conv proj_out ->
    + residual.  Input NHWC with frames folded into batch.
    """

    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: int = 768
    groups: int = 32
    lora_rank: int = 0
    lora_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(n, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                lora_rank=self.lora_rank, lora_scale=self.lora_scale,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, context)
        x = x.reshape(n, h, w, inner)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual

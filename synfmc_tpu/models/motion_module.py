"""AnimateDiff-style temporal transformer (motion module).

Behavioral parity with reference fmc/models/motion_module.py:44-321, built
TPU-first: video activations stay NHWC ``(b, f, h, w, c)`` and temporal
attention runs on ``(b*h*w, f, c)`` token groups — a pure reshape, no
transposes of the channel axis.

Pose conditioning is static configuration: ``pose_cond_blocks`` lists which
attention blocks within each TemporalTransformerBlock receive the pose-merge
projection (reference temporal_attn_names='0', configs/cam.yaml:124, wired at
unet.py:976-1031).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.attention import Attention
from synfmc_tpu.models.layers import FeedForward, GroupNorm, LayerNorm


class TemporalTransformerBlock(nn.Module):
    """Reference TemporalTransformerBlock (motion_module.py:237-300).

    ``attention_block_types`` are all 'Temporal_Self' in every shipped config;
    per-block pose conditioning per ``pose_cond_blocks``.
    Operates on (N, F, C) tokens.
    """

    num_attention_heads: int
    attention_head_dim: int
    num_attention_blocks: int = 2
    temporal_pe_max_len: int = 32  # 0 disables the positional encoding
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    lora_rank: int = 0
    lora_scale: float = 1.0
    rescale_output_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pose_feature: Optional[jax.Array] = None) -> jax.Array:
        for i in range(self.num_attention_blocks):
            pose_here = i in self.pose_cond_blocks and pose_feature is not None
            h = LayerNorm(dtype=self.dtype, name=f"norms_{i}")(x)
            x = x + Attention(
                heads=self.num_attention_heads,
                dim_head=self.attention_head_dim,
                pose_cond="qkv" if pose_here else "none",
                pose_scale=self.pose_scale,
                lora_rank=self.lora_rank,
                lora_scale=self.lora_scale,
                temporal_pe_max_len=self.temporal_pe_max_len,
                rescale_output_factor=self.rescale_output_factor,
                dtype=self.dtype,
                name=f"attention_blocks_{i}",
            )(h, pose_feature=pose_feature if pose_here else None)
        h = LayerNorm(dtype=self.dtype, name="ff_norm")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class TemporalTransformer3D(nn.Module):
    """Reference VanillaTemporalModule + TemporalTransformer3DModel
    (motion_module.py:44-234): GN -> proj_in -> blocks -> proj_out -> +res.

    Input/output: (b, f, h, w, c) NHWC video.
    ``zero_initialize`` zeroes proj_out (motion_module.py:82-83); shipped
    configs set it false because AnimateDiff-v3 weights are loaded
    (cam.yaml:103).
    """

    num_attention_heads: int = 8
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    attention_dim_div: int = 1
    norm_num_groups: int = 32
    temporal_pe_max_len: int = 32
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    lora_rank: int = 0
    lora_scale: float = 1.0
    zero_initialize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pose_feature: Optional[jax.Array] = None) -> jax.Array:
        b, f, h, w, c = x.shape
        inner = c // self.attention_dim_div
        residual = x

        # InflatedGroupNorm == per-frame GN == plain GN in frames-folded NHWC.
        y = GroupNorm(self.norm_num_groups, eps=1e-6, dtype=self.dtype, name="norm")(
            x.reshape(b * f, h, w, c)
        ).reshape(b, f, h, w, c)
        # (b f h w c) -> (b h w) f c token groups.
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(b * h * w, f, c)
        y = nn.Dense(inner, dtype=self.dtype, name="proj_in")(y)

        pose_tokens = None
        if pose_feature is not None:
            # reference motion_module.py:357-363: b c f h w -> (b h w) f c;
            # ours is already NHWC video.
            pb, pf, ph, pw, pc = pose_feature.shape
            assert (pb, pf, ph, pw) == (b, f, h, w), (
                f"pose feature spatial shape {pose_feature.shape} != activation {(b, f, h, w)}"
            )
            pose_tokens = jnp.transpose(pose_feature, (0, 2, 3, 1, 4)).reshape(b * h * w, f, pc)

        for i in range(self.num_transformer_blocks):
            y = TemporalTransformerBlock(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=inner // self.num_attention_heads,
                num_attention_blocks=self.num_attention_blocks,
                temporal_pe_max_len=self.temporal_pe_max_len,
                pose_cond_blocks=self.pose_cond_blocks,
                pose_scale=self.pose_scale,
                lora_rank=self.lora_rank,
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(y, pose_feature=pose_tokens)

        proj_out_init = nn.initializers.zeros if self.zero_initialize else None
        kw = {"kernel_init": proj_out_init, "bias_init": nn.initializers.zeros} if self.zero_initialize else {}
        y = nn.Dense(c, dtype=self.dtype, name="proj_out", **kw)(y)
        y = y.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return y + residual

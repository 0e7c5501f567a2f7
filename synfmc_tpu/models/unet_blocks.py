"""3D UNet blocks (NHWC video, frames folded into batch for spatial ops).

Behavioral parity with reference fmc/models/unet_blocks.py and the
stage-3 adapted forwards (fmc/modified_modules.py:52-185): traj features are
ordinary optional inputs added to the block output before downsampling — no
monkey patching.

Per layer: ResnetBlock2D -> SpatialTransformer (CrossAttn blocks) ->
TemporalTransformer3D (motion module), exactly the reference op order
(unet_blocks.py:377-416).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.attention import SpatialTransformer
from synfmc_tpu.models.layers import Downsample2D, GroupNorm, ResnetBlock2D, Upsample2D
from synfmc_tpu.models.motion_module import TemporalTransformer3D


def fold(x):
    """(b, f, h, w, c) -> (b*f, h, w, c)"""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


def unfold(x, f):
    n, h, w, c = x.shape
    return x.reshape(n // f, f, h, w, c)


class _MotionMixin:
    """Shared motion-module constructor arguments."""

    def _motion_module(self, name: str) -> TemporalTransformer3D:
        return TemporalTransformer3D(
            num_attention_heads=self.motion_num_heads,
            num_transformer_blocks=self.motion_transformer_blocks,
            num_attention_blocks=self.motion_attention_blocks,
            temporal_pe_max_len=self.motion_pe_max_len,
            pose_cond_blocks=self.pose_cond_blocks,
            pose_scale=self.pose_scale,
            lora_rank=self.motion_lora_rank,
            lora_scale=self.motion_lora_scale,
            zero_initialize=self.motion_zero_initialize,
            dtype=self.dtype,
            name=name,
        )


class CrossAttnDownBlock3D(nn.Module, _MotionMixin):
    out_channels: int
    num_layers: int = 2
    attn_heads: int = 8
    cross_attention_dim: int = 768
    add_downsample: bool = True
    use_motion_module: bool = True
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    lora_rank: int = 0  # divisor rule applied by caller; 0 disables
    lora_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, pose_feature=None, traj_feature=None,
                 run_downsample=True):
        b, f = x.shape[:2]
        temb_rep = jnp.repeat(temb, f, axis=0)
        ctx_rep = jnp.repeat(context, f, axis=0)
        outputs = []
        for i in range(self.num_layers):
            h = fold(x)
            h = ResnetBlock2D(out_channels=self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(h, temb_rep)
            h = SpatialTransformer(
                heads=self.attn_heads,
                dim_head=self.out_channels // self.attn_heads,
                cross_attention_dim=self.cross_attention_dim,
                lora_rank=self.lora_rank,
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(h, ctx_rep)
            x = unfold(h, f)
            if self.use_motion_module:
                x = self._motion_module(f"motion_modules_{i}")(x, pose_feature=pose_feature)
            outputs.append(x)
        if traj_feature is not None:
            # OMC residual injection (modified_modules.py:115-117): added to the
            # block output AND the last skip state, before downsampling.
            x = x + traj_feature
            outputs[-1] = x
        # run_downsample=False is the DeepCache shallow path (unet3d.py): the
        # downsampled state feeds only the deeper levels, which a cache step
        # never computes.
        if self.add_downsample and run_downsample:
            x = unfold(Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(fold(x)), f)
            outputs.append(x)
        return x, outputs


class DownBlock3D(nn.Module, _MotionMixin):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = False
    use_motion_module: bool = True
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, pose_feature=None, traj_feature=None):
        b, f = x.shape[:2]
        temb_rep = jnp.repeat(temb, f, axis=0)
        outputs = []
        for i in range(self.num_layers):
            h = fold(x)
            h = ResnetBlock2D(out_channels=self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(h, temb_rep)
            x = unfold(h, f)
            if self.use_motion_module:
                x = self._motion_module(f"motion_modules_{i}")(x, pose_feature=pose_feature)
            outputs.append(x)
        if traj_feature is not None:
            x = x + traj_feature
            outputs[-1] = x
        if self.add_downsample:
            x = unfold(Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(fold(x)), f)
            outputs.append(x)
        return x, outputs


class UNetMidBlock3DCrossAttn(nn.Module, _MotionMixin):
    channels: int
    num_layers: int = 1
    attn_heads: int = 8
    cross_attention_dim: int = 768
    use_motion_module: bool = False  # motion_module_mid_block: false in configs
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    lora_rank: int = 0
    lora_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, pose_feature=None):
        b, f = x.shape[:2]
        temb_rep = jnp.repeat(temb, f, axis=0)
        ctx_rep = jnp.repeat(context, f, axis=0)
        x = unfold(
            ResnetBlock2D(out_channels=self.channels, dtype=self.dtype, name="resnets_0")(fold(x), temb_rep), f
        )
        for i in range(self.num_layers):
            h = SpatialTransformer(
                heads=self.attn_heads,
                dim_head=self.channels // self.attn_heads,
                cross_attention_dim=self.cross_attention_dim,
                lora_rank=self.lora_rank,
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(fold(x), ctx_rep)
            x = unfold(h, f)
            if self.use_motion_module:
                x = self._motion_module(f"motion_modules_{i}")(x, pose_feature=pose_feature)
            x = unfold(
                ResnetBlock2D(out_channels=self.channels, dtype=self.dtype, name=f"resnets_{i + 1}")(
                    fold(x), temb_rep
                ),
                f,
            )
        return x


class CrossAttnUpBlock3D(nn.Module, _MotionMixin):
    out_channels: int
    num_layers: int = 3
    attn_heads: int = 8
    cross_attention_dim: int = 768
    add_upsample: bool = True
    use_motion_module: bool = True
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    lora_rank: int = 0
    lora_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, pose_feature=None):
        b, f = x.shape[:2]
        temb_rep = jnp.repeat(temb, f, axis=0)
        ctx_rep = jnp.repeat(context, f, axis=0)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            h = fold(x)
            h = ResnetBlock2D(out_channels=self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(h, temb_rep)
            h = SpatialTransformer(
                heads=self.attn_heads,
                dim_head=self.out_channels // self.attn_heads,
                cross_attention_dim=self.cross_attention_dim,
                lora_rank=self.lora_rank,
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(h, ctx_rep)
            x = unfold(h, f)
            if self.use_motion_module:
                x = self._motion_module(f"motion_modules_{i}")(x, pose_feature=pose_feature)
        if self.add_upsample:
            x = unfold(Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(fold(x)), f)
        return x


class UpBlock3D(nn.Module, _MotionMixin):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    use_motion_module: bool = True
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    pose_cond_blocks: Sequence[int] = ()
    pose_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, pose_feature=None):
        b, f = x.shape[:2]
        temb_rep = jnp.repeat(temb, f, axis=0)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            h = fold(x)
            h = ResnetBlock2D(out_channels=self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(h, temb_rep)
            x = unfold(h, f)
            if self.use_motion_module:
                x = self._motion_module(f"motion_modules_{i}")(x, pose_feature=pose_feature)
        if self.add_upsample:
            x = unfold(Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(fold(x)), f)
        return x

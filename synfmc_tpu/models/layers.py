"""Foundational layers shared by the UNet, VAE, and pose/object encoders.

All modules are channel-last (NHWC); the video frame axis is folded into the
batch axis by callers for spatial ops (the TPU-native equivalent of the
reference's ``InflatedConv3d``/``(b f) c h w`` rearranges,
fmc/models/resnet.py:16-24).

Parameter submodule names mirror the torch names (conv1, time_emb_proj, ...)
so checkpoint porting (synfmc_tpu/interop) is a pure name/layout map.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.ops.norms import group_norm


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics,
    flip_sin_to_cos=True / freq_shift=0 as in unet.py:112-113).

    Args:
      timesteps: (B,) float/int timesteps.
      dim: embedding dim (320 for SD1.5).
    Returns: (B, dim) fp32 embedding.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = jax.nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class GroupNorm(nn.Module):
    """GroupNorm with optional fused activation, routed through ops.group_norm."""

    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, self.num_groups, eps=self.eps, act=self.act)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 stats (torch semantics)."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from synfmc_tpu.ops.norms import layer_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, eps=self.eps)


class Conv2D(nn.Module):
    """3x3/1x1 conv wrapper (NHWC, HWIO kernels) with torch-like defaults."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (default config) — the UNet/VAE workhorse.

    norm1+silu -> conv1 -> (+ time proj) -> norm2+silu -> conv2 -> + shortcut.
    Reference uses the stock diffusers block frame-flattened
    (fmc/models/unet_blocks.py:377-416).
    """

    out_channels: int
    use_time_emb: bool = True
    eps: float = 1e-6
    groups: int = 32
    output_scale_factor: float = 1.0
    use_shortcut_conv: Optional[bool] = None  # None -> auto (in != out)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, eps=self.eps, act="silu", dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb:
            assert temb is not None, "ResnetBlock2D configured with time embedding"
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(jax.nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, eps=self.eps, act="silu", dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv2")(h)
        use_sc = self.use_shortcut_conv
        if use_sc is None:
            use_sc = in_channels != self.out_channels
        if use_sc:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    """Strided 3x3 conv downsample (diffusers Downsample2D use_conv=True)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest x2 + 3x3 conv (diffusers Upsample2D use_conv=True)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")(x)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward, activation_fn='geglu').

    net.0 = GEGLU proj to 2*mult*dim, net.2 = Dense back to dim.
    """

    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> jax.Array:
    """Fixed temporal PE table (reference motion_module.py:303-321).

    pe[p, 2i] = sin(p * exp(-2i ln(1e4)/d)), pe[p, 2i+1] = cos(...).
    Returns (max_len, d_model) fp32.
    """
    assert d_model % 2 == 0, "temporal PE requires even d_model"
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    args = position * div_term[None, :]
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(args))
    pe = pe.at[:, 1::2].set(jnp.cos(args))
    return pe


def zeros_init():
    return nn.initializers.zeros


def lora_down_init(rank: int):
    """diffusers LoRALinearLayer down-proj init: normal(std=1/rank)."""
    return nn.initializers.normal(stddev=1.0 / rank)

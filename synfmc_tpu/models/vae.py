"""AutoencoderKL (SD1.5 VAE) — NHWC, TPU-native.

Reference obtains this from diffusers ``AutoencoderKL.from_pretrained``
(train_cam_ctrl.py:222); it is frozen in all three stages and used as
per-frame encode (x0.18215, train_cam_ctrl.py:540-546) and frame-wise decode
(/0.18215, fmc/pipelines/pipeline_animation.py:238-251).

Structure (SD1.5 config): block_out_channels (128, 256, 512, 512),
layers_per_block 2 (encoder) / 3 (decoder), latent 4ch, GN(32, eps 1e-6),
single-head mid-block attention, quant/post_quant 1x1 convs,
scaling_factor 0.18215.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.layers import Downsample2D, GroupNorm, ResnetBlock2D, Upsample2D
from synfmc_tpu.ops.attention import dot_product_attention

SD_VAE_SCALING = 0.18215


class VAEAttention(nn.Module):
    """Single-head mid-block attention: GN -> qkv (bias) -> attn -> proj -> +res."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        residual = x
        y = GroupNorm(32, eps=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], scale=c**-0.5
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(n, h, w, c) + residual


class VAEMidBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(out_channels=self.channels, use_time_emb=False, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(out_channels=self.channels, use_time_emb=False, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        chs = list(self.block_out_channels)
        x = nn.Conv(chs[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(out_channels=ch, use_time_emb=False, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(x)
            if i != len(chs) - 1:
                x = Downsample2D(ch, dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0")(x)
        x = VAEMidBlock(chs[-1], dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(32, eps=1e-6, act="silu", dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        chs = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        x = nn.Conv(chs[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(z)
        x = VAEMidBlock(chs[0], dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(out_channels=ch, use_time_emb=False, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(x)
            if i != len(chs) - 1:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = GroupNorm(32, eps=1e-6, act="silu", dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    scaling_factor: float = SD_VAE_SCALING
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, latent_channels=self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(N, H, W, 3) in [-1, 1] -> (mean, logvar), each (N, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """Sampled (rng given) or mode latent, x scaling_factor — matches the
        reference's ``vae.encode(...).latent_dist.sample() * 0.18215``."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        """(N, h, w, 4) scaled latents -> (N, H, W, 3); divides scaling_factor
        (pipeline_animation.py:240)."""
        return self.decoder(self.post_quant_conv(z / self.scaling_factor))

    def __call__(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        return self.decode(self.encode(x, rng))

"""CMC camera encoder: Plücker video -> 4 multi-scale pose feature maps.

Behavioral parity with reference ``CameraPoseEncoder``
(fmc/models/pose_adaptor.py:159-240): PixelUnshuffle(8) -> conv_in -> 4 stages
of [AdapterResnetBlock + temporal attention] x nums_rb with avg-pool
downsampling between stages.  TPU-native: NHWC video in/out, frames folded
into batch for convs, (b*h*w, f, c) tokens for the temporal attention.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.motion_module import TemporalTransformerBlock
from synfmc_tpu.ops.pixel import pixel_unshuffle


class AdapterResnetBlock(nn.Module):
    """The T2I-Adapter-style conv block shared by CameraPoseEncoder
    (pose_adaptor.py:102-135) and the OMC Adapter (adapter.py:64-98).

    down -> avg-pool 2x2 (use_conv=False in all shipped configs);
    in_conv only when in/out channels differ (sk=True in configs);
    block1(3x3) -> ReLU -> block2(ksize) -> + residual.
    """

    out_channels: int
    down: bool = False
    ksize: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if x.shape[-1] != self.out_channels:
            p = self.ksize // 2
            x = nn.Conv(
                self.out_channels, (self.ksize, self.ksize),
                padding=[(p, p), (p, p)], dtype=self.dtype, name="in_conv",
            )(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="block1")(x)
        h = jax.nn.relu(h)
        p = self.ksize // 2
        h = nn.Conv(
            self.out_channels, (self.ksize, self.ksize),
            padding=[(p, p), (p, p)], dtype=self.dtype, name="block2",
        )(h)
        return h + x


class CameraPoseEncoder(nn.Module):
    """Plücker (B, F, H, W, 6) -> list of 4 pose features (B, F, H/8/2^i, W/8/2^i, C_i)."""

    downscale_factor: int = 8
    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    ksize: int = 1
    temporal_attention_nhead: int = 8
    temporal_pe_max_len: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, plucker: jax.Array) -> list[jax.Array]:
        b, f, h, w, c = plucker.shape
        x = pixel_unshuffle(plucker.reshape(b * f, h, w, c), self.downscale_factor)
        x = nn.Conv(self.channels[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(x)

        features = []
        for i, ch in enumerate(self.channels):
            for j in range(self.nums_rb):
                x = AdapterResnetBlock(
                    out_channels=ch,
                    down=(j == 0 and i != 0),
                    ksize=self.ksize,
                    dtype=self.dtype,
                    name=f"blocks_{i}_{j}_conv",
                )(x)
                bh, hh, ww, cc = x.shape
                # (b f) h w c -> (b h w) f c (pose_adaptor.py:236)
                tokens = x.reshape(b, f, hh, ww, cc).transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, cc)
                tokens = TemporalTransformerBlock(
                    num_attention_heads=self.temporal_attention_nhead,
                    attention_head_dim=cc // self.temporal_attention_nhead,
                    num_attention_blocks=1,
                    temporal_pe_max_len=self.temporal_pe_max_len,
                    dtype=self.dtype,
                    name=f"blocks_{i}_{j}_attn",
                )(tokens)
                x = tokens.reshape(b, hh, ww, f, cc).transpose(0, 3, 1, 2, 4).reshape(b * f, hh, ww, cc)
            features.append(x.reshape(b, f, *x.shape[1:]))
        return features

"""OMC object-pose encoder ("Adapter").

Behavioral parity with reference ``Adapter`` (fmc/adapter.py:109-192):
PixelUnshuffle(8) on the 13-channel masked-pose raster -> zero conv_in ->
conv_in -> 4 stages x nums_rb AdapterResnetBlocks with avg-pool downsampling
-> per-stage zero conv out -> multiply by nearest-resized mask.

Input is per-frame NHWC with frames folded into batch; callers reshape the
four returned feature maps back to video.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.pose_encoder import AdapterResnetBlock
from synfmc_tpu.ops.pixel import nearest_resize, pixel_unshuffle


class ObjectAdapter(nn.Module):
    """(N, H, W, cin/64ch-pre-unshuffle) masked pose raster -> 4 feature maps."""

    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    ksize: int = 3
    use_pre_zero_conv: bool = True
    use_post_zero_conv: bool = True
    downscale_factor: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask_feat: Optional[jax.Array] = None) -> list[jax.Array]:
        """Args:
          x: (N, H, W, C) pose+mask raster (C=13 in the shipped config;
             13*64=832 after unshuffle, obj.yaml:185).
          mask_feat: (N, Hm, Wm, 1) mask for per-scale modulation
             (adapter.py:175-177), or None.
        Returns: list of 4 feature maps (N, H/8/2^i, W/8/2^i, C_i).
        """
        x = pixel_unshuffle(x, self.downscale_factor)
        if self.use_pre_zero_conv:
            x = nn.Conv(
                x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype, name="zero_conv_in",
            )(x)
        x = nn.Conv(self.channels[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(x)

        features = []
        for i, ch in enumerate(self.channels):
            for j in range(self.nums_rb):
                x = AdapterResnetBlock(
                    out_channels=ch,
                    down=(i != 0 and j == 0),
                    ksize=self.ksize,
                    dtype=self.dtype,
                    name=f"body_{i * self.nums_rb + j}",
                )(x)
            if self.use_post_zero_conv:
                x = nn.Conv(
                    ch, (1, 1), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f"zero_conv_out_{i}",
                )(x)
            if mask_feat is not None:
                m = nearest_resize(mask_feat, x.shape[1], x.shape[2]).astype(x.dtype)
                x = x * m
            features.append(x)
        return features

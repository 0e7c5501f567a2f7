"""Pixel shuffle ops (NHWC), matching torch.nn.PixelUnshuffle channel order
so ported conv weights line up (out channel index = c*r*r + i*r + j)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/f, W/f, C*f*f) with torch channel ordering."""
    n, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (N, H/f, W/f, C, i, j)
    return x.reshape(n, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Inverse of pixel_unshuffle."""
    n, h, w, cf = x.shape
    c = cf // (factor * factor)
    x = x.reshape(n, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H, i, W, j, C)
    return x.reshape(n, h * factor, w * factor, c)


def nearest_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize on (N, H, W, C) — torch F.interpolate(mode='nearest')."""
    n, h, w, c = x.shape
    rows = (jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = (jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]

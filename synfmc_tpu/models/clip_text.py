"""CLIP ViT-L/14 text encoder — the SD1.5 text conditioning model.

Reference obtains this from transformers ``CLIPTextModel.from_pretrained``
(train_cam_ctrl.py:223); frozen in all stages; last_hidden_state feeds the
UNet cross attention (train_cam_ctrl.py:556-561).

Structure: vocab 49408, hidden 768, 12 layers, 12 heads, max 77 positions,
quick_gelu MLP, causal mask, final LayerNorm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.layers import LayerNorm
from synfmc_tpu.ops.attention import dot_product_attention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        b, s, c = x.shape
        d = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x).reshape(b, s, self.heads, d)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x).reshape(b, s, self.heads, d)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x).reshape(b, s, self.heads, d)
        out = dot_product_attention(q, k, v, scale=d**-0.5, mask=mask, use_flash=False)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out.reshape(b, s, c))


class CLIPEncoderLayer(nn.Module):
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        h = LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="self_attn")(h, mask)
        h = LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(x.shape[-1] * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """(B, S) token ids -> (B, S, hidden) last_hidden_state."""
        b, s = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (self.max_positions, self.hidden_size)
        )
        x = tok + pos[None, :s, :].astype(tok.dtype)
        # causal mask (additive, -inf above diagonal)
        causal = jnp.triu(jnp.full((s, s), -1e9, dtype=jnp.float32), k=1)[None, None]
        for i in range(self.num_layers):
            x = CLIPEncoderLayer(self.num_heads, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        return LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)

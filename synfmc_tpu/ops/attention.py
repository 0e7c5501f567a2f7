"""Attention compute core.

Single dispatch point for all attention in the framework (spatial self/cross,
temporal self, pose-conditioned).  The reference routes everything through
diffusers ``Attention.get_attention_scores`` + bmm (fmc/models/
attention_processor.py:65-67); here the math lives in one function that can
route to the Pallas flash-attention kernel on TPU or a pure-XLA einsum path.

Layout: ``(batch, seq, heads, head_dim)`` — chosen so the frame-folded batch
axis stays leading and shardable.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Sequence lengths below this use the XLA path even when flash is enabled:
# the kernel's tiling has no advantage for tiny sequences (e.g. 16 frames of
# temporal attention).
_FLASH_MIN_SEQ = 256


def _xla_attention(q, k, v, scale, mask=None):
    # Heads merged into the batch axis before the matmuls: profiling shows
    # XLA lowers this ~26% faster than the 4D "bqhd,bkhd->bhqk" einsum on the
    # temporal hot shape (3072,16,8,40) and identically elsewhere (PERF.md).
    # fp32 softmax accumulation regardless of compute dtype.
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    logits = jnp.einsum("bqd,bkd->bqk", qt, kt, preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, dtype=logits.dtype)
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(logits.dtype), (b, h, sq, sk)).reshape(b * h, sq, sk)
        logits = logits + m
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), vt)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    use_flash: str | bool = "auto",
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Args:
      q: (B, Sq, H, D) queries.
      k, v: (B, Sk, H, D) keys/values.
      scale: logit scale; defaults to D**-0.5 (diffusers Attention default).
      mask: optional additive mask broadcastable to (B, H, Sq, Sk).
      use_flash: True/False/'auto' — route to the Pallas kernel when
        beneficial and supported on the current backend.

    Returns:
      (B, Sq, H, D) attention output in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # 'auto' policy: fused kernel for long SELF-attention only.  Cross
    # attention (kv=77 text tokens) gains nothing from fusion but pays the
    # kernel's layout prep — profiling showed routing it to XLA is ~3% of the
    # whole UNet forward.
    want_flash = use_flash is True or (
        use_flash == "auto"
        and mask is None
        and q.shape[1] >= _FLASH_MIN_SEQ
        and q.shape[1] == k.shape[1]
        and jax.default_backend() == "tpu"
    )
    if want_flash:
        from synfmc_tpu.ops.flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v):
            return flash_attention(q, k, v, scale=scale)

    # Short self-attention (the motion module's 16-frame temporal attention):
    # fused packed-layout kernel reading the Dense output directly — kills the
    # (B,S,H,D)->(B*H,S,D) head-split relayout (13% of the UNet forward) and
    # the batched attention math itself measures ~2x the XLA path at the
    # (3072,16,8,40) hot shape (PERF.md).  SYNFMC_TEMPORAL_KERNEL=0 disables.
    if (
        os.environ.get("SYNFMC_TEMPORAL_KERNEL", "1") == "1"
        and use_flash in ("auto", True)
        and mask is None
        and q.shape[1] == k.shape[1]
        and q.shape[1] <= 64
        and jax.default_backend() == "tpu"
    ):
        from synfmc_tpu.ops.temporal_attention import temporal_attention, temporal_supported

        b, s, h, d = q.shape
        q2 = q.reshape(b, s, h * d)
        if temporal_supported(q2, h):
            out2 = temporal_attention(
                q2, k.reshape(b, s, h * d), v.reshape(b, s, h * d), scale, h
            )
            return out2.reshape(b, s, h, d)
    return _xla_attention(q, k, v, scale, mask=mask)

"""Normalization ops (channel-last).

``group_norm`` is the single entry point for every GroupNorm in the stack —
UNet resnets, transformer input norms, VAE blocks — with an optional fused
activation.  On TPU it routes to the fused Pallas kernel
(synfmc_tpu/ops/pallas_groupnorm.py); elsewhere it runs the XLA reference
path below.  Reference semantics: torch.nn.GroupNorm (per-sample stats over
spatial dims x group channels); the reference's InflatedGroupNorm
(fmc/models/resnet.py:27-37) folds frames into batch first, which is exactly
our layout already.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    act: Optional[str] = None,
    use_pallas: str | bool = "auto",
) -> jax.Array:
    """GroupNorm over the trailing channel axis with optional fused act.

    Args:
      x: (N, ..., C) — stats are computed per sample over all non-batch dims
        within each channel group (torch.nn.GroupNorm semantics).
      scale, bias: (C,) affine parameters.
      num_groups: number of channel groups (C % num_groups == 0).
      eps: numerical epsilon.
      act: None | 'silu' | 'relu' — fused activation.
    """
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"

    if use_pallas is True or (use_pallas == "auto" and jax.default_backend() == "tpu"):
        from synfmc_tpu.ops.pallas_groupnorm import fused_group_norm, pallas_gn_supported

        if pallas_gn_supported(x, num_groups):
            return fused_group_norm(x, scale, bias, num_groups, eps=eps, act=act)

    orig_dtype = x.dtype
    # One data pass for the statistics: sum and sum-of-squares reduce together
    # (E[x^2]-E[x]^2), then one normalize pass with the per-channel affine
    # folded into a single scale/shift — 2 HBM passes instead of the naive 4.
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    xf = xg.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=(1, 3))  # (n, g)
    m2 = jnp.mean(xf * xf, axis=(1, 3))
    var = m2 - m1 * m1
    rstd = jax.lax.rsqrt(var + eps)  # (n, g)
    # fold affine: out = x * gamma' + beta'
    gamma = scale.astype(jnp.float32).reshape(num_groups, -1)[None] * rstd[..., None]  # (n,g,cg)
    beta = bias.astype(jnp.float32).reshape(num_groups, -1)[None] - m1[..., None] * gamma
    out = xf * gamma[:, None] + beta[:, None]
    out = out.reshape(x.shape)
    if act == "silu":
        out = jax.nn.silu(out)
    elif act == "relu":
        out = jax.nn.relu(out)
    elif act is not None:
        raise ValueError(f"unknown fused activation {act!r}")
    return out.astype(orig_dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing axis, fp32 stats (torch.nn.LayerNorm)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)

"""Fused GroupNorm(+activation) Pallas kernel.

XLA lowers GroupNorm as a reduce pass plus a normalize pass, each touching
HBM; this kernel keeps one sample's activation slab VMEM-resident and does
stats + normalize + affine + activation in a single HBM read/write — the
GroupNorm+SiLU chain in front of every conv is the UNet's second-biggest
bandwidth consumer after attention (BASELINE.json north star).

Group reductions are expressed as matmuls against a (C, G) one-hot grouping
matrix so they run on the MXU with lane-aligned shapes (channel groups of
10/20/40 lanes are not vector-reduction friendly).

Gated by slab size: samples whose (S, C) slab exceeds the VMEM budget fall
back to the XLA path in ops.norms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_SLAB_BYTES = int(2.5 * 1024 * 1024)  # kernel temporaries ~4x the slab; 16MB VMEM


def pallas_gn_supported(x, num_groups: int) -> bool:
    # Disabled by default after measurement, not for lack of a kernel: with
    # the ones-matmul statistics (round 2 — replacing the cross-sublane
    # jnp.sum whose Mosaic lowering took ~250 s to compile; now ~1 s) the
    # kernel is numerically exact and wins only at the deepest UNet level
    # (0.275 vs 0.301 ms at 32x96x1280) while losing at the bandwidth-heavy
    # levels (0.43 vs 0.31 ms at 32x1536x320) to XLA's one-pass rewrite in
    # ops.norms, which additionally fuses with neighboring ops.  Net in-model
    # effect is negative, so the XLA path is the production default.
    # Enable explicitly with SYNFMC_PALLAS_GN=1.
    import os

    if os.environ.get("SYNFMC_PALLAS_GN") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    if c % num_groups or c % 128:
        # lane-aligned channels only (SD channels 128..1280 all qualify)
        return False
    s = int(np.prod(x.shape[1:-1]))
    if s * c * 4 > _VMEM_SLAB_BYTES:
        return False
    if s % 8:
        return False
    return True


def _gn_kernel(x_ref, scale_ref, bias_ref, onehot_ref, ones_ref, o_ref, *,
               num_groups: int, eps: float, act, inv_count: float):
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    onehot = onehot_ref[:]  # (C, G)
    ones = ones_ref[:]  # (1, S)
    # channel sums via MXU ones-matmul: jnp.sum(x, axis=0) lowers to a
    # cross-sublane reduction whose Mosaic compile blows up on big slabs
    # (~250 s); (1,S) @ (S,C) compiles in ~1 s and runs on the MXU.
    ch_sum = jax.lax.dot_general(ones, x, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, C)
    ch_sqsum = jax.lax.dot_general(ones, x * x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    g_sum = jax.lax.dot_general(ch_sum, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, G)
    g_sqsum = jax.lax.dot_general(ch_sqsum, onehot, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    mean_g = g_sum * inv_count
    var_g = g_sqsum * inv_count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group values back per channel: (1, G) @ onehot^T -> (1, C)
    mean_c = jax.lax.dot_general(mean_g, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = scale_ref[:].astype(jnp.float32) * rstd_c  # (1, C)
    beta = bias_ref[:].astype(jnp.float32) - mean_c * gamma
    out = x * gamma + beta
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act == "relu":
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5, act=None,
                     interpret: bool = False):
    """x: (N, ..., C) -> same shape; per-sample group stats (torch GN).

    Forward runs the Pallas kernel; backward differentiates the XLA reference
    path (ops.norms with use_pallas=False) — identical math, so gradients are
    exact while the forward hot path stays fused.
    """
    return _fused_group_norm_impl(x, scale, bias, num_groups, eps, act, interpret)


def _fused_gn_fwd(x, scale, bias, num_groups, eps, act, interpret):
    return _fused_group_norm_impl(x, scale, bias, num_groups, eps, act, interpret), (x, scale, bias)


def _fused_gn_bwd(num_groups, eps, act, interpret, res, g):
    from synfmc_tpu.ops.norms import group_norm

    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm(x_, s_, b_, num_groups, eps=eps, act=act, use_pallas=False),
        x, scale, bias,
    )
    return vjp(g)


def _fused_group_norm_impl(x, scale, bias, num_groups: int, eps: float = 1e-5, act=None,
                           interpret: bool = False):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    x2 = x.reshape(n, s, c)
    onehot = jnp.asarray(
        np.kron(np.eye(num_groups), np.ones((c // num_groups, 1))), dtype=jnp.float32
    )  # (C, G)
    inv_count = 1.0 / (s * (c // num_groups))
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, num_groups=num_groups, eps=eps, act=act, inv_count=inv_count
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c), onehot, jnp.ones((1, s), jnp.float32))
    return out.reshape(orig_shape)


fused_group_norm.defvjp(_fused_gn_fwd, _fused_gn_bwd)

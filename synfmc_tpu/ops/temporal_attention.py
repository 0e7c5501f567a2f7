"""Pallas TPU temporal attention over the packed (N, F, C) layout.

Motivation (PERF.md): the motion module's temporal self-attention runs at
seq = F = 16 frames over N = b*h*w token groups.  The XLA path must split
heads — transpose (N, F, H, D) -> (N*H, F, D) — and that relayout of
bf16[3072,16,8,40] costs 10.7 ms per UNet forward (13% of device time),
more than the attention math itself.  This kernel reads Q/K/V in the packed
(N, F, C=H*D) layout the QKV Dense already produces, so the relayout (and
the D->128 padding of the flash kernel) never exists.

Design: grid over row tiles of N; per head (static unroll), lane-sliced
Q/K/V feed *row-batched* ``dot_general``s — Mosaic lowers n-batched
(TN, F, D) x (TN, F, D) contractions efficiently, measured 2.1x faster
than the XLA head-split path at the (3072, 16, 8, 40) hot shape and ~1.2x
at the smaller UNet levels (plus the removed relayout).  Matmuls run on
native bf16 inputs with fp32 accumulation; softmax in fp32.

Because attention mixes only the F frames *within* each row, every row
tile is self-contained — the backward is the same batched-dot structure
with zero cross-grid-step accumulation (contrast flash_attention.py's
dK/dV scratch accumulators):

  dP = dO V^T,  dS = P * (dP - rowsum(dO*O)) * scale
  dQ = dS K,    dK = dS^T Q,   dV = P^T dO     (all n-batched)

Reference behavior being replaced: diffusers Attention head-split + bmm
softmax inside VersatileAttention (fmc/models/motion_module.py:218-274).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synfmc_tpu.ops.spmd import shard_by_rule, spmd_kernels_enabled

# bf16 bytes of the 4 (TN, F, C) fwd blocks (3 in + 1 out) we allow resident;
# the bwd holds 8 such blocks, so it uses half the row tile.
_VMEM_BLOCK_BUDGET = 12 * 1024 * 1024
_MAX_TILE = 128  # larger tiles measured no faster but compile much slower


def _tile_rows(n: int, f: int, c: int, n_blocks: int) -> int:
    for tn in (_MAX_TILE, 64, 32, 16, 8, 4, 2, 1):
        if n % tn:
            continue
        if tn * f * c * 2 * n_blocks <= _VMEM_BLOCK_BUDGET:
            return tn
    return 1


def temporal_supported(q2: jax.Array, heads: int) -> bool:
    if q2.ndim != 3:
        return False
    n, f, c = q2.shape
    if c % heads or f > 128:
        return False
    if f < 2 or n < 8 or n % 8:
        return False
    return True


def _batched_dot(a, b, contract_a: int, contract_b: int):
    """(TN, x, y) pairs contracted over the given dims, batched over dim 0."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int, d: int):
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        logits = _batched_dot(qh, kh, 2, 2) * scale  # (TN, F, F)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        oh = _batched_dot(p.astype(vh.dtype), vh, 2, 1)  # (TN, F, D)
        o_ref[:, :, sl] = oh.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, heads: int, d: int):
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        do = do_ref[:, :, sl].astype(jnp.float32)
        logits = _batched_dot(qh, kh, 2, 2) * scale
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)  # (TN, F, G) fp32
        dp = _batched_dot(do, vh, 2, 2)  # (TN, F, G)
        o = _batched_dot(p.astype(vh.dtype), vh, 2, 1).astype(jnp.float32)
        delta = jnp.sum(do * o, axis=2, keepdims=True)
        ds = p * (dp - delta) * scale  # (TN, F, G) fp32
        dq_ref[:, :, sl] = _batched_dot(ds.astype(kh.dtype), kh, 2, 1).astype(dq_ref.dtype)
        # dk[n, g, d] = sum_f ds[n, f, g] * q[n, f, d]
        dk_ref[:, :, sl] = _batched_dot(ds.astype(qh.dtype), qh, 1, 1).astype(dk_ref.dtype)
        # dv[n, g, d] = sum_f p[n, f, g] * do[n, f, d]
        dv_ref[:, :, sl] = _batched_dot(p.astype(do_ref.dtype), do_ref[:, :, sl], 1, 1).astype(dv_ref.dtype)


def _fwd_call(q2, k2, v2, scale, heads, interpret=False):
    n, f, c = q2.shape
    tn = _tile_rows(n, f, c, 4)
    block = lambda: pl.BlockSpec((tn, f, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=heads, d=c // heads),
        grid=(n // tn,),
        in_specs=[block(), block(), block()],
        out_specs=block(),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q2, k2, v2)


def _bwd_call(q2, k2, v2, do2, scale, heads, interpret=False):
    n, f, c = q2.shape
    tn = _tile_rows(n, f, c, 8)
    block = lambda: pl.BlockSpec((tn, f, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=heads, d=c // heads),
        grid=(n // tn,),
        in_specs=[block(), block(), block(), block()],
        out_specs=[block(), block(), block()],
        out_shape=[jax.ShapeDtypeStruct(q2.shape, q2.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q2, k2, v2, do2)


def _xla_ref(q2, k2, v2, scale, heads):
    """Packed-layout XLA reference (verification + non-TPU fallback)."""
    n, f, c = q2.shape
    d = c // heads
    q = q2.reshape(n, f, heads, d).astype(jnp.float32)
    k = k2.reshape(n, f, heads, d).astype(jnp.float32)
    v = v2.reshape(n, f, heads, d).astype(jnp.float32)
    logits = jnp.einsum("nfhd,nghd->nhfg", q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhfg,nghd->nfhd", p, v)
    return out.reshape(n, f, c).astype(q2.dtype)


# Attention mixes only the F frames within each of the N=b*h*w rows, so the
# row axis shards freely in BOTH directions (no cross-row accumulation
# anywhere — contrast flash_attention's dK/dV); the frame axis f and the
# head-sliced channel axis c must be whole per shard.  Without these rules a
# sharded jit replicates the kernel's operands (see ops/spmd.py).
@functools.partial(
    shard_by_rule(
        "n f c, n f c, n f c -> n f c",
        need_replication=("f", "c"),
        static_argnums=(3, 4, 5),
    ),
)
def _fwd_sharded(q2, k2, v2, scale: float, heads: int, interpret: bool):
    return _fwd_call(q2, k2, v2, scale, heads, interpret=interpret)


@functools.partial(
    shard_by_rule(
        "n f c, n f c, n f c, n f c -> n f c, n f c, n f c",
        need_replication=("f", "c"),
        static_argnums=(4, 5, 6),
    ),
)
def _bwd_sharded(q2, k2, v2, g2, scale: float, heads: int, interpret: bool):
    return _bwd_call(q2, k2, v2, g2, scale, heads, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def temporal_attention(q2, k2, v2, scale: float, heads: int, interpret: bool = False):
    """Fused temporal self-attention on packed (N, F, H*D) tensors."""
    if spmd_kernels_enabled():
        return _fwd_sharded(q2, k2, v2, scale, heads, interpret)
    return _fwd_call(q2, k2, v2, scale, heads, interpret=interpret)


def _vjp_fwd(q2, k2, v2, scale, heads, interpret):
    if spmd_kernels_enabled():
        return _fwd_sharded(q2, k2, v2, scale, heads, interpret), (q2, k2, v2)
    return _fwd_call(q2, k2, v2, scale, heads, interpret=interpret), (q2, k2, v2)


def _vjp_bwd(scale, heads, interpret, res, g):
    q2, k2, v2 = res
    if spmd_kernels_enabled():
        return _bwd_sharded(q2, k2, v2, g.astype(q2.dtype), scale, heads, interpret)
    return _bwd_call(q2, k2, v2, g.astype(q2.dtype), scale, heads, interpret=interpret)


temporal_attention.defvjp(_vjp_fwd, _vjp_bwd)

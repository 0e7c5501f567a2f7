"""Pallas TPU fused attention.

Design notes (TPU-first, not a GPU flash-attention translation):

The spatial self-attention hot path runs at seq <= ~4k tokens with head dims
40/80/160 (SD1.5 channels / 8 heads).  At those sizes the full K/V for one
(batch*head) easily fits VMEM (1536 x 128 fp32 ~ 0.8 MB), so the kernel keeps
K/V resident and tiles only the query axis: per (bh, q-block) step it computes
logits -> stable softmax -> PV entirely on-chip, so the (Sq x Sk) logits never
touch HBM.  This is the memory win flash attention exists for, without the
streaming-softmax bookkeeping that only pays off when K/V exceed VMEM.

Layouts: inputs (B, S, H, D) -> kernel operates on (B*H, S, Dp) with D padded
to the 128-lane boundary.  fp32 softmax accumulation regardless of input
dtype (bf16 in the bench path).

Backward is a custom VJP with the standard dS = P*(dO V^T - rowsum(dO*O))
decomposition, also Pallas, accumulating dK/dV across sequential q-block grid
steps in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synfmc_tpu.ops.spmd import shard_by_rule, spmd_kernels_enabled

# Max K/V rows we allow resident per batch row before falling back to XLA.
# 16384 covers 1024x1024 spatial attention (128x128 latents); 6144 is the
# 512x768 case.  The (BQ, Sk) fp32 intermediates are bounded by the
# KV-aware budget in _pick_block_q below.
_MAX_KV_SEQ = 16384
_LANE = 128


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_supported(q, k, v) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if q.ndim != 4:
        return False
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sk > _MAX_KV_SEQ:
        return False
    if d > 256:
        return False
    # resident K/V must leave VMEM room for the q/o blocks + intermediates
    esize = 2 if q.dtype in (jnp.bfloat16, jnp.float16) else 4
    kv_bytes = 2 * sk * max(h * d, _pad_to(d, _LANE)) * esize
    if kv_bytes > 28 * 1024 * 1024:
        return False
    return True


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, sk: int):
    # block refs carry a leading singleton (bh) dim: q_ref (1, BQ, Dp) etc.
    # Perf-critical structure (PERF.md):
    #  - matmuls take native-dtype (bf16) inputs with fp32 MXU accumulation;
    #    casting to fp32 first would halve MXU throughput for no extra
    #    softmax precision (softmax itself stays fp32);
    #  - the attention scale multiplies q (BQ x D) instead of the logits
    #    (BQ x Sk), and the softmax denominator divides the output (BQ x D)
    #    instead of P (BQ x Sk) — two full-size VPU passes removed.
    q = q_ref[0] * scale
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Sk_p) fp32
    # mask padded kv rows
    if logits.shape[1] != sk:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < sk, logits, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _fwd(q3, k3, v3, scale, block_q, true_sk, interpret=False):
    """q3: (BH, Sq_p, Dp), k3/v3: (BH, Sk_p, Dp) — padded inputs; true_sk
    masks the zero-padded KV rows out of the softmax."""
    bh, sq_p, dp = q3.shape
    sk_p = k3.shape[1]
    grid = (bh, sq_p // block_q)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, sk=true_sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dp), q3.dtype),
        interpret=interpret,
    )(q3, k3, v3)


def _fwd_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int, d: int):
    # Packed-channel layout: refs are (1, S, H*D) — the native Dense output.
    # Loops heads with lane slices, so no XLA-side transpose or D-padding is
    # needed (profiled 4.70 vs 5.29 ms/call for prep+padded kernel at the
    # level-0 shape; PERF.md).
    # scale-on-q + divide-on-output: see _fwd_kernel note (18% measured win
    # at the (32,1536,320) hot shape, PERF.md).
    for h in range(heads):
        qh = q_ref[0, :, h * d : (h + 1) * d] * scale
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        den = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d : (h + 1) * d] = (o / den).astype(o_ref.dtype)


def _fwd_packed(q2, k2, v2, scale, heads, block_q, interpret=False):
    """q2: (B, Sq, H*D); k2/v2: (B, Sk, H*D) — no padding, no transposes."""
    b, sq, c = q2.shape
    sk = k2.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_packed_kernel, scale=scale, heads=heads, d=c // heads),
        grid=(b, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q2, k2, v2)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale: float, sk: int):
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    # Native-dtype (bf16) matmul inputs, fp32 MXU accumulation; softmax and
    # the dS combination stay fp32.  Like the forward, all full-(BQ,Sk)-size
    # scalar passes are folded into (BQ,D)-size ones:
    #   q' = q*scale             -> logits carry the scale, dK = dS^T q'
    #   dO_n = dO/den            -> dP_n = dO_n V^T, dV = pu^T dO_n
    #   dS = pu * (dP_n - rowsum(dO_n*O))   with pu the UNnormalized exp
    #   dQ = (dS K) * scale      (scale applied on the small output)
    q = q_ref[0] * scale  # q' (BQ, Dp)
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if logits.shape[1] != sk:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < sk, logits, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    pu = jnp.exp(logits - m)  # unnormalized probs (BQ, Sk_p) fp32
    den = jnp.sum(pu, axis=1, keepdims=True)
    puc = pu.astype(v.dtype)

    don = do_ref[0].astype(jnp.float32) / den  # dO_n (BQ, Dp) — small
    donc = don.astype(v.dtype)
    dp_ = jax.lax.dot_general(donc, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (BQ, Sk_p)
    ou = jax.lax.dot_general(puc, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # O*den
    delta = jnp.sum(don * ou, axis=1, keepdims=True) / den  # rowsum(dO_n * O)
    ds = pu * (dp_ - delta)  # dlogits' (BQ, Sk_p) fp32
    dsc = ds.astype(k.dtype)

    dq_ref[0] = (jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale).astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    dk_acc[:] += jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Sk_p, Dp); q here is q' so the scale is included
    dv_acc[:] += jax.lax.dot_general(
        puc, donc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(q3, k3, v3, do3, scale, block_q, true_sk, interpret=False):
    bh, sq_p, dp = q3.shape
    sk_p = k3.shape[1]
    grid = (bh, sq_p // block_q)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, sk=true_sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, dp), q3.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, dp), k3.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, dp), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk_p, dp), jnp.float32),
            pltpu.VMEM((sk_p, dp), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3, do3)


def _bwd_packed_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       dk_acc, dv_acc, *, scale: float, heads: int, d: int):
    """Packed-channel backward: per-head lane slices, dK/dV accumulated in
    VMEM scratch across sequential q-block grid steps."""
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # same normalized-gradient folding as _bwd_kernel (see note there)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * scale  # q'
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(logits, axis=1, keepdims=True)
        pu = jnp.exp(logits - m)  # unnormalized, fp32
        den = jnp.sum(pu, axis=1, keepdims=True)
        puc = pu.astype(v.dtype)
        don = do_ref[0, :, sl].astype(jnp.float32) / den
        donc = don.astype(v.dtype)
        dp = jax.lax.dot_general(donc, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ou = jax.lax.dot_general(puc, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(don * ou, axis=1, keepdims=True) / den
        ds = pu * (dp - delta)  # fp32
        dsc = ds.astype(k.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_acc[:, sl] += jax.lax.dot_general(
            puc, donc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_packed_single_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                              *, scale: float, heads: int, d: int):
    """Whole-sequence backward (one q-block per batch row): dK/dV are written
    directly — no cross-step scratch accumulation, which saves three full
    passes over the (Sk, C) accumulators (zero + RMW + copy-out)."""
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * scale  # q'
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(logits, axis=1, keepdims=True)
        pu = jnp.exp(logits - m)
        den = jnp.sum(pu, axis=1, keepdims=True)
        puc = pu.astype(v.dtype)
        don = do_ref[0, :, sl].astype(jnp.float32) / den
        donc = don.astype(v.dtype)
        dp = jax.lax.dot_general(donc, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ou = jax.lax.dot_general(puc, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(don * ou, axis=1, keepdims=True) / den
        ds = pu * (dp - delta)
        dsc = ds.astype(k.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            puc, donc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


# whole-sequence bwd VMEM budget (bytes): 7 bf16 (Sq,C) blocks + fp32 softmax
# intermediates over (Sq,C) ≈ 22 B/elem, PLUS the per-head (Sq,Sq)
# intermediates _bwd_packed_single_kernel materializes (logits/pu/dp/ds fp32 +
# puc/dsc bf16 ≈ 24 B/elem) — without the sq² term, shapes like sq=4096,c=160
# pass the gate yet blow the 100MB vmem limit at compile time.  80MB keeps
# the hot (1536,320) shape (~67MB) on this path under the 100MB vmem limit.
_BWD_SINGLE_MAX_BYTES = 80 * 1024 * 1024


def _bwd_single_fits(sq: int, c: int) -> bool:
    return 22 * sq * c + 24 * sq * sq <= _BWD_SINGLE_MAX_BYTES


def _bwd_packed(q2, k2, v2, do2, scale, heads, block_q, interpret=False):
    b, sq, c = q2.shape
    sk = k2.shape[1]
    if sq == sk and _bwd_single_fits(sq, c):
        block = lambda: pl.BlockSpec((1, sq, c), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_bwd_packed_single_kernel, scale=scale, heads=heads, d=c // heads),
            grid=(b,),
            in_specs=[block(), block(), block(), block()],
            out_specs=[block(), block(), block()],
            out_shape=[jax.ShapeDtypeStruct(q2.shape, q2.dtype)] * 3,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(q2, k2, v2, do2)
    return pl.pallas_call(
        functools.partial(_bwd_packed_kernel, scale=scale, heads=heads, d=c // heads),
        grid=(b, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q2.shape, q2.dtype),
            jax.ShapeDtypeStruct(k2.shape, k2.dtype),
            jax.ShapeDtypeStruct(v2.shape, v2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk, c), jnp.float32),
            pltpu.VMEM((sk, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q2, k2, v2, do2)


# ---------------------------------------------------------------------------
# public API with padding + custom VJP
# ---------------------------------------------------------------------------


def _prep(x):
    """(B, S, H, D) -> (B*H, S_p, D_p) with zero padding."""
    b, s, h, d = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
    sp = _pad_to(s, 8)
    dp = _pad_to(d, _LANE)
    if sp != s or dp != d:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, dp - d)))
    return x


def _unprep(x3, b, s, h, d):
    x3 = x3[:, :s, :d]
    return x3.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _pick_block_q(sq_p: int, sk_p: int | None = None, live: int = 3,
                  kv_bytes: int = 0, scratch_bytes: int = 0) -> int:
    """Largest q-block whose (BQ, Sk) fp32 intermediates stay in budget.

    The kernels materialize ~``live`` full-size (BQ, Sk) fp32 arrays
    (logits/pu/p fwd; logits/pu/dp/ds + bf16 copies bwd) next to the
    VMEM-resident K/V (``kv_bytes``) and any dK/dV accumulators
    (``scratch_bytes``).  For the tuned reference shapes (sk <= 4096) the
    historical unconditional 512 cap is kept; longer sequences (512x768 =
    6144 tokens, 1024x1024 = 16384) shrink BQ so the kernel compiles inside
    the VMEM limit instead of falling back to XLA's materialized-logits
    path (which OOMs HBM at these shapes — on-chip A/B at 6144 showed the
    budget choice is also the fastest, PERF.md).
    """
    cap = 512
    if sk_p is not None and sk_p > 4096:
        budget = max(40 * 1024 * 1024 - kv_bytes - scratch_bytes, 2 * 1024 * 1024)
        cap = max(8, budget // (sk_p * 4 * live))
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if bq <= cap and sq_p % bq == 0:
            return bq
    return sq_p  # no divisor <= cap: single block (grid math needs a divisor)


@functools.partial(
    shard_by_rule(
        # each (b, h) attention row is independent, and fwd q-blocks are too,
        # so b/s/h shard freely; the resident K/V sequence t and the
        # lane-sliced head_dim d must be whole per shard
        "b s h d, b t h d, b t h d -> b s h d",
        need_replication=("t", "d"),
        static_argnums=(3, 4),
    ),
)
def _fwd_sharded(q, k, v, scale: float, interpret: bool):
    return _flash_fwd(q, k, v, scale, interpret)[0]


@functools.partial(
    shard_by_rule(
        # dK/dV accumulate across q-blocks, so the backward also needs the
        # QUERY sequence s whole per shard; b/h still shard freely (the
        # data-parallel training case costs zero collectives)
        "b s h d, b t h d, b t h d, b s h d -> b s h d, b t h d, b t h d",
        need_replication=("s", "t", "d"),
        static_argnums=(4, 5),
    ),
)
def _bwd_sharded(q, k, v, g, scale: float, interpret: bool):
    return _flash_bwd(scale, interpret, (q, k, v), g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, interpret: bool = False):
    if spmd_kernels_enabled():
        return _fwd_sharded(q, k, v, scale, interpret)
    return _flash_fwd(q, k, v, scale, interpret)[0]


def _flash_fwd(q, k, v, scale: float, interpret: bool = False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq % 8 == 0 and sk % 8 == 0:
        # packed-channel kernel: reshapes are free (minor-dim merges)
        q2 = q.reshape(b, sq, h * d)
        k2 = k.reshape(b, sk, h * d)
        v2 = v.reshape(b, sk, h * d)
        esize = 2 if q.dtype in (jnp.bfloat16, jnp.float16) else 4
        bq = _pick_block_q(sq, sk, kv_bytes=2 * sk * h * d * esize)
        o2 = _fwd_packed(q2, k2, v2, scale, h, bq, interpret=interpret)
        return o2.reshape(b, sq, h, d), (q, k, v)
    q3, k3, v3 = _prep(q), _prep(k), _prep(v)
    esize = 2 if q.dtype in (jnp.bfloat16, jnp.float16) else 4
    block_q = _pick_block_q(q3.shape[1], k3.shape[1],
                            kv_bytes=2 * k3.shape[1] * k3.shape[2] * esize)
    o3 = _fwd(q3, k3, v3, scale, block_q, sk, interpret=interpret)
    return _unprep(o3, b, sq, h, d), (q, k, v)


def _flash_bwd(scale, interpret, res, g):
    q, k, v = res
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq % 8 == 0 and sk % 8 == 0:
        esize = 2 if q.dtype in (jnp.bfloat16, jnp.float16) else 4
        bq = _pick_block_q(sq, sk, live=6, kv_bytes=2 * sk * h * d * esize,
                           scratch_bytes=2 * sk * h * d * 4)
        dq2, dk2, dv2 = _bwd_packed(
            q.reshape(b, sq, h * d), k.reshape(b, sk, h * d), v.reshape(b, sk, h * d),
            g.reshape(b, sq, h * d), scale, h, bq, interpret=interpret,
        )
        return (
            dq2.reshape(b, sq, h, d).astype(q.dtype),
            dk2.reshape(b, sk, h, d).astype(k.dtype),
            dv2.reshape(b, sk, h, d).astype(v.dtype),
        )
    q3, k3, v3, g3 = _prep(q), _prep(k), _prep(v), _prep(g)
    esize = 2 if q.dtype in (jnp.bfloat16, jnp.float16) else 4
    block_q = _pick_block_q(q3.shape[1], k3.shape[1], live=6,
                            kv_bytes=2 * k3.shape[1] * k3.shape[2] * esize,
                            scratch_bytes=2 * k3.shape[1] * k3.shape[2] * 4)
    dq3, dk3, dv3 = _bwd(q3, k3, v3, g3, scale, block_q, sk, interpret=interpret)
    return (
        _unprep(dq3, b, sq, h, d).astype(q.dtype),
        _unprep(dk3, b, sk, h, d).astype(k.dtype),
        _unprep(dv3, b, sk, h, d).astype(v.dtype),
    )


def _vjp_fwd(q, k, v, scale, interpret):
    if spmd_kernels_enabled():
        return _fwd_sharded(q, k, v, scale, interpret), (q, k, v)
    return _flash_fwd(q, k, v, scale, interpret)[0], (q, k, v)


def _vjp_bwd(scale, interpret, res, g):
    q, k, v = res
    if spmd_kernels_enabled():
        return _bwd_sharded(q, k, v, g, scale, interpret)
    return _flash_bwd(scale, interpret, (q, k, v), g)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)

"""Large-shape attention MFU study: is head_dim-40 attention pass-bound, and
can lane-packing/head-batching recover it?  (VERDICT r3 #7.)

Target shape: (B=32, S=6144, H=8, D=40) — the 512x768 serving level-0 spatial
attention, where PERF.md measured 39.8% end-to-end MFU and attributed the gap
to 128-lane / 40-dim waste.

The MXU cost model this script tests: a (M,K)x(K,N) matmul with K,N <= 128
costs ~M*ceil(N/128)*ceil(K-passes) cycles INDEPENDENT of how much of the
128-lane tile K or N actually fills.  For attention with D=40:

  QK^T: (S,40)x(40,S)  — cost == the D=128 version (contraction 40/128 used)
  PV:   (S,S)x(S,40)   — cost == the N=128 version (output lanes 40/128 used)

If that model holds, attention wall time at D=40 equals D=128 wall time, and
"nominal-FLOPs MFU" is capped at 40/128 = 31% with NO kernel-level fix:

  - packing 3 heads into the contraction (block-diag Q, K=120) leaves the
    cost ∝ M*N unchanged (same output volume, 2/3 of the block-diag MACs
    are structural zeros);
  - packing 2-3 heads into PV's output lanes via block-diag V doubles or
    triples K for the same N tile — cost again unchanged;
  so every lane-packing rearrangement conserves (output tiles) x (K passes).

A/B design (all on the real chip, bf16, jit-compiled, 20 timed iters):
  1. ours D=40           — the production packed flash kernel
  2. ours D=64 (padded)  — same nominal FLOPs/head-count, half-filled lanes
  3. ours D=128 (padded) — full lanes; equal wall time to (1) CONFIRMS the
                           pass-bound model (the "negative result" bound);
                           materially lower time for (1) would REFUTE it and
                           reopen the packing idea
  4. XLA attention D=40  — einsum+softmax baseline (the fallback path)

Prints one JSON line per variant with wall ms, nominal TFLOP/s, and
lane-adjusted TFLOP/s (nominal * 128/max(D,128-padded...)), plus a verdict
line comparing (1) vs (3).

Usage: python scripts/bench_attn_headdim.py [--b 32 --s 6144 --h 8 --d 40]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, shape, iters=3):
    """Tunnel-correct timing (PERF.md methodology): fresh inputs per run +
    scalar fetch to force completion — the axon tunnel caches identical
    (executable, args) executions and returns early from block_until_ready."""
    from synfmc_tpu.utils.timing import device_time

    def make_args(i):
        ks = jax.random.split(jax.random.PRNGKey(i + 17), 3)
        return tuple(jax.random.normal(k, shape, jnp.bfloat16) for k in ks)

    return device_time(fn, make_args, n_runs=iters)


def xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=6144)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from synfmc_tpu.ops.flash_attention import flash_attention, flash_supported

    b, s, h, d = args.b, args.s, args.heads, args.d
    key = jax.random.PRNGKey(0)
    results = {}

    for name, dd in (("flash_d40", d), ("flash_d64_padded", 64), ("flash_d128_padded", 128)):
        shape = (b, s, h, dd)
        probe = jnp.zeros(shape, jnp.bfloat16)
        if not flash_supported(probe, probe, probe):
            print(json.dumps({"variant": name, "skipped": "flash_supported=False"}),
                  flush=True)
            continue
        fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=1.0 / np.sqrt(d)))
        ms = time_fn(fn, shape, iters=args.iters) * 1e3
        # nominal attention FLOPs: 2 matmuls x 2 MACs
        flops = 4.0 * b * h * s * s * dd
        results[name] = ms
        print(json.dumps({
            "variant": name, "shape": list(shape), "ms": round(ms, 3),
            "nominal_tflops_per_s": round(flops / ms / 1e9, 1),
            "lane_fill": round(min(dd, 128) / 128, 3),
        }), flush=True)

    # XLA einsum+softmax baseline: materializes (B, H, S, S) fp32 logits —
    # 38.7 GB at the target shape, expected to OOM on one chip (the reason
    # the flash kernel exists); report the outcome either way
    try:
        fn = jax.jit(lambda q, k, v: xla_attention(q, k, v, 1.0 / np.sqrt(d)))
        ms = time_fn(fn, (b, s, h, d), iters=args.iters) * 1e3
        flops = 4.0 * b * h * s * s * d
        print(json.dumps({
            "variant": "xla_d40", "shape": [b, s, h, d], "ms": round(ms, 3),
            "nominal_tflops_per_s": round(flops / ms / 1e9, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": "xla_d40", "shape": [b, s, h, d],
            "failed": type(e).__name__,
            "note": "XLA baseline cannot run this shape (full logits tensor); "
                    "the flash kernel is the only viable path",
        }), flush=True)

    if "flash_d40" in results and "flash_d128_padded" in results:
        ratio = results["flash_d128_padded"] / results["flash_d40"]
        verdict = (
            "PASS-BOUND CONFIRMED: D=40 wall time ~= D=128 wall time -> the "
            "lane waste is intrinsic to the MXU pass granularity; no "
            "lane-packing rearrangement can beat it (cost conserves output "
            "tiles x contraction passes)"
            if ratio < 1.35 else
            "PASS-BOUND REFUTED: D=128 is materially slower than D=40 -> "
            "the kernel is NOT pass-bound at D=40; a packing variant could win"
        )
        print(json.dumps({
            "verdict": verdict,
            "d128_over_d40_time_ratio": round(ratio, 3),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Isolated 3x3-conv microbenchmark at the UNet's hot shapes.

The exact-path inference profile is conv-bound (PERF.md: 48.9 ms of 124.3 ms),
so the remaining exact-path headroom lives or dies on beating XLA's conv
emitter.  This bench measures, on the real chip, per conv level of the SD1.5
UNet at our production latent size (B = 2 CFG x 16 frames = 32, 256x384 px):

  xla-bf16    lax.conv_general_dilated, bf16 in / fp32 accumulate (the
              production path inside flax nn.Conv)
  xla-int8    same conv with int8 inputs + weights, int32 accumulate —
              probes whether XLA:TPU engages the MXU's 2x int8 peak
  im2col-bf16 explicit 9-tap patch matrix + one jnp.dot — probes whether
              K-dim packing (9C vs C) explains XLA's conv efficiency

Timing: each variant runs inside ONE lax.scan of --iters steps (fresh input
fed once; the scan body perturbs the input each step), with a scalar host
fetch — honest under the axon tunnel (see synfmc_tpu/utils/timing.py).

Usage: python scripts/bench_conv.py [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, C) at each UNet level for 256x384 latents (32x48), C_out == C.
LEVELS = [
    ("L0", 32, 48, 320),
    ("L1", 16, 24, 640),
    ("L2", 8, 12, 1280),
    ("L3", 4, 6, 1280),
]
B = 32  # 2 (CFG) x 16 frames, frame-folded


def conv_flops(h: int, w: int, c: int) -> float:
    return 2.0 * B * h * w * c * c * 9


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def xla_conv_native(x, w):
    """Same-dtype output (what flax nn.Conv with dtype=bf16 emits)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def im2col_conv(x, w):
    """9 shifted views concatenated on C -> one (M, 9C) @ (9C, C_out) dot."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy:dy + h, dx:dx + wd, :]
        for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1).reshape(b * h * wd, 9 * c)
    wm = w.reshape(9 * c, -1)
    y = jnp.dot(patches, wm, preferred_element_type=jnp.float32)
    return y.reshape(b, h, wd, -1)


# --- Winograd F(2x2, 3x3): the algorithmic lever -------------------------
# Direct conv does 2*9*M*C*K FLOPs; Winograd's 16 batched GEMMs do
# 2*16*(M/4)*C*K = 4/9 of that (2.25x fewer multiplies), so its *effective*
# throughput (counted against direct-conv FLOPs) can exceed the measured
# 86.5 TF/s dependent-chain MXU ceiling.  bf16 tiles / f32 accumulate; the
# transform matrices are exact in bf16 (entries 0, +-1, +-0.5).
_BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
# combined 2D transforms, tile dims flattened row-major
_T_IN = np.einsum("pa,qb->pqab", _BT, _BT).reshape(16, 16)
_T_OUT = np.einsum("ip,jq->ijpq", _AT, _AT).reshape(4, 16)


def winograd_weights(w):
    """(3,3,C,K) -> (16,C,K) transformed weights (precomputed: static at inference)."""
    u = jnp.einsum("pa,qb,abck->pqck", _G, _G, w.astype(jnp.float32))
    return u.reshape(16, w.shape[2], w.shape[3]).astype(w.dtype)


def winograd_conv(x, u):
    """same-padded 3x3 conv via F(2x2,3x3); x (B,H,W,C) with even H,W; u (16,C,K)."""
    b, h, wd, c = x.shape
    th, tw = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 16 stride-2 taps: tile (i,j) element (a,b) = xp[:, 2i+a, 2j+b, :]
    taps = [
        xp[:, a:a + 2 * th:2, bb:bb + 2 * tw:2, :].reshape(b * th * tw, c)
        for a in range(4) for bb in range(4)
    ]
    v = jnp.stack(taps)  # (16, M, C)
    vt = jnp.einsum("px,xmc->pmc", jnp.asarray(_T_IN, x.dtype), v)
    m = jax.lax.dot_general(
        vt, u, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (16, M, K): the FLOP core — 16 batched GEMMs
    y4 = jnp.einsum("op,pmk->omk", jnp.asarray(_T_OUT, np.float32), m)  # (4, M, K)
    k = y4.shape[-1]
    y = y4.reshape(2, 2, b, th, tw, k).transpose(2, 3, 0, 4, 1, 5).reshape(b, h, wd, k)
    return y


def timed_scan(conv_fn, x, w, iters: int) -> float:
    """Wall seconds for `iters` convs CHAINED in one lax.scan.

    The output of step t is the input of step t+1 (C_in == C_out and same
    spatial dims at every level, so shapes chain).  This is the only consumer
    shape we found that measures honestly: a sliced consumer lets XLA push the
    slice through the conv (334% "peak" observed), and a full-sum consumer
    triggers a pathological fusion of the index-perturb + convert+reduce that
    slows a 4096^3 matmul 15x (30.8 vs 2.0 ms/iter, probed on-chip).  Chaining
    forces every step's full output and adds only a per-step cast back to the
    input dtype.
    """

    def body(carry, _):
        y = conv_fn(carry, w)
        return y.astype(x.dtype), None

    def run(x0):
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    fn = jax.jit(run)
    float(fn(x))  # warmup/compile
    times = []
    for k in range(1, 4):
        # fresh value each run -> no tunnel result-cache
        xk = x + jnp.full((), k, x.dtype)
        float(jnp.sum(xk))  # materialize the input before the clock starts
        t0 = time.time()
        float(fn(xk))
        times.append(time.time() - t0)
    # best-of-3: first fresh-value run can pay a one-off tunnel/program-load
    # cost of ~0.5 s that is not steady-state throughput
    return min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    print(f"backend={jax.default_backend()}  B={B}  iters={args.iters}")
    # Harness sanity: a 4096^3 bf16 matmul (137 GFLOP) should land near peak.
    km = jax.random.PRNGKey(1)
    a = jax.random.normal(km, (4096, 4096), jnp.bfloat16)
    bm = jax.random.normal(km, (4096, 4096), jnp.bfloat16)
    sec = timed_scan(lambda x, w: jnp.dot(x, w), a, bm, args.iters)
    tfs = 2 * 4096**3 / (sec / args.iters) / 1e12
    print(f"sanity matmul 4096^3: {sec / args.iters * 1e3:.3f} ms = {tfs:.1f} TFLOP/s ({100 * tfs / 197:.1f}% peak)")
    header = f"{'level':6} {'variant':14} {'ms/conv':>9} {'TFLOP/s':>9} {'%peak':>7}"
    print(header)
    for name, h, wd, c in LEVELS:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        xf = jax.random.normal(kx, (B, h, wd, c), jnp.bfloat16)
        wf = jax.random.normal(kw, (3, 3, c, c), jnp.bfloat16) * 0.02
        xi8 = jax.random.randint(kx, (B, h, wd, c), -127, 127, jnp.int8)
        wi8 = jax.random.randint(kw, (3, 3, c, c), -127, 127, jnp.int8)
        fl = conv_flops(h, wd, c)
        uf = winograd_weights(wf)
        # correctness: winograd vs f32 direct conv, relative error
        ref = xla_conv(xf.astype(jnp.float32), wf.astype(jnp.float32))
        got = winograd_conv(xf, uf)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"{name:6} winograd max rel err vs f32 direct: {rel:.2e}")
        for vname, fn, x, w, peak in [
            ("xla-bf16-f32o", xla_conv, xf, wf, 197e12),
            ("xla-bf16", xla_conv_native, xf, wf, 197e12),
            ("xla-int8", xla_conv_native, xi8, wi8, 394e12),
            ("im2col-bf16", im2col_conv, xf, wf, 197e12),
            ("winograd-bf16", winograd_conv, xf, uf, 197e12),
        ]:
            try:
                sec = timed_scan(fn, x, w, args.iters)
                ms = sec / args.iters * 1e3
                tfs = fl / (sec / args.iters) / 1e12
                print(f"{name:6} {vname:14} {ms:9.3f} {tfs:9.1f} {100 * tfs * 1e12 / peak:6.1f}%")
            except Exception as e:  # int8 conv may be unsupported on some backends
                print(f"{name:6} {vname:14} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

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


def timed_scan(conv_fn, x, w, iters: int) -> float:
    """Wall seconds for `iters` convs chained in one lax.scan."""

    def body(carry, i):
        xi = x + (i.astype(x.dtype) if x.dtype != jnp.int8 else 0) * 1e-6
        y = conv_fn(xi, w)
        # fold the output back into a scalar carry so no step is dead code
        return carry + jnp.sum(y[0, 0, 0, :8].astype(jnp.float32)), None

    fn = jax.jit(lambda x0: jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))[0])
    out = fn(x)  # warmup/compile
    float(out)
    t0 = time.time()
    out = fn(x * (1 + 1e-6) if x.dtype != jnp.int8 else x)  # fresh value -> no tunnel cache
    float(out)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    print(f"backend={jax.default_backend()}  B={B}  iters={args.iters}")
    header = f"{'level':6} {'variant':12} {'ms/conv':>9} {'TFLOP/s':>9} {'%peak':>7}"
    print(header)
    for name, h, wd, c in LEVELS:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        xf = jax.random.normal(kx, (B, h, wd, c), jnp.bfloat16)
        wf = jax.random.normal(kw, (3, 3, c, c), jnp.bfloat16) * 0.02
        xi8 = jax.random.randint(kx, (B, h, wd, c), -127, 127, jnp.int8)
        wi8 = jax.random.randint(kw, (3, 3, c, c), -127, 127, jnp.int8)
        fl = conv_flops(h, wd, c)
        for vname, fn, x, w, peak in [
            ("xla-bf16", xla_conv, xf, wf, 197e12),
            ("xla-int8", xla_conv, xi8, wi8, 394e12),
            ("im2col-bf16", im2col_conv, xf, wf, 197e12),
        ]:
            try:
                sec = timed_scan(fn, x, w, args.iters)
                ms = sec / args.iters * 1e3
                tfs = fl / (sec / args.iters) / 1e12
                print(f"{name:6} {vname:12} {ms:9.3f} {tfs:9.1f} {100 * tfs * 1e12 / peak:6.1f}%")
            except Exception as e:  # int8 conv may be unsupported on some backends
                print(f"{name:6} {vname:12} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

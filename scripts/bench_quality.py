"""Fidelity of the opt-in serving accelerations vs the exact DDIM path.

The cache modes (DeepCache, CFG-cache, combined "turbo") and the
DPM-Solver++(2M) solver trade fidelity or solver order for throughput.
PERF.md quotes their speedups; this script quantifies the OTHER side of the
trade on the flagship model with randomly initialized weights: for each mode
it runs the full denoise loop from the same seed and reports the deviation
of the final latents from the exact 25-step DDIM output.

Caveat (same as bench.py's measured-weights line): without the real SD1.5/
AnimateDiff checkpoints (absent from this env) the epsilon field is a
random-init network, not a trained one, so these numbers characterize the
NUMERICS of the approximation (how far the cached trajectory drifts), not
perceptual quality.  The mechanism equality tests (tests/test_pipeline.py)
pin that each mode computes exactly what it claims; this adds the measured
drift.

Metrics per mode:
  rel_l2 = ||x - x_exact||_2 / ||x_exact||_2
  psnr   = 10 log10(range(x_exact)^2 / mse), clamped to 99 (strict-JSON safe)

Output: one JSON line per mode on stdout.

Usage:
  python scripts/bench_quality.py            # flagship (TPU)
  python scripts/bench_quality.py --tiny     # tiny model (CPU CI)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)

import jax
import jax.numpy as jnp


def psnr_vs(x, ref) -> float:
    mse = float(jnp.mean((x.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2))
    rng = float(jnp.max(ref) - jnp.min(ref))
    if mse == 0.0:
        return 99.0
    return min(99.0, 10.0 * float(jnp.log10(rng * rng / mse)))


def rel_l2(x, ref) -> float:
    num = float(jnp.linalg.norm((x - ref).astype(jnp.float32).ravel()))
    den = float(jnp.linalg.norm(ref.astype(jnp.float32).ravel()))
    return num / max(den, 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU CI)")
    ap.add_argument("--steps", type=int, default=25)
    args = ap.parse_args()

    from synfmc_tpu.diffusion import DiffusionSchedule
    from synfmc_tpu.models.adapter import ObjectAdapter  # noqa: F401 (parity of surface)
    from synfmc_tpu.models.unet3d import UNet3D
    from synfmc_tpu.pipelines.animation import denoise_loop

    if args.tiny:
        chs, heads, xdim = (32, 64, 128, 128), 4, 64
        f, hl, wl = 4, 8, 16
        dtype = jnp.float32
    else:
        chs, heads, xdim = (320, 640, 1280, 1280), 8, 768
        f, hl, wl = 16, 32, 48
        dtype = jnp.bfloat16

    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, camera_cond=True, lora_rank=2, dtype=dtype,
    )
    schedule = DiffusionSchedule.from_config()

    b = 1
    key = jax.random.PRNGKey(0)
    k_lat, k_ctx, k_pose, k_init = jax.random.split(key, 4)
    latents = (
        jax.random.normal(k_lat, (b, f, hl, wl, 4), jnp.float32)
        * schedule.init_noise_sigma
    )
    ctx = jax.random.normal(k_ctx, (2 * b, 77, xdim), dtype) * 0.5
    pose = [
        jax.random.normal(k_pose, (b, f, hl // 2**i, wl // 2**i, c), dtype) * 0.02
        for i, c in enumerate(chs)
    ]
    traj = [p * 0.5 for p in pose]

    # Real random-init weights: the drift measurement needs a non-degenerate
    # epsilon field (zeros would make every mode trivially exact).
    params = unet.init(
        k_init,
        jnp.zeros((2 * b, f, hl, wl, 4), dtype),
        jnp.zeros((2 * b,), jnp.int32),
        ctx,
        pose_features=[jnp.concatenate([p, p]) for p in pose],
        traj_features=[jnp.concatenate([t, t]) for t in traj],
    )

    def run(steps=args.steps, **kw):
        out = denoise_loop(
            unet, params, schedule, latents, ctx,
            pose_features=pose, traj_features=traj,
            num_inference_steps=steps, **kw,
        )
        return jax.block_until_ready(out)

    exact = run()
    half = max(2, args.steps // 2)
    modes = [
        ("exact_ddim", {}),
        ("deepcache_2", {"deepcache_interval": 2}),
        ("deepcache_3", {"deepcache_interval": 3}),
        ("cfg_cache_2", {"cfg_cache_interval": 2}),
        ("cfg_cache_3", {"cfg_cache_interval": 3}),
        ("turbo_2", {"deepcache_interval": 2, "cfg_cache_interval": 2}),
        ("turbo_3", {"deepcache_interval": 3, "cfg_cache_interval": 3}),
        # Same step count, second-order solver: reported as solver difference,
        # not cache drift (it converges to a DIFFERENT, more accurate ODE
        # solution than DDIM at equal steps).
        ("dpmpp_2m", {"solver": "dpmpp_2m"}),
        # the advertised latency halvings: dpmpp at half the steps, alone and
        # composed with the turbo caches — drift still reported vs exact
        # full-step DDIM (the reference-parity trajectory)
        (f"dpmpp_2m_{half}steps", {"steps": half, "solver": "dpmpp_2m"}),
        (f"dpmpp_turbo3_{half}steps",
         {"steps": half, "solver": "dpmpp_2m",
          "deepcache_interval": 3, "cfg_cache_interval": 3}),
    ]
    for name, kw in modes:
        out = run(**kw)
        print(json.dumps({
            "mode": name,
            "steps": kw.get("steps", args.steps),
            "rel_l2_vs_exact": round(rel_l2(out, exact), 6),
            "psnr_latent_db": round(psnr_vs(out, exact), 2),
        }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AOT serving export: serialize the full generation program with jax.export.

Packages the whole serving path — CLIP text encode, camera pose encode,
CFG DDIM denoise loop (with optional DeepCache), frame-wise VAE decode —
as ONE portable StableHLO artifact that a serving process can deserialize
and call without any model code, Python tracing, or recompilation risk.
Multi-platform lowering (``--platforms tpu,cpu``) produces a single
artifact runnable on both.

The artifact takes (params, input_ids, latents, plucker) as call-time
inputs, so weights stay in ordinary checkpoints and one artifact serves
every fine-tune.  This is the TPU-native analog of torch.export/TensorRT
engines — the reference has no serving story at all.

  # export (tiny CI scale)
  python scripts/export_serving.py --tiny --cpu --out /tmp/fmc_serve.bin

  # verify: deserialize and run against the live-traced program
  python scripts/export_serving.py --tiny --cpu --out /tmp/fmc_serve.bin --verify
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)

TINY = dict(
    block_out_channels=[32, 64, 128, 128], cross_attention_dim=32, attn_heads=4,
    vae_channels=[32, 32, 32, 32],
    text=dict(vocab_size=49408, hidden_size=32, num_layers=1, num_heads=2),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu — default: current backend only")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--num-inference-steps", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=8.0)
    p.add_argument("--deepcache", type=int, default=1)
    p.add_argument("--cfg-cache", type=int, default=1)
    p.add_argument("--solver", choices=("ddim", "dpmpp_2m"), default="ddim")
    p.add_argument("--verify", action="store_true",
                   help="deserialize the artifact and check it matches the live program")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )

    import jax.numpy as jnp
    import numpy as np
    from jax import export

    from synfmc_tpu.config import ConfigDict
    from synfmc_tpu.diffusion import DiffusionSchedule
    from synfmc_tpu.pipelines.animation import decode_latents, denoise_loop
    from synfmc_tpu.training.trainers import build_models, init_params

    h = args.height or (64 if args.tiny else 256)
    w = args.width or (128 if args.tiny else 384)
    f = args.frames or (4 if args.tiny else 16)
    steps = args.num_inference_steps or (2 if args.tiny else 25)
    hl, wl = h // 8, w // 8

    cfg = ConfigDict({"unet_additional_kwargs": {"use_motion_module": True}})
    if args.tiny:
        cfg["model_overrides"] = TINY
    models = build_models(cfg, "cam", dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    params = init_params(models, cfg, "cam", jax.random.PRNGKey(0), (h, w), f)
    schedule = DiffusionSchedule.from_config()
    unet, vae, text, pose_enc = models["unet"], models["vae"], models["text"], models["pose_encoder"]

    def serve(params, input_ids, latents, plucker):
        """(B) uncond+cond ids (2B,77), init latents (B,F,hl,wl,4), Plücker
        video (B,F,H,W,6) -> frames (B,F,H,W,3) in [0,1]."""
        context = text.apply({"params": params["text"]}, input_ids)
        pose_features = pose_enc.apply({"params": params["pose_encoder"]}, plucker)
        lat = denoise_loop(
            unet, {"params": params["unet"]}, schedule, latents, context,
            pose_features=pose_features, num_inference_steps=steps,
            guidance_scale=args.guidance_scale, deepcache_interval=args.deepcache,
            cfg_cache_interval=args.cfg_cache, solver=args.solver,
        )
        return decode_latents(vae, {"params": params["vae"]}, lat)

    b = 1
    sample_args = (
        params,
        jnp.zeros((2 * b, 77), jnp.int32),
        jnp.zeros((b, f, hl, wl, 4), jnp.float32),
        jnp.zeros((b, f, h, w, 6), jnp.float32),
    )
    platforms = args.platforms.split(",") if args.platforms else None
    exp = export.export(jax.jit(serve), platforms=platforms)(*sample_args)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as fh:
        fh.write(blob)
    report = {
        "out": args.out, "bytes": len(blob), "platforms": list(exp.platforms),
        "in_avals": len(exp.in_avals), "height": h, "width": w, "frames": f,
        "num_inference_steps": steps, "deepcache_interval": args.deepcache,
        "cfg_cache_interval": args.cfg_cache, "solver": args.solver,
    }

    if args.verify:
        with open(args.out, "rb") as fh:
            back = export.deserialize(fh.read())
        rng = jax.random.PRNGKey(7)
        lat0 = jax.random.normal(rng, (b, f, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
        ids = jnp.ones((2 * b, 77), jnp.int32)
        plk = jax.random.normal(jax.random.PRNGKey(8), (b, f, h, w, 6), jnp.float32) * 0.1
        got = back.call(params, ids, lat0, plk)
        want = jax.jit(serve)(params, ids, lat0, plk)
        err = float(jnp.abs(got - want).max())
        report["verify_max_err"] = err
        report["verify_ok"] = bool(err < 1e-4 and np.isfinite(np.asarray(got)).all())
    print(json.dumps(report))
    if args.verify and not report["verify_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

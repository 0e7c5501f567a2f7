#!/usr/bin/env python
"""Full-scale stage-2 train-step timing on the real chip.

Builds the exact trainer configuration (configs/cam.yaml: bf16 compute,
fp32 params/optimizer, remat, masked+inverted loss, camera CFG dropout,
Plücker on-device) with zero-value params (throughput is weight-value
independent) and times the single jitted train step with fresh pixel
inputs per run + a scalar loss fetch, per the PERF.md methodology.

Exercises the packed-channel Pallas attention forward AND backward
(ops/flash_attention.py, ops/temporal_attention.py) end-to-end.

  python scripts/bench_train.py [--steps 4]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--remat", choices=["full", "dots", "none"], default="none",
                   help="gradient-checkpointing mode: none (the production "
                        "default — fits b=1 full scale and is 17% faster), "
                        "dots-saveable, or full recompute (min memory)")
    args = p.parse_args()

    from synfmc_tpu.config import load_config
    from synfmc_tpu.diffusion import DiffusionSchedule
    from synfmc_tpu.training.optim import make_optimizer
    from synfmc_tpu.training.params import partition_params, stage2_cmc_unet_trainable
    from synfmc_tpu.training.steps import StepConfig, TrainState, make_cam_train_step
    from synfmc_tpu.training.trainers import build_models

    config = load_config(os.path.join(os.path.dirname(__file__), "..", "configs", "cam.yaml"))
    h, w = args.height, args.width
    b, f = args.batch, args.frames
    models = build_models(config, "cam", dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.from_config(**(config.get("noise_scheduler_kwargs") or {}))
    tx = make_optimizer(1e-4, max_grad_norm=1.0, lr_scheduler="constant",
                        lr_warmup_steps=0, max_train_steps=100)
    step_cfg = StepConfig(
        apply_masked_loss=True, invert_loss_mask=True,
        mask_loss_weight=float(config.get("mask_loss_weight", 1.0)),
        sd_loss_weight=float(config.get("sd_loss_weight", 0.6)),
        sample_height=h, sample_width=w,
        remat=args.remat != "none",
        remat_policy=args.remat if args.remat != "none" else "full",
    )

    hl, wl = h // 8, w // 8
    chs = models["unet"].block_out_channels
    xdim = models["unet"].cross_attention_dim
    pose_feats = [jnp.zeros((1, f, hl // 2**i, wl // 2**i, c)) for i, c in enumerate(chs)]

    t0 = time.time()
    shapes = {
        "unet": jax.eval_shape(
            lambda r: models["unet"].init(
                r, jnp.zeros((1, f, hl, wl, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, xdim)), pose_features=pose_feats),
            jax.random.PRNGKey(0)),
        "pose_encoder": jax.eval_shape(
            lambda r: models["pose_encoder"].init(r, jnp.zeros((1, f, h, w, 6))),
            jax.random.PRNGKey(1)),
        "vae": jax.eval_shape(
            lambda r: models["vae"].init(r, jnp.zeros((1, h, w, 3)), jax.random.PRNGKey(9)),
            jax.random.PRNGKey(2)),
        "text": jax.eval_shape(
            lambda r: models["text"].init(r, jnp.zeros((1, 77), jnp.int32)),
            jax.random.PRNGKey(3)),
    }
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {k: v["params"] for k, v in params.items()}
    print(f"# params built in {time.time()-t0:.1f}s", file=sys.stderr)

    t_unet, f_unet = partition_params(params["unet"], stage2_cmc_unet_trainable)
    trainable = {"unet": t_unet, "pose_encoder": params["pose_encoder"]}
    frozen = {"unet": f_unet, "vae": {"params": params["vae"]}, "text": {"params": params["text"]}}
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
    print(f"# trainable: {n_train/1e6:.1f}M", file=sys.stderr)

    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=tx.init(trainable))
    step_fn = jax.jit(
        make_cam_train_step(models["unet"], models["pose_encoder"], models["vae"],
                            models["text"], schedule, tx, step_cfg),
        donate_argnums=(0,),
    )

    def make_batch(i):
        k = jax.random.PRNGKey(1000 + i)
        return {
            "pixel_values": jax.random.normal(k, (b, f, h, w, 3), jnp.float32) * 0.5,
            "input_ids": jnp.ones((b, 77), jnp.int32),
            "background_ids": jnp.ones((b, 77), jnp.int32),
            "null_ids": jnp.ones((77,), jnp.int32),
            "camera_rt": jnp.tile(jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32), (b, f, 1)),
            "intrinsics": jnp.tile(jnp.asarray([24.0, 36.0, 0.0, 0.0], jnp.float32), (b, f, 1)),
            "obj_union_mask": jnp.ones((b, f, h, w, 1), jnp.float32) * 0.5,
        }

    t0 = time.time()
    state, metrics = step_fn(state, frozen, make_batch(-1), jax.random.PRNGKey(7))
    _ = float(metrics["loss"])
    print(f"# compile+warm step: {time.time()-t0:.1f}s loss={float(metrics['loss']):.4f}",
          file=sys.stderr)

    times = []
    for i in range(args.steps):
        batch = make_batch(i)
        _ = float(jnp.sum(batch["pixel_values"][0, 0, 0, 0]))  # materialize
        t0 = time.time()
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(100 + i))
        _ = float(metrics["loss"])  # force completion
        times.append(time.time() - t0)

    # hardware-FLOPs utilization from XLA's cost analysis of the compiled
    # step (single executable, no loop -> exact executed-FLOP count; remat
    # recompute IS counted, so this is hw utilization, >= model-MFU)
    extra = {}
    try:
        from bench import compiled_flops, peak_tflops  # repo-root bench.py helpers

        lowered = jax.jit(
            make_cam_train_step(models["unet"], models["pose_encoder"], models["vae"],
                                models["text"], schedule, tx, step_cfg),
        ).lower(state, frozen, make_batch(0), jax.random.PRNGKey(0))
        fl = compiled_flops(lowered.compile())
        if fl:
            tflops_s = fl / min(times) / 1e12
            extra["step_gflops"] = round(fl / 1e9, 1)
            extra["tflops_per_s"] = round(tflops_s, 1)
            peak = peak_tflops()
            if peak:
                extra["hw_util"] = round(tflops_s / peak, 3)
            print(f"# hw util: {fl/1e9:.0f} GFLOP/step / {min(times):.3f}s = "
                  f"{tflops_s:.1f} TFLOP/s"
                  + (f" = {tflops_s/peak*100:.1f}% of {peak:.0f} peak" if peak else ""),
                  file=sys.stderr)
    except Exception as e:
        print(f"# hw-util computation failed: {e}", file=sys.stderr)

    suffix = "" if args.remat == "none" else f"_remat_{args.remat}"
    print(json.dumps({
        "metric": f"stage2_cam_train_step_seconds_b1_16f_256x384{suffix}",
        "value": round(min(times), 3),
        "unit": "s/step",
        "all_times": [round(t, 3) for t in times],
        **extra,
    }))


if __name__ == "__main__":
    main()

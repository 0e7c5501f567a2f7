#!/usr/bin/env python
"""Generation CLI: camera/object-conditioned video synthesis from checkpoints.

Covers the reference's inference surface (its generation happens inside the
training validation loops; this exposes it standalone):

  python scripts/generate.py --config configs/cam.yaml \
      --prompt "a girl is walking" \
      --lora-ckpt lora.ckpt --cm-ckpt cmcm.ckpt [--omcm-ckpt omcm.ckpt] \
      --camera-txt path/to/camera.txt --out out.gif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--prompt", action="append", required=True)
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--lora-ckpt", default=None)
    p.add_argument("--cm-ckpt", default=None, help="stage-2 CMC bundle")
    p.add_argument("--omcm-ckpt", default=None, help="stage-3 OMC bundle")
    p.add_argument("--camera-txt", default=None, help="camera label txt for the trajectory")
    p.add_argument("--obj-traj-npz", default=None,
                   help="object trajectories for OMC: npz with obj_info (F,O,12) "
                        "camera-relative poses and obj_masks (F,O,H,W) in [0,1] "
                        "(e.g. dumped from UnrealTrajVideoDataset."
                        "create_validation_sample)")
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--guidance-scale", type=float, default=8.0)
    p.add_argument("--video-length", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="output/generated.gif")
    p.add_argument("--cpu", action="store_true", help="force CPU backend (tests)")
    p.add_argument("--allow-untrained-cm", action="store_true",
                   help="bypass the stage-3 trained-CMC requirement (smoke tests "
                        "only; without it, --omcm-ckpt requires --cm-ckpt)")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard generation over an N-device 'data' mesh "
                        "(prompt batch must divide N; params replicated)")
    p.add_argument("--frame-parallel", type=int, default=0, metavar="S",
                   help="sequence-parallel serving: shard the FRAME axis over "
                        "an S-way 'sp' mesh axis so a SINGLE clip scales "
                        "across chips (the CFG pair rides a 2*batch 'data' "
                        "axis; total devices = 2*batch*S; frames % S == 0)")
    p.add_argument("--deepcache", type=int, default=1, metavar="N",
                   help="DeepCache interval: deep UNet levels refresh every Nth "
                        "denoise step (1 = exact, >1 trades fidelity for speed)")
    p.add_argument("--cfg-cache", type=int, default=1, metavar="N",
                   help="CFG-cache interval: recompute the uncond CFG branch "
                        "every Nth step only (1 = exact; mutually exclusive "
                        "with --deepcache > 1)")
    p.add_argument("--turbo", type=int, default=0, metavar="N",
                   help="shorthand for --deepcache N --cfg-cache N (the "
                        "composed cache mode, PERF.md: ~2x steps/s at N=3)")
    p.add_argument("--decode-chunk", type=int, default=1, metavar="K",
                   help="VAE-decode K frames per step instead of 1 (same "
                        "math — the VAE is frame-independent — but batched "
                        "convs fill the MXU; memory scales with K)")
    p.add_argument("--solver", choices=("ddim", "dpmpp_2m"), default="ddim",
                   help="denoise solver: 'ddim' (reference parity) or "
                        "'dpmpp_2m' (2nd-order DPM-Solver++: comparable "
                        "quality in roughly half the steps, e.g. "
                        "--solver dpmpp_2m --num-inference-steps 12)")
    args = p.parse_args()
    if args.turbo:
        args.deepcache = args.cfg_cache = args.turbo

    import jax

    if args.cpu:
        # env var too: enable_compile_cache re-asserts the platform from it
        # (remote-TPU plugin workaround) and keys the cache dir off it
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    # repeat invocations skip the ~100 s flagship compile (PERF.md)
    from synfmc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from synfmc_tpu.config import load_config
    from synfmc_tpu.geometry.plucker import plucker_embedding
    from synfmc_tpu.pipelines.factory import build_pipeline
    from synfmc_tpu.utils.video import save_videos_grid

    config = load_config(args.config)
    pipe, info = build_pipeline(
        config,
        seed=args.seed, video_length=args.video_length,
        lora_ckpt=args.lora_ckpt, cm_ckpt=args.cm_ckpt, omcm_ckpt=args.omcm_ckpt,
        allow_untrained_cm=args.allow_untrained_cm,
        data_parallel=args.data_parallel, frame_parallel=args.frame_parallel,
        batch=len(args.prompt),
    )
    models = info["models"]

    h, w = info["sample_size"]
    f = args.video_length
    plucker = None
    if "pose_encoder" in models:
        b = len(args.prompt)
        if args.camera_txt:
            from synfmc_tpu.evaluation.metrics import parse_camera_txt

            intr, rts = parse_camera_txt(args.camera_txt)
            c2w = np.tile(np.eye(4, dtype=np.float32), (len(rts), 1, 1))
            c2w[:, :3, :] = rts
            intr = jnp.asarray(np.tile(intr[None], (b, 1, 1)), jnp.float32)
            c2w = jnp.asarray(np.tile(c2w[None], (b, 1, 1, 1)), jnp.float32)
        else:
            intr = jnp.broadcast_to(jnp.asarray([w, h, 0, 0], jnp.float32), (b, f, 4))
            c2w = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, f, 4, 4))
        plucker = plucker_embedding(intr, c2w, h, w)

    traj_features = None
    if args.obj_traj_npz:
        assert args.omcm_ckpt, "--obj-traj-npz requires --omcm-ckpt"
        from synfmc_tpu.utils.traj_features import rasterize_traj_features

        rec = np.load(args.obj_traj_npz)
        obj_info = jnp.asarray(rec["obj_info"], jnp.float32)[None]  # (1,F,O,12)
        masks = jnp.asarray(rec["obj_masks"], jnp.float32)[None]  # (1,F,O,H,W)
        traj_r, mask_r = rasterize_traj_features(obj_info, masks)
        feats = jnp.concatenate([traj_r, mask_r], axis=-1) * mask_r
        fb, ff = feats.shape[:2]
        traj_features = pipe.encode_traj(
            feats.reshape(fb * ff, *feats.shape[2:]),
            mask_r.reshape(fb * ff, *mask_r.shape[2:]), ff,
        )
        if len(args.prompt) > 1:
            traj_features = [jnp.tile(t, (len(args.prompt), 1, 1, 1, 1)) for t in traj_features]

    video = pipe(
        args.prompt, video_length=f, height=h, width=w,
        num_inference_steps=args.num_inference_steps, guidance_scale=args.guidance_scale,
        negative_prompts=args.negative_prompt, rng=jax.random.PRNGKey(args.seed),
        plucker=plucker, traj_features=traj_features,
        omcm_min_step=int(config.get("omcm_min_step", 700)),
        deepcache_interval=args.deepcache,
        cfg_cache_interval=args.cfg_cache,
        solver=args.solver,
        decode_chunk=args.decode_chunk,
    )
    save_videos_grid(np.asarray(video), args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

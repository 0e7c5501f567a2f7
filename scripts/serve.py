#!/usr/bin/env python
"""Minimal production serving daemon for camera/object-controlled video.

The reference has no serving story (its pipelines run only inside training
validation); this daemon wraps the same AnimationPipeline the CLI uses
behind a dependency-free HTTP API, with the compile done once at startup
(optional --warmup) and requests serialized onto the chip.

  python scripts/serve.py --config configs/cam.yaml --cm-ckpt ... \
      [--turbo 3] [--solver dpmpp_2m] [--port 8000] [--warmup]

  GET  /healthz            -> {"status": "ok", ...}
  POST /generate           -> image/gif bytes
       JSON body: {"prompt": "a red car drives" | [...],
                   "num_inference_steps": 25, "guidance_scale": 8.0,
                   "seed": 42, "video_length": 16,
                   "camera_txt": "<camera label txt content>"}  # optional

camera_txt uses the reference's camera label txt format (the same file
format train_cam_ctrl.py:41-74 dumps and generate.py --camera-txt reads);
omitted -> a neutral straight-ahead trajectory.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _build(args):
    import jax

    if args.cpu:
        # env var too: enable_compile_cache re-asserts the platform from it
        # (remote-TPU plugin workaround) and keys the cache dir off it
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    # daemon restarts skip the ~100 s flagship compile (PERF.md)
    from synfmc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from synfmc_tpu.config import load_config
    from synfmc_tpu.pipelines.factory import build_pipeline

    config = load_config(args.config)
    pipe, info = build_pipeline(
        config,
        seed=args.seed, video_length=args.video_length,
        lora_ckpt=args.lora_ckpt, cm_ckpt=args.cm_ckpt, omcm_ckpt=args.omcm_ckpt,
        allow_untrained_cm=args.allow_untrained_cm,
    )
    return config, pipe, info


def _parse_camera(camera_txt):
    """Parse a camera label txt body -> (intrinsics, rts)."""
    import tempfile

    from synfmc_tpu.evaluation.metrics import parse_camera_txt

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as tf:
        tf.write(camera_txt)
        path = tf.name
    try:
        return parse_camera_txt(path)
    finally:
        os.unlink(path)


def _plucker_for(pipe, info, prompts, video_length, camera_txt):
    import jax.numpy as jnp
    import numpy as np

    if pipe.pose_encoder is None:
        return None
    h, w = info["sample_size"]
    b, f = len(prompts), video_length
    if camera_txt:
        intr, rts = _parse_camera(camera_txt)
        c2w = np.tile(np.eye(4, dtype=np.float32), (len(rts), 1, 1))
        c2w[:, :3, :] = rts
        intr = jnp.asarray(np.tile(intr[None], (b, 1, 1)), jnp.float32)
        c2w = jnp.asarray(np.tile(c2w[None], (b, 1, 1, 1)), jnp.float32)
    else:
        intr = jnp.broadcast_to(jnp.asarray([w, h, 0, 0], jnp.float32), (b, f, 4))
        c2w = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, f, 4, 4))

    from synfmc_tpu.geometry.plucker import plucker_embedding

    return plucker_embedding(intr, c2w, h, w)


def make_run_group(args, pipe, info):
    """Build the batched pipeline call the MicroBatcher dispatches.

    Per-request seeds stay exact (per-request latents from PRNGKey(seed),
    concatenated); group size pads to a power-of-two bucket so compiled
    batch shapes stay bounded; outputs split back per request.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synfmc_tpu.serving.batcher import bucket_size

    def run_group(jobs, key):
        f, steps, guidance = key
        h, w = info["sample_size"]
        hl, wl = h // 8, w // 8
        prompts = [p for j in jobs for p in j.prompts]
        lat = [
            jax.random.normal(jax.random.PRNGKey(j.seed), (j.n, f, hl, wl, 4), jnp.float32)
            * pipe.schedule.init_noise_sigma
            for j in jobs
        ]
        plks = [_plucker_for(pipe, info, j.prompts, f, j.camera_txt) for j in jobs]
        n = len(prompts)
        pad = bucket_size(n, args.max_batch) - n
        if pad:
            prompts = prompts + [prompts[-1]] * pad
            lat.append(jnp.repeat(lat[-1][-1:], pad, axis=0))
            if plks[-1] is not None:
                plks.append(jnp.repeat(plks[-1][-1:], pad, axis=0))
        latents = jnp.concatenate(lat)
        plucker = jnp.concatenate(plks) if plks[0] is not None else None
        if len(jobs) > 1 or pad:
            print(f"# serve: batched {len(jobs)} request(s), {n} sample(s) "
                  f"-> bucket {n + pad}", flush=True)
        video = np.asarray(pipe(
            prompts, video_length=f, height=h, width=w,
            num_inference_steps=steps, guidance_scale=guidance,
            latents=latents, plucker=plucker,
            deepcache_interval=args.deepcache, cfg_cache_interval=args.cfg_cache,
            solver=args.solver, decode_chunk=args.decode_chunk,
        ))
        out, ofs = [], 0
        for j in jobs:
            out.append(video[ofs : ofs + j.n])
            ofs += j.n
        return out

    return run_group


def make_handler(args, config, pipe, info, batcher):
    from http.server import BaseHTTPRequestHandler

    import jax
    import numpy as np

    from synfmc_tpu.serving.batcher import Job
    from synfmc_tpu.utils.video import save_videos_grid

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route through stdout, one line
            print(f"# serve: {fmt % a}", flush=True)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "stage": info["stage"],
                                 "sample_size": list(info["sample_size"]),
                                 "backend": jax.default_backend()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompts = req.get("prompt") or req.get("prompts")
                if isinstance(prompts, str):
                    prompts = [prompts]
                if not prompts:
                    self._json(400, {"error": "missing 'prompt'"})
                    return
                f = int(req.get("video_length", args.video_length))
                steps = int(req.get("num_inference_steps", args.num_inference_steps))
                guidance = float(req.get("guidance_scale", 8.0))
                seed = int(req.get("seed", args.seed))
                camera_txt = req.get("camera_txt")
                if camera_txt:
                    # validate BEFORE submit: a trajectory whose frame count
                    # disagrees with video_length would blow up inside the
                    # batched pipeline call and 500 every innocent request
                    # coalesced into the same group
                    try:
                        _, rts = _parse_camera(camera_txt)
                    except Exception as e:
                        self._json(400, {"error": f"bad camera_txt: {e}"})
                        return
                    if len(rts) != f:
                        self._json(400, {
                            "error": f"camera_txt has {len(rts)} poses but "
                                     f"video_length={f}"
                        })
                        return
                t0 = time.time()
                # the MicroBatcher's dispatch thread owns the chip; under
                # concurrent load, same-shape requests coalesce into one
                # batched pipeline call (--max-batch)
                video = batcher.submit(Job(
                    prompts=prompts, seed=seed,
                    camera_txt=req.get("camera_txt"),
                    video_length=f, steps=steps, guidance=guidance,
                ))
                buf = io.BytesIO()
                # save_videos_grid writes files; give it a temp path, read back
                import tempfile

                with tempfile.TemporaryDirectory() as td:
                    p = os.path.join(td, "out.gif")
                    save_videos_grid(video, p)
                    with open(p, "rb") as fh:
                        buf.write(fh.read())
                data = buf.getvalue()
                print(f"# serve: generated {len(prompts)} clip(s) x {f}f in "
                      f"{time.time() - t0:.1f}s ({len(data)} bytes)", flush=True)
                self.send_response(200)
                self.send_header("Content-Type", "image/gif")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:  # surface errors as JSON, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--lora-ckpt", default=None)
    p.add_argument("--cm-ckpt", default=None)
    p.add_argument("--omcm-ckpt", default=None)
    p.add_argument("--allow-untrained-cm", action="store_true")
    p.add_argument("--video-length", type=int, default=16)
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--deepcache", type=int, default=1)
    p.add_argument("--cfg-cache", type=int, default=1)
    p.add_argument("--turbo", type=int, default=0,
                   help="shorthand for --deepcache N --cfg-cache N")
    p.add_argument("--solver", choices=("ddim", "dpmpp_2m"), default="ddim")
    p.add_argument("--decode-chunk", type=int, default=1)
    p.add_argument("--warmup", action="store_true",
                   help="run one generation at startup so the first request "
                        "doesn't pay the compile")
    p.add_argument("--max-batch", type=int, default=1,
                   help="coalesce concurrent same-shape requests into one "
                        "batched pipeline call, up to this many samples "
                        "(power-of-two buckets; 1 = serialize like before)")
    p.add_argument("--batch-window", type=float, default=0.0,
                   help="seconds to wait for same-shape followers after "
                        "picking up a request (0 = coalesce only when "
                        "requests are already queued)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend (tests)")
    args = p.parse_args()
    if args.turbo:
        args.deepcache = args.cfg_cache = args.turbo

    config, pipe, info = _build(args)

    from synfmc_tpu.serving.batcher import MicroBatcher

    batcher = MicroBatcher(make_run_group(args, pipe, info),
                           max_batch=args.max_batch,
                           batch_window=args.batch_window)

    if args.warmup:
        import jax

        t0 = time.time()
        h, w = info["sample_size"]
        pl = _plucker_for(pipe, info, ["warmup"], args.video_length, None)
        pipe(["warmup"], video_length=args.video_length, height=h, width=w,
             num_inference_steps=args.num_inference_steps,
             rng=jax.random.PRNGKey(0), plucker=pl,
             deepcache_interval=args.deepcache, cfg_cache_interval=args.cfg_cache,
             solver=args.solver, decode_chunk=args.decode_chunk)
        print(f"# serve: warmup compile done in {time.time() - t0:.0f}s", flush=True)

    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(args, config, pipe, info, batcher))
    print(f"# serve: listening on {args.host}:{server.server_address[1]} "
          f"(stage={info['stage']})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()

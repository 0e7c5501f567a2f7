"""Inference pipelines: text/camera/object-conditioned video generation.

One pipeline covers the reference's three classes (fmc/pipelines/
pipeline_animation.py:40 ``AnimationPipeline``, :442 ``CameraCtrlPipeline``,
pipeline_animation_cm_om.py:442 ``CameraObjCtrlPipeline``): camera and object
conditioning are optional inputs.

TPU-native: the CFG denoise loop is one jit with ``lax.scan`` over the DDIM
timestep table; MultiDiffusion temporal windowing (overlap-averaged window
predictions, pipeline_animation.py:390-421) unrolls statically inside the
scan body; the VAE decodes frame-wise under ``lax.map`` to bound memory
(pipeline_animation.py:238-251).

Reference semantics preserved:
- uncond/cond CFG batch order [uncond, cond] (pipeline_animation.py:149-236),
- pose features encoded ONCE before the loop and shared by both CFG branches
  (pipeline_animation.py:644-667),
- OMC traj features: uncond branch zeroed (cm_om.py:670-676) and gated off
  when t < omcm_min_step (cm_om.py:680-685),
- multidiff asserted ==1 when traj features present (cm_om.py:690).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from synfmc_tpu.diffusion import DiffusionSchedule


@dataclasses.dataclass
class AnimationPipeline:
    """Bundles the frozen modules + params needed for generation."""

    unet: Any
    unet_params: Any
    vae: Any
    vae_params: Any
    text_encoder: Any
    text_params: Any
    tokenizer: Callable
    schedule: DiffusionSchedule
    pose_encoder: Any = None
    pose_encoder_params: Any = None
    adapter: Any = None
    adapter_params: Any = None
    # Optional jax.sharding.Mesh for multi-chip serving, params replicated:
    # - 'data' axis: batched inputs sharded over independent batch members —
    #   the serving-side analog of training DP (§2.6).
    # - optional 'sp' axis (create_serving_mesh): sequence parallelism over
    #   the FRAME axis, which accelerates a SINGLE clip.  The CFG pair rides
    #   'data' (mesh data == 2*batch required) so the frame-fold reshape
    #   (B,F,…)→(B·F,…) stays a contiguous P(('data','sp')) partition; every
    #   frame-local op (conv/GN/spatial attention, ~90% of UNet FLOPs) then
    #   partitions with zero communication and GSPMD synthesizes the
    #   temporal-attention collectives from the constraints in denoise_loop.
    mesh: Any = None

    def __post_init__(self):
        if self.mesh is not None:
            from synfmc_tpu.parallel import replicate

            for name in ("unet_params", "vae_params", "text_params",
                         "pose_encoder_params", "adapter_params"):
                v = getattr(self, name)
                if v is not None:
                    setattr(self, name, replicate(v, self.mesh))

    def _shard_data(self, x):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P("data")))

    def _shard_frames(self, x, axis: int = 1):
        """Shard a (B, F, ...) video tensor's frame axis over 'sp'."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        spec[axis] = "sp"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def encode_prompt(self, prompts, negative_prompts=None) -> jax.Array:
        """(2B, 77, hidden) text embeddings, uncond first (CFG batch)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        elif isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        ids = jnp.asarray(self.tokenizer(list(negative_prompts) + list(prompts)))
        return self.text_encoder.apply(self.text_params, ids)

    def encode_pose(self, plucker: jax.Array) -> list[jax.Array]:
        """Plücker video (B, F, H, W, 6) -> 4 multi-scale pose features,
        computed once per generation (pipeline_animation.py:644-657)."""
        assert self.pose_encoder is not None, "pipeline built without a pose encoder"
        return self.pose_encoder.apply(self.pose_encoder_params, plucker)

    def encode_traj(self, traj_raster: jax.Array, mask: jax.Array, num_frames: int) -> list[jax.Array]:
        """OMC raster (B*F, H, W, 13) + mask -> 4 traj feature videos."""
        assert self.adapter is not None, "pipeline built without an object adapter"
        feats = self.adapter.apply(self.adapter_params, traj_raster, mask)
        out = []
        for ft in feats:
            n, h, w, c = ft.shape
            out.append(ft.reshape(n // num_frames, num_frames, h, w, c))
        return out

    def __call__(
        self,
        prompts,
        video_length: int = 16,
        height: int = 256,
        width: int = 384,
        num_inference_steps: int = 25,
        guidance_scale: float = 8.0,
        negative_prompts=None,
        rng: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        plucker: Optional[jax.Array] = None,
        traj_features: Optional[Sequence[jax.Array]] = None,
        omcm_min_step: int = 700,
        multidiff_total_steps: int = 1,
        multidiff_overlaps: int = 12,
        deepcache_interval: int = 1,
        cfg_cache_interval: int = 1,
        solver: str = "ddim",
        decode: bool = True,
        decode_chunk: int = 1,
    ):
        """Generate videos.  Returns (B, F_total, H, W, 3) in [0, 1] when
        ``decode`` else the final latents."""
        context = self.encode_prompt(prompts, negative_prompts)
        batch = context.shape[0] // 2

        total_frames = multidiff_total_steps * (video_length - multidiff_overlaps) + multidiff_overlaps
        h_lat, w_lat = height // 8, width // 8
        if latents is None:
            assert rng is not None, "need rng or explicit latents"
            latents = (
                jax.random.normal(rng, (batch, total_frames, h_lat, w_lat, 4), dtype=jnp.float32)
                * self.schedule.init_noise_sigma
            )

        pose_features = self.encode_pose(plucker) if plucker is not None else None
        if traj_features is not None:
            assert multidiff_total_steps == 1, "OMC requires multidiff_total_steps == 1 (cm_om.py:690)"

        nsp = self.mesh.shape.get("sp", 1) if self.mesh is not None else 1
        if self.mesh is not None and nsp > 1:
            # Sequence-parallel serving: frames over 'sp', CFG pair over 'data'.
            ndata = self.mesh.shape["data"]
            assert ndata == 2 * batch, (
                f"frame-parallel serving needs mesh data == 2*batch (the CFG "
                f"pair rides 'data'); got data={ndata}, batch={batch}"
            )
            assert total_frames % nsp == 0, (
                f"{total_frames} frames must divide the 'sp' axis {nsp}"
            )
            assert multidiff_total_steps == 1, "frame-parallel serving requires multidiff_total_steps == 1"
            latents = self._shard_frames(latents)
            context = self._shard_data(context)
            if pose_features is not None:
                pose_features = [self._shard_frames(p) for p in pose_features]
            if traj_features is not None:
                traj_features = [self._shard_frames(t) for t in traj_features]
        elif self.mesh is not None:
            ndata = self.mesh.shape["data"]
            assert batch % ndata == 0, (
                f"prompt batch {batch} must divide the mesh 'data' axis {ndata}"
            )
            latents = self._shard_data(latents)
            context = self._shard_data(context)
            if pose_features is not None:
                pose_features = [self._shard_data(p) for p in pose_features]
            if traj_features is not None:
                traj_features = [self._shard_data(t) for t in traj_features]

        latents = denoise_loop(
            self.unet,
            self.unet_params,
            self.schedule,
            latents,
            context,
            pose_features=pose_features,
            traj_features=traj_features,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            omcm_min_step=omcm_min_step,
            window_length=video_length,
            multidiff_total_steps=multidiff_total_steps,
            multidiff_overlaps=multidiff_overlaps,
            deepcache_interval=deepcache_interval,
            cfg_cache_interval=cfg_cache_interval,
            solver=solver,
            mesh=self.mesh if nsp > 1 else None,
        )
        if not decode:
            return latents
        return decode_latents(self.vae, self.vae_params, latents,
                              mesh=self.mesh if nsp > 1 else None,
                              decode_chunk=decode_chunk)


@functools.partial(
    jax.jit,
    static_argnames=(
        "unet",
        "schedule",
        "num_inference_steps",
        "omcm_min_step",
        "window_length",
        "multidiff_total_steps",
        "multidiff_overlaps",
        "deepcache_interval",
        "cfg_cache_interval",
        "solver",
        "mesh",
    ),
)
def denoise_loop(
    unet,
    unet_params,
    schedule: DiffusionSchedule,
    latents: jax.Array,
    context: jax.Array,
    pose_features=None,
    traj_features=None,
    num_inference_steps: int = 25,
    guidance_scale: float = 8.0,
    omcm_min_step: int = 700,
    window_length: int = 16,
    multidiff_total_steps: int = 1,
    multidiff_overlaps: int = 12,
    deepcache_interval: int = 1,
    cfg_cache_interval: int = 1,
    solver: str = "ddim",
    mesh=None,
):
    """jit-compiled CFG denoise loop (lax.scan over the DDIM table).

    ``solver`` selects the per-step update: ``"ddim"`` (default — the exact
    reference-parity path, pipeline_animation.py:701) or ``"dpmpp_2m"``
    (DPM-Solver++(2M), a second-order multistep ODE solver over the SAME
    timestep table — comparable quality in roughly half the steps, zero
    per-step overhead; composes with the cache modes below).

    ``deepcache_interval > 1`` enables DeepCache acceleration (Ma et al.,
    arXiv:2312.00858, rebuilt TPU-first): the deep UNet levels (down 1-3,
    mid, up 0-2) run only every Nth step; in between, the cached up_blocks_2
    output is reused and only the shallowest level recomputes.  Opt-in:
    trades a small amount of fidelity for ~1.5-2x throughput; the default 1
    is the exact reference-parity path.

    ``cfg_cache_interval > 1`` enables CFG-caching: the UNCOND branch of the
    CFG pair is recomputed only every Nth step and reused in between (the
    uncond epsilon drifts slowly across adjacent DDIM steps), so cache steps
    run the UNet at batch B instead of 2B — ~1.3x at interval 2.  Opt-in and
    approximate, like DeepCache; both lax.cond branches are static shapes.

    Setting BOTH intervals (equal) composes them: refresh steps run the full
    2B forward re-recording both caches; every other step runs only the
    shallow UNet level on the cond branch.

    ``mesh`` (static) enables SEQUENCE-PARALLEL serving over a
    ('data', 'sp') mesh: frames are sharded over 'sp' and the CFG pair over
    'data' (mesh data == 2*batch).  The constraints below pin the CFG-batched
    UNet inputs to P('data','sp') — under that layout the frame-fold reshape
    (2B,F,…)→(2B·F,…) is the contiguous partition P(('data','sp')), so every
    frame-local op partitions with zero communication and GSPMD inserts
    collectives only where frames genuinely interact (temporal attention).
    """
    timesteps = jnp.asarray(schedule.ddim_timesteps(num_inference_steps))
    stride = window_length - multidiff_overlaps
    if solver == "dpmpp_2m":
        solver_tables = schedule.dpmpp_2m_tables(num_inference_steps)
    elif solver != "ddim":
        raise ValueError(f"unknown solver {solver!r} (want 'ddim' or 'dpmpp_2m')")

    nsp = mesh.shape.get("sp", 1) if mesh is not None else 1

    def wsc(x, *spec):
        """Sharding constraint (no-op without an 'sp' mesh)."""
        if nsp <= 1 or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    if nsp > 1:
        assert multidiff_total_steps == 1, "frame-parallel serving requires multidiff_total_steps == 1"
        assert mesh.shape["data"] == 2 * latents.shape[0], (
            "frame-parallel serving needs mesh data == 2*batch (CFG pair on 'data')"
        )
        latents = wsc(latents, None, "sp")
        context = wsc(context, "data")

    # CFG duplication done once: pose features shared between branches
    # (pipeline_animation.py:661-667); traj uncond branch zeroed (cm_om.py:670-676).
    pose_cfg = None
    if pose_features is not None:
        pose_cfg = [wsc(jnp.concatenate([p, p], axis=0), "data", "sp") for p in pose_features]
    traj_cfg = None
    if traj_features is not None:
        traj_cfg = [
            wsc(jnp.concatenate([jnp.zeros_like(tr), tr], axis=0), "data", "sp")
            for tr in traj_features
        ]

    def unet_eps(window_latents, t, pose_w, traj_w):
        latent_in = wsc(
            jnp.concatenate([window_latents, window_latents], axis=0), "data", "sp"
        )
        traj_t = None
        if traj_w is not None:
            gate = (t >= omcm_min_step).astype(latent_in.dtype)
            traj_t = [tr * gate for tr in traj_w]
        eps = unet.apply(
            unet_params, latent_in, jnp.full((latent_in.shape[0],), t), context,
            pose_features=pose_w, traj_features=traj_t,
        )
        uncond, cond = jnp.split(eps, 2, axis=0)
        return wsc(uncond + guidance_scale * (cond - uncond), None, "sp")

    # Solver-state abstraction shared by the exact and cached scan bodies:
    # DDIM carries only the latents; DPM-Solver++(2M) additionally carries the
    # previous step's x0-prediction (first step's coefficient on it is 0).
    def solver_init(latents):
        carry = {"latents": latents}
        if solver == "dpmpp_2m":
            carry["m_prev"] = wsc(jnp.zeros_like(latents), None, "sp")
        return carry

    def solver_step(carry, eps_cfg, t, idx):
        latents = carry["latents"]
        if solver == "ddim":
            return {"latents": wsc(
                schedule.ddim_step(eps_cfg, t, latents, num_inference_steps), None, "sp"
            )}
        x_next, m0 = schedule.dpmpp_2m_step(
            eps_cfg, idx, latents, carry["m_prev"], solver_tables
        )
        return {"latents": wsc(x_next, None, "sp"), "m_prev": wsc(m0, None, "sp")}

    use_deep = deepcache_interval > 1
    use_cfg = cfg_cache_interval > 1
    if use_deep or use_cfg:
        # One parameterized cached-scan body serves all three opt-in modes
        # (DeepCache / CFG-cache / combined "turbo"): refresh steps run the
        # full 2B forward (re-recording whichever caches are enabled); cache
        # steps reuse them — shallow-only when use_deep, cond-branch-only at
        # batch B when use_cfg, both when combined.
        assert multidiff_total_steps == 1, "cache modes require multidiff_total_steps == 1"
        if use_deep and use_cfg:
            assert cfg_cache_interval == deepcache_interval, (
                "combined CFG-cache x DeepCache uses one shared refresh interval — "
                "set both to the same value"
            )
        k = max(deepcache_interval, cfg_cache_interval)
        b = latents.shape[0]
        ctx_cond = context[b:]
        f_total, h_lat, w_lat = latents.shape[1:4]
        deep_ch = list(reversed(unet.block_out_channels))[2]
        # deep cache carried at batch B (cond half only) under CFG-caching —
        # the uncond half would be dead carry state
        deep_b = b if use_cfg else 2 * b

        def cache_body(carry, xs):
            latents = carry["latents"]
            t, idx = xs
            gate = (t >= omcm_min_step).astype(unet.dtype)
            traj_full = [tr * gate for tr in traj_cfg] if traj_cfg is not None else None

            def refresh(_):
                latent_in = wsc(
                    jnp.concatenate([latents, latents], axis=0).astype(unet.dtype),
                    "data", "sp",
                )
                t_vec = jnp.full((2 * b,), t)
                if use_deep:
                    eps, deep_new = unet.apply(
                        unet_params, latent_in, t_vec, context,
                        pose_features=pose_cfg, traj_features=traj_full, return_deep=True,
                    )
                else:
                    eps = unet.apply(
                        unet_params, latent_in, t_vec, context,
                        pose_features=pose_cfg, traj_features=traj_full,
                    )
                uncond, cond = jnp.split(eps, 2, axis=0)
                out = {"uncond": wsc(uncond, None, "sp"), "cond": wsc(cond, None, "sp")}
                if use_deep:
                    d_new = deep_new[b:] if use_cfg else deep_new
                    out["deep"] = wsc(d_new, *((None, "sp") if use_cfg else ("data", "sp")))
                return out

            def cached(_):
                deep = carry.get("deep")
                if use_cfg:
                    # cond branch only at batch B; uncond reused from the carry
                    traj_t = [tr * gate for tr in traj_features] if traj_features is not None else None
                    cond = unet.apply(
                        unet_params, wsc(latents.astype(unet.dtype), None, "sp"),
                        jnp.full((b,), t), ctx_cond,
                        pose_features=pose_features, traj_features=traj_t,
                        deep_cache=deep,
                    )
                    out = {"uncond": carry["uncond"], "cond": wsc(cond, None, "sp")}
                else:
                    # full CFG pair, shallow level only (DeepCache)
                    latent_in = wsc(
                        jnp.concatenate([latents, latents], axis=0).astype(unet.dtype),
                        "data", "sp",
                    )
                    eps = unet.apply(
                        unet_params, latent_in, jnp.full((2 * b,), t), context,
                        pose_features=pose_cfg, traj_features=traj_full, deep_cache=deep,
                    )
                    uncond, cond = jnp.split(eps, 2, axis=0)
                    out = {"uncond": wsc(uncond, None, "sp"), "cond": wsc(cond, None, "sp")}
                if use_deep:
                    out["deep"] = deep
                return out

            res = jax.lax.cond(idx % k == 0, refresh, cached, None)
            eps_cfg = res["uncond"] + guidance_scale * (res["cond"] - res["uncond"])
            new_carry = solver_step(carry, eps_cfg, t, idx)
            if use_deep:
                new_carry["deep"] = res["deep"]
            if use_cfg:
                new_carry["uncond"] = res["uncond"]
            return new_carry, None

        carry0 = solver_init(latents)
        if use_deep:
            carry0["deep"] = wsc(
                jnp.zeros((deep_b, f_total, h_lat, w_lat, deep_ch), unet.dtype),
                *((None, "sp") if use_cfg else ("data", "sp")),
            )
        if use_cfg:
            carry0["uncond"] = wsc(jnp.zeros(latents.shape, unet.dtype), None, "sp")  # idx 0 always refreshes
        carry, _ = jax.lax.scan(
            cache_body, carry0, (timesteps, jnp.arange(timesteps.shape[0]))
        )
        return carry["latents"]

    def body(carry, xs):
        latents = carry["latents"]
        t, idx = xs
        if multidiff_total_steps == 1:
            eps_full = unet_eps(latents, t, pose_cfg, traj_cfg)
        else:
            eps_acc = jnp.zeros_like(latents)
            count = jnp.zeros_like(latents)
            for w in range(multidiff_total_steps):
                s = w * stride
                window = jax.lax.dynamic_slice_in_dim(latents, s, window_length, axis=1)
                pose_w = None
                if pose_cfg is not None:
                    pose_w = [
                        jax.lax.dynamic_slice_in_dim(p, s, window_length, axis=1) for p in pose_cfg
                    ]
                eps_w = unet_eps(window, t, pose_w, None)
                eps_acc = jax.lax.dynamic_update_slice_in_dim(
                    eps_acc,
                    jax.lax.dynamic_slice_in_dim(eps_acc, s, window_length, axis=1) + eps_w,
                    s,
                    axis=1,
                )
                count = jax.lax.dynamic_update_slice_in_dim(
                    count,
                    jax.lax.dynamic_slice_in_dim(count, s, window_length, axis=1) + 1.0,
                    s,
                    axis=1,
                )
            eps_full = eps_acc / jnp.maximum(count, 1.0)
        return solver_step(carry, eps_full, t, idx), None

    carry, _ = jax.lax.scan(
        body, solver_init(latents), (timesteps, jnp.arange(timesteps.shape[0]))
    )
    return carry["latents"]


def decode_latents(vae, vae_params, latents: jax.Array, mesh=None,
                   decode_chunk: int = 1) -> jax.Array:
    """Frame-wise VAE decode -> (B, F, H, W, 3) in [0, 1]
    (pipeline_animation.py:238-251, incl. the /0.18215 inside vae.decode).

    Single-chip: frames decode sequentially under ``lax.map`` to bound
    memory (reference semantics, ``decode_chunk=1``).  ``decode_chunk=k``
    decodes k frames per step — the VAE is frame-independent so the math is
    unchanged, but batched convs fill the MXU far better; with the cached/
    few-step serving modes the decode is a visible share of clip latency.
    With an 'sp' serving mesh the decode is BATCHED with the frame
    axis sharded over 'sp' instead — each device decodes its F/sp frames in
    parallel (the fold is frame-major so P('sp') stays expressible for any
    batch size; per-device memory is bounded by the shard, not the clip).
    """
    b, f, h, w, c = latents.shape
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        frames = latents.transpose(1, 0, 2, 3, 4).reshape(f * b, h, w, c)
        frames = jax.device_put(frames, NamedSharding(mesh, P("sp")))
        images = _decode_frames_batched(vae, vae_params, frames)  # (f*b, H, W, 3)
        images = images.reshape(f, b, *images.shape[1:])
        return images.transpose(1, 0, 2, 3, 4)
    frames = latents.reshape(b * f, h, w, c)

    k = max(1, min(decode_chunk, b * f))
    while (b * f) % k != 0:  # largest divisor <= requested chunk
        k -= 1
    if k > 1:
        chunks = frames.reshape(b * f // k, k, h, w, c)
        decode_k = lambda z: vae.apply(vae_params, z, method=type(vae).decode)
        images = jax.lax.map(decode_k, chunks)
        images = images.reshape(b * f, *images.shape[2:])
    else:
        decode_one = lambda z: vae.apply(vae_params, z[None], method=type(vae).decode)[0]
        images = jax.lax.map(decode_one, frames)
    images = (images / 2.0 + 0.5).clip(0.0, 1.0)
    return images.reshape(b, f, *images.shape[1:])


@functools.partial(jax.jit, static_argnames=("vae",))
def _decode_frames_batched(vae, vae_params, frames: jax.Array) -> jax.Array:
    """(F·B, h, w, 4) latent frames -> (F·B, H, W, 3) images in [0, 1],
    sharding propagated from the input's committed layout."""
    images = vae.apply(vae_params, frames, method=type(vae).decode)
    return (images / 2.0 + 0.5).clip(0.0, 1.0)

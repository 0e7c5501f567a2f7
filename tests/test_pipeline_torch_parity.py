"""Denoise-loop parity vs a torch transcription of the reference sampler.

tests/test_pipeline.py pins the cache/solver/windowing modes against
hand-rolled JAX references; this test closes the remaining composition gap by
matching the EXACT serving path — ``denoise_loop`` (lax.scan CFG sampler) —
against an in-torch transcription of the reference's inference semantics:

- diffusers DDIMScheduler 'leading' timestep table with steps_offset
  (set_timesteps semantics the reference constructs, configs/cam.yaml:131-138),
- CFG batch order [uncond, cond] with eps = eu + g*(ec - eu)
  (pipeline_animation.py:692-694),
- pose features encoded once and SHARED by both CFG branches
  (pipeline_animation.py:661-667),
- OMC traj features: uncond branch zeroed (cm_om.py:670-676), gated off when
  t < omcm_min_step (cm_om.py:680-685) — the 4-step table below straddles the
  gate so both branches of the lax.cond-free gating are exercised,
- deterministic eta=0 DDIM update with set_alpha_to_one at the final step.

The UNet inside the loop is the SAME torch transcription the full-stack
forward parity test uses, so a mismatch here isolates to the sampler
composition (scheduler arithmetic, CFG combine, duplication/gating), not the
model.
"""

import numpy as np
import torch

import jax.numpy as jnp

from synfmc_tpu.diffusion import DiffusionSchedule
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.pipelines.animation import denoise_loop

from tests.test_fullstack_parity import TUNet3D

torch.manual_seed(0)


def test_denoise_loop_matches_torch_ddim_cfg(rng):
    chs, heads, xdim, b, f, h, w = (32, 64, 128, 128), 4, 48, 1, 2, 16, 24
    pose_scale, steps, guidance, omcm_min_step = 0.5, 4, 8.0, 700
    tm = TUNet3D(chs, heads, xdim, lora_rank=0, pose_scale=pose_scale)

    latents0 = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    ctx = rng.normal(size=(2 * b, 7, xdim)).astype(np.float32)  # [uncond, cond]
    pose = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]
    traj = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]

    # ---- torch: reference sampler semantics, written from the cites above ----
    T = 1000
    betas = np.linspace(0.00085, 0.012, T, dtype=np.float64)
    abar = np.cumprod(1.0 - betas)
    ratio = T // steps
    ts = (np.arange(steps) * ratio).round()[::-1].astype(np.int64) + 1  # leading + offset
    assert ts[0] >= omcm_min_step > ts[1]  # the table must straddle the OMC gate

    x = torch.from_numpy(latents0).permute(0, 1, 4, 2, 3).double()
    ctx_t = torch.from_numpy(ctx)
    pose_t = [torch.from_numpy(p).permute(0, 1, 4, 2, 3) for p in pose]
    traj_t = [torch.from_numpy(p).permute(0, 1, 4, 2, 3) for p in traj]
    with torch.no_grad():
        for t in ts:
            lat_in = torch.cat([x, x], dim=0).float()
            gate = 1.0 if t >= omcm_min_step else 0.0
            pose_in = [torch.cat([p, p], dim=0) for p in pose_t]
            traj_in = [torch.cat([torch.zeros_like(tr), tr], dim=0) * gate for tr in traj_t]
            eps = tm(lat_in, torch.full((2 * b,), int(t)), ctx_t, pose_in, traj_in)
            eu, ec = eps.chunk(2, dim=0)
            eps_cfg = (eu + guidance * (ec - eu)).double()
            prev_t = int(t) - ratio
            a_t = abar[int(t)]
            a_prev = abar[prev_t] if prev_t >= 0 else 1.0  # set_alpha_to_one
            x0 = (x - np.sqrt(1.0 - a_t) * eps_cfg) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps_cfg
    want = x.float().permute(0, 1, 3, 4, 2).numpy()

    # ---- jax: the production denoise_loop with the same params ----
    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, motion_num_heads=heads, camera_cond=True,
        pose_scale=pose_scale,
    )
    schedule = DiffusionSchedule.from_config()  # cam.yaml defaults: linear, offset 1
    got = denoise_loop(
        unet, {"params": tm.params()}, schedule,
        jnp.asarray(latents0), jnp.asarray(ctx),
        pose_features=[jnp.asarray(p) for p in pose],
        traj_features=[jnp.asarray(p) for p in traj],
        num_inference_steps=steps, guidance_scale=guidance,
        omcm_min_step=omcm_min_step,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_multidiff_windowing_matches_torch(rng):
    """MultiDiffusion temporal windowing vs torch: overlapping windows denoised
    independently per step, overlap regions averaged, pose features sliced per
    window (pipeline_animation.py:390-421, 678-682)."""
    chs, heads, xdim, b, h, w = (32, 64, 128, 128), 4, 48, 1, 8, 8
    f, window, overlaps, steps, guidance = 4, 3, 2, 2, 8.0
    stride = window - overlaps
    n_windows = (f - window) // stride + 1
    tm = TUNet3D(chs, heads, xdim, lora_rank=0, pose_scale=0.5)

    latents0 = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    ctx = rng.normal(size=(2 * b, 7, xdim)).astype(np.float32)
    pose = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]

    T = 1000
    betas = np.linspace(0.00085, 0.012, T, dtype=np.float64)
    abar = np.cumprod(1.0 - betas)
    ratio = T // steps
    ts = (np.arange(steps) * ratio).round()[::-1].astype(np.int64) + 1

    x = torch.from_numpy(latents0).permute(0, 1, 4, 2, 3).double()
    ctx_t = torch.from_numpy(ctx)
    pose_t = [torch.from_numpy(p).permute(0, 1, 4, 2, 3) for p in pose]
    with torch.no_grad():
        for t in ts:
            eps_acc = torch.zeros_like(x)
            count = torch.zeros_like(x)
            for wi in range(n_windows):
                s = wi * stride
                win = x[:, s : s + window].float()
                lat_in = torch.cat([win, win], dim=0)
                pose_in = [torch.cat([p[:, s : s + window]] * 2, dim=0) for p in pose_t]
                eps = tm(lat_in, torch.full((2 * b,), int(t)), ctx_t, pose_in,
                         [None] * 4)
                eu, ec = eps.chunk(2, dim=0)
                eps_acc[:, s : s + window] += (eu + guidance * (ec - eu)).double()
                count[:, s : s + window] += 1.0
            eps_cfg = eps_acc / count.clamp(min=1.0)
            prev_t = int(t) - ratio
            a_t = abar[int(t)]
            a_prev = abar[prev_t] if prev_t >= 0 else 1.0
            x0 = (x - np.sqrt(1.0 - a_t) * eps_cfg) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps_cfg
    want = x.float().permute(0, 1, 3, 4, 2).numpy()

    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, motion_num_heads=heads, camera_cond=True,
        pose_scale=0.5,
    )
    got = denoise_loop(
        unet, {"params": tm.params()}, DiffusionSchedule.from_config(),
        jnp.asarray(latents0), jnp.asarray(ctx),
        pose_features=[jnp.asarray(p) for p in pose],
        num_inference_steps=steps, guidance_scale=guidance,
        window_length=window, multidiff_total_steps=n_windows,
        multidiff_overlaps=overlaps,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)

"""Noise schedules: DDPM training utilities + deterministic DDIM sampling.

Behavioral parity with the diffusers DDPMScheduler/DDIMScheduler instances the
reference constructs from ``noise_scheduler_kwargs`` (configs/cam.yaml:131-138:
1000 steps, beta 0.00085..0.012, steps_offset 1, clip_sample false;
lora.yaml uses beta_schedule 'scaled_linear', cam/obj use 'linear').

Everything is a pure function of precomputed alpha tables so the whole
denoise loop compiles under one jit with ``lax.scan`` over timesteps
(SURVEY.md §7.4) — no per-step host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# eq=False: identity hash so the schedule can be a static jit argument
# (the alphas_cumprod table is an unhashable ndarray).
@dataclasses.dataclass(frozen=True, eq=False)
class DiffusionSchedule:
    num_train_timesteps: int
    alphas_cumprod: np.ndarray  # (T,) float64 for table precision
    steps_offset: int = 1
    clip_sample: bool = False
    set_alpha_to_one: bool = True  # diffusers DDIMScheduler default

    @classmethod
    def from_config(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "linear",
        steps_offset: int = 1,
        clip_sample: bool = False,
        **_unused,
    ) -> "DiffusionSchedule":
        if beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        elif beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        else:
            raise ValueError(f"unsupported beta_schedule {beta_schedule!r}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            steps_offset=steps_offset,
            clip_sample=clip_sample,
        )

    # ---- training ----

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """noisy = sqrt(abar_t) x0 + sqrt(1-abar_t) noise (DDPMScheduler.add_noise).

        t: (B,) int timesteps; x0/noise: (B, ...)."""
        abar = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_abar = jnp.sqrt(abar).reshape(shape).astype(x0.dtype)
        sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape).astype(x0.dtype)
        return sqrt_abar * x0 + sqrt_1m * noise

    def sample_timesteps(self, rng: jax.Array, batch: int) -> jax.Array:
        return jax.random.randint(rng, (batch,), 0, self.num_train_timesteps)

    def sample_timesteps_biased(
        self, rng: jax.Array, batch: int, min_step: int, min_step_prob: float
    ) -> jax.Array:
        """Stage-3 biased sampling (train_cam_obj_ctrl.py:793-800): with
        probability ``min_step_prob`` draw t in [min_step, T), else [0, min_step)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        high = jax.random.randint(r1, (batch,), min_step, self.num_train_timesteps)
        low = jax.random.randint(r2, (batch,), 0, min_step)
        take_high = jax.random.uniform(r3, (batch,)) < min_step_prob
        return jnp.where(take_high, high, low)

    # ---- DDIM inference ----

    @property
    def init_noise_sigma(self) -> float:
        return 1.0  # DDIMScheduler.init_noise_sigma

    def ddim_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """diffusers DDIMScheduler.set_timesteps ('leading' spacing):
        (arange(n) * (T//n)).round()[::-1] + steps_offset."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return ts + self.steps_offset

    def ddim_step(
        self, model_eps: jax.Array, t: jax.Array, sample: jax.Array, num_inference_steps: int
    ) -> jax.Array:
        """Deterministic (eta=0) DDIM update, epsilon prediction.

        t may be a traced scalar — alpha lookups are gathers, so the whole
        sampler scans over the timestep table.
        """
        abar = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        prev_t = t - self.num_train_timesteps // num_inference_steps
        alpha_t = abar[t]
        final_alpha = jnp.float32(1.0) if self.set_alpha_to_one else abar[0]
        alpha_prev = jnp.where(prev_t >= 0, abar[jnp.maximum(prev_t, 0)], final_alpha)

        eps32 = model_eps.astype(jnp.float32)
        x32 = sample.astype(jnp.float32)
        pred_x0 = (x32 - jnp.sqrt(1.0 - alpha_t) * eps32) / jnp.sqrt(alpha_t)
        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        direction = jnp.sqrt(1.0 - alpha_prev) * eps32
        prev = jnp.sqrt(alpha_prev) * pred_x0 + direction
        return prev.astype(sample.dtype)

"""Training losses.

Parity targets:
- epsilon-prediction MSE (train_image_lora.py:352-363),
- masked loss: union object mask nearest-resized to latent dims, optionally
  INVERTED (stage 2 emphasizes background: mask = 1-mask,
  train_cam_ctrl.py:601-629; stage 3 keeps it un-inverted,
  train_cam_obj_ctrl.py:880-908); total = mask_w*mask_loss + sd_w*sd_loss,
- MotionDirector appearance-debias loss (train_cam_ctrl.py:635-645).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from synfmc_tpu.ops.pixel import nearest_resize


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def masked_diffusion_loss(
    pred: jax.Array,
    target: jax.Array,
    obj_union_mask: jax.Array | None,
    invert_mask: bool,
    mask_loss_weight: float,
    sd_loss_weight: float,
) -> tuple[jax.Array, dict]:
    """pred/target: (B, F, h, w, C) latents; obj_union_mask: (B, F, H, W, 1)
    binary union of object masks at pixel resolution (or None)."""
    sd_loss = mse(pred, target)
    if obj_union_mask is None:
        return sd_loss, {"sd_loss": sd_loss}
    b, f, h, w, _ = pred.shape
    m = obj_union_mask.reshape(b * f, *obj_union_mask.shape[2:])
    m = nearest_resize(m, h, w).reshape(b, f, h, w, 1).astype(jnp.float32)
    if invert_mask:
        m = 1.0 - m
    mask_loss = mse(pred.astype(jnp.float32) * m, target.astype(jnp.float32) * m)
    loss = mask_loss_weight * mask_loss + sd_loss_weight * sd_loss
    return loss, {"sd_loss": sd_loss, "mask_loss": mask_loss}


def appearance_debias_loss(pred: jax.Array, target: jax.Array, rng: jax.Array) -> jax.Array:
    """MotionDirector debias: per-sample random anchor frame
    (train_cam_ctrl.py:635-645)."""
    b, f = target.shape[:2]
    idx = jax.random.randint(rng, (b,), 0, f)
    anchor = jnp.take_along_axis(target, idx[:, None, None, None, None], axis=1)
    s2 = math.sqrt(2.0)
    return mse(s2 * pred - anchor, s2 * target - anchor)

"""OMC trajectory-feature rasterization.

Behavioral parity with reference ``get_traj_features_v2`` (fmc/util.py:147-213),
re-designed jit-able: the reference's ragged per-object Python loops with
boolean indexing become a static scan over a padded object axis with
``jnp.where`` overwrite (later objects win at overlapping pixels, matching the
reference's sequential assignment).

Semantics preserved exactly:
- per-pixel pose value = obj_info * mask_value (util.py:176-181 — with
  Gaussian sphere masks the pose raster is scaled by the mask),
- the concatenated 13-ch feature is multiplied by the mask again
  (util.py:202: ``features = features * mask_features``),
- whole-sample CFG dropout with ratio (util.py:196-199).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@jax.jit
def rasterize_traj_features(obj_info: jax.Array, obj_masks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rasterize padded per-object poses into dense feature maps.

    Args:
      obj_info: (B, F, O, 12) camera-relative object poses; padding rows are
        all-zero (their masks must also be zero).
      obj_masks: (B, F, O, H, W) per-object masks in [0, 1] (binary or
        Gaussian sphere masks); 0 marks background/padding.

    Returns:
      traj: (B, F, H, W, 12) pose raster (pose * mask value, last object wins)
      mask: (B, F, H, W, 1) mask raster
    """
    b, f, o, h, w = obj_masks.shape
    traj = jnp.zeros((b, f, h, w, 12), dtype=obj_info.dtype)
    mask = jnp.zeros((b, f, h, w, 1), dtype=obj_info.dtype)

    def body(carry, inputs):
        traj, mask = carry
        info_o, mask_o = inputs  # (B,F,12), (B,F,H,W)
        m = mask_o[..., None]  # (B,F,H,W,1)
        hit = m > 0
        val = info_o[:, :, None, None, :] * m
        traj = jnp.where(hit, val, traj)
        mask = jnp.where(hit, m, mask)
        return (traj, mask), None

    (traj, mask), _ = jax.lax.scan(
        body,
        (traj, mask),
        (jnp.moveaxis(obj_info, 2, 0), jnp.moveaxis(obj_masks, 2, 0)),
    )
    return traj, mask


def build_adapter_inputs(
    obj_info: jax.Array,
    obj_masks: jax.Array,
    rng: Optional[jax.Array] = None,
    cfg_dropout_ratio: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Raster + mask concat + dropout + re-mask, reshaped for the ObjectAdapter.

    Returns (features, mask): (B*F, H, W, 13) and (B*F, H, W, 1).
    """
    traj, mask = rasterize_traj_features(obj_info, obj_masks)
    features = jnp.concatenate([traj, mask], axis=-1)
    if rng is not None and cfg_dropout_ratio > 0:
        keep = jax.random.uniform(rng, (features.shape[0],)) > cfg_dropout_ratio
        features = features * keep[:, None, None, None, None].astype(features.dtype)
    features = features * mask  # util.py:202
    b, f, h, w, c = features.shape
    return features.reshape(b * f, h, w, c), mask.reshape(b * f, h, w, 1)


def traj_features_from_adapter(adapter, adapter_params, features, mask, num_frames: int):
    """Run the ObjectAdapter and reshape each scale back to video
    (util.py:204-206)."""
    feats = adapter.apply(adapter_params, features, mask)
    out = []
    for ft in feats:
        n, h, w, c = ft.shape
        out.append(ft.reshape(n // num_frames, num_frames, h, w, c))
    return out

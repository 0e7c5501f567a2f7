"""Plücker-ray embedding of camera trajectories — jit-compiled, TPU-resident.

Behavioral parity with reference ``ray_condition`` (fmc/data/dataset.py:930-972)
but computed on device under jit instead of on the CPU per batch (the
reference builds it on CPU and copies, train_cam_ctrl.py:77-90,583-584).

Given per-frame intrinsics ``K = (fx, fy, cx, cy)`` and camera-to-world
matrices, emits per-pixel Plücker coordinates ``[o x d, d]`` (6 channels).

Intrinsics quirk preserved: the reference feeds fx = sensor_w, fy = sensor_h,
cx = cy = 0 from the annotation JSON (dataset.py:5427-5457); we accept K as
given and do not normalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("height", "width"))
def plucker_embedding(
    intrinsics: jax.Array,
    c2w: jax.Array,
    height: int,
    width: int,
    flip_flag: jax.Array | None = None,
) -> jax.Array:
    """Compute Plücker embeddings for a batch of camera trajectories.

    Args:
      intrinsics: (B, F, 4) — fx, fy, cx, cy per frame.
      c2w: (B, F, 4, 4) camera-to-world matrices.
      height, width: output raster size (static).
      flip_flag: optional (B,) bool — horizontally-flipped samples use
        mirrored pixel x coordinates (reference ray_condition flip path,
        dataset.py:944-954).

    Returns:
      (B, F, height, width, 6) Plücker coordinates, matching reference
      ray_condition's output layout (dataset.py:968-971).
    """
    dtype = c2w.dtype
    b, f = intrinsics.shape[:2]
    # Pixel centers (+0.5 as in dataset.py:940-941).
    i = (jnp.arange(width, dtype=dtype) + 0.5)[None, :]  # (1, W) — x coord
    j = (jnp.arange(height, dtype=dtype) + 0.5)[:, None]  # (H, 1) — y coord
    if flip_flag is not None:
        # linspace(W-1, 0) + 0.5 == W - 0.5 - arange(W)
        i_flipped = (width - 0.5 - jnp.arange(width, dtype=dtype))[None, :]
        i = jnp.where(flip_flag[:, None, None, None], i_flipped[None, None], i[None, None])
    else:
        i = i[None, None]

    fx, fy, cx, cy = [intrinsics[..., k][..., None, None] for k in range(4)]  # (B,F,1,1)
    shape = (b, f, height, width)
    xs = jnp.broadcast_to((i - cx) / fx, shape)
    ys = jnp.broadcast_to((j[None, None] - cy) / fy, shape)
    zs = jnp.ones_like(xs)
    directions = jnp.stack([xs, ys, zs], axis=-1)  # (B,F,H,W,3)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

    rot = c2w[..., :3, :3]  # (B,F,3,3)
    # rays_d = directions @ rot^T  (dataset.py:962).  HIGHEST precision: this
    # is negligible compute but bf16 MXU default would corrupt the pose signal.
    rays_d = jnp.einsum("bfhwc,bfkc->bfhwk", directions, rot, precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3][:, :, None, None, :], rays_d.shape)
    rays_dxo = jnp.cross(rays_o, rays_d)
    return jnp.concatenate([rays_dxo, rays_d], axis=-1)


def plucker_video(intrinsics, c2w, height, width):
    """Reference ``to_plucker_embedding`` layout (train_cam_ctrl.py:77-90):
    returns (B, 6, F, H, W) channels-first video for the pose encoder input."""
    p = plucker_embedding(intrinsics, c2w, height, width)
    return jnp.transpose(p, (0, 4, 1, 2, 3))

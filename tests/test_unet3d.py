"""UNet3D structural and conditioning-semantics tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synfmc_tpu.models.unet3d import UNet3D, lora_rank_for

TINY = dict(
    block_out_channels=(32, 64, 128, 128),
    attn_heads=4,
    cross_attention_dim=48,
)


def _pose_features(rng, b, f, h, w, chs):
    feats = []
    for i, c in enumerate(chs):
        s = 2**i
        feats.append(jnp.asarray(rng.normal(size=(b, f, h // s, w // s, c)).astype(np.float32)))
    return feats


def test_lora_rank_rule():
    # reference: rank if rank > 16 else hidden // rank (train_image_lora.py:163)
    assert lora_rank_for(320, 2) == 160
    assert lora_rank_for(1280, 2) == 640
    assert lora_rank_for(320, 128) == 128
    assert lora_rank_for(320, 0) == 0


def test_unet2d_mode_shapes(rng):
    """F=1, no motion modules == the stage-1 SD-style 2D UNet."""
    unet = UNet3D(use_motion_module=False, **TINY)
    x = jnp.asarray(rng.normal(size=(2, 1, 16, 24, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 7, 48)).astype(np.float32))
    t = jnp.array([10, 500])
    v = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(v, x, t, ctx)
    assert out.shape == (2, 1, 16, 24, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet3d_video_camera_obj_conditioning(rng):
    b, f, h, w = 1, 4, 16, 24
    unet = UNet3D(use_motion_module=True, camera_cond=True, **TINY)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, 7, 48)).astype(np.float32))
    t = jnp.array([321])
    pose = _pose_features(rng, b, f, h, w, TINY["block_out_channels"])
    traj = _pose_features(rng, b, f, h, w, TINY["block_out_channels"])

    v = unet.init(jax.random.PRNGKey(0), x, t, ctx, pose_features=pose, traj_features=traj)
    out = unet.apply(v, x, t, ctx, pose_features=pose, traj_features=traj)
    assert out.shape == (b, f, h, w, 4)

    # Zero-init qkv_merge => pose features are inert at init.
    out_zero_pose = unet.apply(
        v, x, t, ctx, pose_features=[jnp.zeros_like(p) for p in pose], traj_features=traj
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_zero_pose), atol=1e-5)

    # Traj features are a plain residual: zero traj == no traj...
    out_zero_traj = unet.apply(
        v, x, t, ctx, pose_features=pose, traj_features=[jnp.zeros_like(p) for p in traj]
    )
    out_no_traj = unet.apply(v, x, t, ctx, pose_features=pose)
    np.testing.assert_allclose(np.asarray(out_zero_traj), np.asarray(out_no_traj), atol=1e-5)
    # ...and nonzero traj must change the output.
    assert np.abs(np.asarray(out) - np.asarray(out_no_traj)).max() > 1e-4

    # Quirk parity: traj feature of the 4th (plain) block is unused by default
    # (unet_cam_obj.py:1227-1234).
    traj_mod = list(traj)
    traj_mod[3] = traj_mod[3] + 100.0
    out_mod = unet.apply(v, x, t, ctx, pose_features=pose, traj_features=traj_mod)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_mod), atol=1e-5)


def test_unet3d_pose_conditioning_active_after_training_step(rng):
    """Perturbing a merge kernel makes pose features affect the output."""
    b, f, h, w = 1, 2, 16, 24
    unet = UNet3D(use_motion_module=True, camera_cond=True, **TINY)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, 7, 48)).astype(np.float32))
    t = jnp.array([50])
    pose = _pose_features(rng, b, f, h, w, TINY["block_out_channels"])
    v = unet.init(jax.random.PRNGKey(0), x, t, ctx, pose_features=pose)

    params = jax.tree_util.tree_map(lambda p: p, v["params"])  # copy
    n_merge = 0

    def bump(d, path=""):
        nonlocal n_merge
        for k, val in d.items():
            if isinstance(val, dict):
                if k == "qkv_merge":
                    val["kernel"] = jnp.ones_like(val["kernel"]) * 0.01
                    n_merge += 1
                else:
                    bump(val, path + "/" + k)

    params = jax.tree_util.tree_map(lambda x: x, params)
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    bump(params)
    assert n_merge > 0, "no qkv_merge params found — camera conditioning not wired"
    out0 = unet.apply({"params": params}, x, t, ctx, pose_features=[jnp.zeros_like(p) for p in pose])
    out1 = unet.apply({"params": params}, x, t, ctx, pose_features=pose)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-4


def test_motion_module_resolutions_gating(rng):
    """unet.py:154/178 (down: res=2**i) and 243/276 (up: res=2**(3-i)):
    motion modules are inserted only at resolutions listed in
    motion_module_resolutions.  Non-default value (1, 2) => motion modules
    in down 0/1 and up 2/3 only; forward still runs."""
    b, f, h, w = 1, 2, 16, 24
    unet = UNet3D(use_motion_module=True, motion_module_resolutions=(1, 2), **TINY)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, 7, 48)).astype(np.float32))
    t = jnp.array([321])
    v = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    p = v["params"]
    for blk, expect in [
        ("down_blocks_0", True), ("down_blocks_1", True),   # res 1, 2
        ("down_blocks_2", False), ("down_blocks_3", False),  # res 4, 8
        ("up_blocks_0", False), ("up_blocks_1", False),      # res 8, 4
        ("up_blocks_2", True), ("up_blocks_3", True),        # res 2, 1
    ]:
        has = any(k.startswith("motion_modules") for k in p[blk])
        assert has == expect, f"{blk}: motion module present={has}, expected {expect}"
    out = unet.apply(v, x, t, ctx)
    assert out.shape == (b, f, h, w, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_motion_module_resolutions_default_all(rng):
    """Default (1,2,4,8) keeps a motion module in every block (shipped-config
    parity, cam.yaml:89)."""
    unet = UNet3D(use_motion_module=True, **TINY)
    x = jnp.zeros((1, 2, 16, 24, 4))
    v = unet.init(jax.random.PRNGKey(0), x, jnp.array([1]), jnp.zeros((1, 7, 48)))
    p = v["params"]
    for blk in [f"down_blocks_{i}" for i in range(4)] + [f"up_blocks_{i}" for i in range(4)]:
        assert any(k.startswith("motion_modules") for k in p[blk]), blk

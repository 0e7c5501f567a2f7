"""Checkpoint save/restore tests (native orbax + reference torch bundles)."""

import jax
import jax.numpy as jnp
import numpy as np

from synfmc_tpu.models.pose_encoder import CameraPoseEncoder
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.training.checkpoint import (
    latest_native,
    load_into_params,
    restore_native,
    save_native,
    save_stage1_bundle,
    save_stage2_bundle,
    save_stage3_bundles,
    torch_load_state_dict,
)
from synfmc_tpu.training.optim import make_optimizer
from synfmc_tpu.training.params import partition_params, stage1_lora_trainable, stage2_cmc_unet_trainable
from synfmc_tpu.training.steps import init_train_state

CHS = (32, 64, 128, 128)


def _unet_params(camera=False, lora=0):
    unet = UNet3D(
        block_out_channels=CHS, attn_heads=4, cross_attention_dim=32,
        use_motion_module=camera, camera_cond=camera, lora_rank=lora,
    )
    pose = (
        [jnp.zeros((1, 2, 8 // 2**i, 16 // 2**i, c)) for i, c in enumerate(CHS)] if camera else None
    )
    v = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2 if camera else 1, 8, 16, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)), pose_features=pose,
    )
    return v["params"]


def test_native_roundtrip(tmp_path):
    params = _unet_params(lora=2)
    trainable, _ = partition_params(params, stage1_lora_trainable)
    tx = make_optimizer(1e-4)
    state = init_train_state({"unet": trainable}, tx)
    path = save_native(str(tmp_path / "ckpts"), 7, state)
    assert latest_native(str(tmp_path / "ckpts")) == path
    restored = restore_native(path, jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_bundle_roundtrip(tmp_path):
    params = _unet_params(lora=2)
    trainable, frozen = partition_params(params, stage1_lora_trainable)
    p = str(tmp_path / "lora.ckpt")
    save_stage1_bundle(p, trainable, epoch=1, global_step=100)
    bundle = torch_load_state_dict(p)
    assert bundle["global_step"] == 100
    assert bundle["epoch"] == 1
    # reference bundle schema (train_image_lora.py:387-396): the key is
    # always present, None when the caller passes no Adam state
    assert "optimizer_state_dict" in bundle and bundle["optimizer_state_dict"] is None
    assert all("lora" in k for k in bundle["lora_state_dict"])
    # perturb then reload -> restored exactly
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    back = load_into_params(zeroed, bundle["lora_state_dict"], "unet")
    for a, b in zip(jax.tree_util.tree_leaves(trainable), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_stage2_and_3_bundles(tmp_path):
    params = _unet_params(camera=True)
    merge, _ = partition_params(params, stage2_cmc_unet_trainable)
    pose = CameraPoseEncoder(channels=CHS, temporal_attention_nhead=4).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 6))
    )["params"]

    p2 = str(tmp_path / "cmc.ckpt")
    save_stage2_bundle(p2, pose, merge, epoch=0, global_step=50)
    bundle = torch_load_state_dict(p2)
    assert all("merge" in k for k in bundle["attention_processor_state_dict"])
    assert any(k.startswith("encoder_down_conv_blocks") for k in bundle["pose_encoder_state_dict"])

    # load the merge params back into the full unet tree
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    filled = load_into_params(zeroed, bundle["attention_processor_state_dict"], "unet")
    got_merge, _ = partition_params(filled, stage2_cmc_unet_trainable)
    for a, b in zip(jax.tree_util.tree_leaves(merge), jax.tree_util.tree_leaves(got_merge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    from synfmc_tpu.models.adapter import ObjectAdapter

    ad = ObjectAdapter(channels=CHS).init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 128, 13)), jnp.zeros((2, 64, 128, 1))
    )["params"]
    paths = save_stage3_bundles(str(tmp_path), 75, ad, pose_encoder_params=pose,
                                merge_params=merge, epoch=3)
    assert len(paths) == 2
    omcm = torch_load_state_dict(paths[0])
    assert omcm["global_step"] == 75
    assert omcm["epoch"] == 3
    assert "optimizer_state_dict" in omcm
    assert any(k.startswith("body.") for k in omcm["omcm_state_dict"])
    cmcm = torch_load_state_dict(paths[1])
    assert cmcm["epoch"] == 3

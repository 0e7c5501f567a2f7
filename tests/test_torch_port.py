"""Weight-porting tests: exact expected torch names + roundtrip integrity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from synfmc_tpu.interop.torch_port import (
    export_torch_state,
    filter_state_dict,
    import_torch_state,
)
from synfmc_tpu.models.adapter import ObjectAdapter
from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.pose_encoder import CameraPoseEncoder
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.models.vae import AutoencoderKL

CHS = (32, 64, 128, 128)


@pytest.fixture(scope="module")
def unet_params():
    unet = UNet3D(
        block_out_channels=CHS, attn_heads=4, cross_attention_dim=32,
        use_motion_module=True, camera_cond=True, lora_rank=2,
    )
    hl, wl = 8, 16
    pose = [jnp.zeros((1, 2, hl // 2**i, wl // 2**i, c)) for i, c in enumerate(CHS)]
    v = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, hl, wl, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)), pose_features=pose,
    )
    return v["params"]


def test_unet_expected_torch_names(unet_params):
    sd = export_torch_state(unet_params, "unet")
    # hand-checked diffusers SD1.5 / AnimateDiff / reference names
    expected = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "down_blocks.0.attentions.0.norm.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.down.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.to_out_lora.up.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.norm.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.proj_in.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.to_q.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.processor.qkv_merge.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.norms.0.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.ff_norm.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.proj_out.weight",
        "mid_block.resnets.0.conv1.weight",
        "mid_block.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "up_blocks.1.attentions.0.transformer_blocks.0.attn1.to_v.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.3.motion_modules.2.temporal_transformer.transformer_blocks.0.attention_blocks.1.to_out.0.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]
    for name in expected:
        assert name in sd, f"missing expected torch name: {name}"


def test_unet_conv_layout():
    # conv kernels are OIHW in the export
    unet = UNet3D(block_out_channels=CHS, attn_heads=4, cross_attention_dim=32)
    v = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )
    sd = export_torch_state(v["params"], "unet")
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    assert sd["conv_out.weight"].shape == (4, 32, 3, 3)


@pytest.mark.parametrize(
    "kind,build",
    [
        (
            "vae",
            lambda: AutoencoderKL(block_out_channels=(32, 64)).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
            )["params"],
        ),
        (
            "clip_text",
            lambda: CLIPTextModel(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
            )["params"],
        ),
        (
            "pose_encoder",
            lambda: CameraPoseEncoder(channels=CHS, temporal_attention_nhead=4).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 6))
            )["params"],
        ),
        (
            "adapter",
            lambda: ObjectAdapter(channels=CHS).init(
                jax.random.PRNGKey(0), jnp.zeros((2, 64, 128, 13)), jnp.zeros((2, 64, 128, 1))
            )["params"],
        ),
    ],
)
def test_roundtrip(kind, build):
    params = build()
    sd = export_torch_state(params, kind)
    # unique names
    assert len(sd) == len(flatten_dict(params))
    back, report = import_torch_state(params, sd, kind, strict=True)
    assert not report["missing"] and not report["unused"]
    for (k1, v1), (k2, v2) in zip(
        sorted(flatten_dict(params).items()), sorted(flatten_dict(back).items())
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_roundtrip_unet(unet_params):
    sd = export_torch_state(unet_params, "unet")
    assert len(sd) == len(flatten_dict(unet_params))
    back, report = import_torch_state(unet_params, sd, "unet", strict=True)
    assert not report["missing"] and not report["unused"]


def test_expected_names_other_models():
    vae_p = AutoencoderKL(block_out_channels=(32, 64)).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_torch_state(vae_p, "vae")
    for name in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert name in sd, name

    clip_p = CLIPTextModel(vocab_size=100, hidden_size=32, num_layers=1, num_heads=2).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    sd = export_torch_state(clip_p, "clip_text")
    for name in [
        "text_model.embeddings.token_embedding.weight",
        "text_model.embeddings.position_embedding.weight",
        "text_model.encoder.layers.0.self_attn.q_proj.weight",
        "text_model.encoder.layers.0.mlp.fc1.weight",
        "text_model.encoder.layers.0.layer_norm1.weight",
        "text_model.final_layer_norm.bias",
    ]:
        assert name in sd, name

    pose_p = CameraPoseEncoder(channels=CHS, temporal_attention_nhead=4).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 6))
    )["params"]
    sd = export_torch_state(pose_p, "pose_encoder")
    for name in [
        "encoder_conv_in.weight",
        "encoder_down_conv_blocks.0.0.block1.weight",
        "encoder_down_conv_blocks.1.0.in_conv.weight",
        "encoder_down_attention_blocks.0.0.attention_blocks.0.to_q.weight",
        "encoder_down_attention_blocks.0.0.ff.net.0.proj.weight",
        "encoder_down_attention_blocks.3.1.ff_norm.weight",
    ]:
        assert name in sd, name

    ad_p = ObjectAdapter(channels=CHS).init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 128, 13)), jnp.zeros((2, 64, 128, 1))
    )["params"]
    sd = export_torch_state(ad_p, "adapter")
    for name in [
        "conv_in.weight",
        "zero_conv_in.weight",
        "zero_conv_out_list.0.weight",
        "body.0.block1.weight",
        "body.2.in_conv.weight",
    ]:
        assert name in sd, name


def test_filter_state_dict():
    sd = {"a.merge.w": 1, "a.lora.w": 2, "b.merge.lora": 3}
    assert set(filter_state_dict(sd, "merge")) == {"a.merge.w", "b.merge.lora"}

"""The inflated 3D UNet — one model covering all three reference variants.

Behavioral parity:
- ``UNet3DConditionModel`` (fmc/models/unet.py:49): use_motion_module=False +
  num_frames=1 degenerates to the SD1.5 2D UNet for stage-1 LoRA training.
- ``UNet3DConditionModelPoseCond`` (unet.py:829): ``pose_features`` input
  threads multi-scale camera features into the temporal attention
  (camera_cond=True installs the zero-init merge in attention block 0 of each
  temporal transformer, matching temporal_attn_names='0', cam.yaml:124).
- ``UNet3DConditionModelCamObjCond`` (fmc/models/unet_cam_obj.py:829):
  ``traj_features`` adds OMC residuals to the down-block outputs.  Quirk
  preserved: the reference's plain 4th down block never receives traj
  features (unet_cam_obj.py:1227-1234) — enable ``traj_on_plain_block`` to
  consciously fix.

TPU-native layout: (B, F, H, W, C) NHWC video, bf16-friendly, no runtime
processor dispatch — all variants are static module configuration.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from synfmc_tpu.models.layers import GroupNorm, TimestepEmbedding, timestep_embedding
from synfmc_tpu.models.unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
    fold,
    unfold,
)


def lora_rank_for(hidden_size: int, lora_rank_cfg: int) -> int:
    """Reference rank rule: rank = cfg if cfg > 16 else hidden // cfg
    (train_image_lora.py:152-170, unet.py:936-948)."""
    if lora_rank_cfg <= 0:
        return 0
    return lora_rank_cfg if lora_rank_cfg > 16 else hidden_size // lora_rank_cfg


class UNet3D(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attn_heads: int = 8  # diffusers 'attention_head_dim' for SD1.5 == num heads
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    # motion module (AnimateDiff)
    use_motion_module: bool = False
    motion_module_mid_block: bool = False
    # Insert motion modules only at these resolutions (downsample factors):
    # down block i has res 2**i, up block i has res 2**(n-1-i)
    # (fmc/models/unet.py:154, 178, 243, 276). Default = all four levels.
    motion_module_resolutions: Sequence[int] = (1, 2, 4, 8)
    motion_num_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    motion_lora_rank: int = 0
    motion_lora_scale: float = 1.0
    # camera conditioning (CMC)
    camera_cond: bool = False
    decoder_add_posecond: bool = True
    pose_cond_blocks: Sequence[int] = (0,)  # temporal_attn_names='0'
    pose_scale: float = 1.0
    # spatial LoRA (stage 1 domain LoRA)
    lora_rank: int = 0  # config divisor; per-layer rank via lora_rank_for
    lora_scale: float = 1.0
    # OMC
    traj_on_plain_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        pose_features: Optional[Sequence[jax.Array]] = None,
        traj_features: Optional[Sequence[jax.Array]] = None,
        deep_cache: Optional[jax.Array] = None,
        return_deep: bool = False,
    ) -> jax.Array:
        """Args:
          sample: (B, F, H, W, in_channels) noisy latents (F=1 for images).
          timesteps: (B,) diffusion timesteps.
          encoder_hidden_states: (B, 77, cross_attention_dim) text embedding.
          pose_features: optional list of 4 (B, F, H/2^i, W/2^i, C_i) camera
            features (camera_cond must be True).
          traj_features: optional list of 4 OMC feature videos, same shapes.
          deep_cache: DeepCache shallow step — a cached up_blocks_2 output
            (B, F, H, W, reversed(chs)[2]); when given, only conv_in →
            down_blocks_0 → up_blocks_3 → conv_out run (the deep levels are
            skipped entirely), reusing the cache as up_blocks_3's input.
          return_deep: also return the up_blocks_2 output so the caller can
            cache it: returns (eps, deep).

        Returns: (B, F, H, W, out_channels) epsilon prediction
          (or (eps, deep) when return_deep).
        """
        chs = list(self.block_out_channels)
        n_blocks = len(chs)
        b, f = sample.shape[:2]
        if pose_features is None:
            pose_features = [None] * n_blocks
        if traj_features is None:
            traj_features = [None] * n_blocks
        pose_blocks = tuple(self.pose_cond_blocks) if self.camera_cond else ()

        # time embedding (fp32 sinusoid -> MLP)
        t_emb = timestep_embedding(jnp.broadcast_to(jnp.asarray(timesteps), (b,)), chs[0])
        temb = TimestepEmbedding(chs[0] * 4, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        x = unfold(
            nn.Conv(chs[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(fold(sample)),
            f,
        )

        mm_res = tuple(self.motion_module_resolutions)

        def motion_at(res: int) -> bool:
            # unet.py:178/276: use_motion_module and (res in motion_module_resolutions)
            return self.use_motion_module and res in mm_res

        motion_kw = dict(
            use_motion_module=self.use_motion_module,
            motion_num_heads=self.motion_num_heads,
            motion_transformer_blocks=self.motion_transformer_blocks,
            motion_attention_blocks=self.motion_attention_blocks,
            motion_pe_max_len=self.motion_pe_max_len,
            motion_zero_initialize=self.motion_zero_initialize,
            motion_lora_rank=self.motion_lora_rank,
            motion_lora_scale=self.motion_lora_scale,
            pose_cond_blocks=pose_blocks,
            pose_scale=self.pose_scale,
        )

        if deep_cache is not None:
            # ---- DeepCache shallow step ----
            # Only the shallowest level runs; deep_cache stands in for the
            # output of up_blocks_2.  Param names match the full path, so the
            # same param tree serves both traces (selected by lax.cond in
            # pipelines/animation.py:denoise_loop).
            assert n_blocks == 4, "deep_cache assumes the 4-level SD1.5 topology"
            _, outs = CrossAttnDownBlock3D(
                out_channels=chs[0],
                num_layers=self.layers_per_block,
                attn_heads=self.attn_heads,
                cross_attention_dim=self.cross_attention_dim,
                add_downsample=True,
                lora_rank=lora_rank_for(chs[0], self.lora_rank),
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name="down_blocks_0",
                **{**motion_kw, "use_motion_module": motion_at(1)},
            )(x, temb, encoder_hidden_states, pose_feature=pose_features[0],
              traj_feature=traj_features[0], run_downsample=False)
            skips = [x] + outs
            x = CrossAttnUpBlock3D(
                out_channels=chs[0],
                num_layers=self.layers_per_block + 1,
                attn_heads=self.attn_heads,
                cross_attention_dim=self.cross_attention_dim,
                add_upsample=False,
                lora_rank=lora_rank_for(chs[0], self.lora_rank),
                lora_scale=self.lora_scale,
                dtype=self.dtype,
                name="up_blocks_3",
                **{**motion_kw, "use_motion_module": motion_at(1)},
            )(
                deep_cache.astype(self.dtype), skips, temb, encoder_hidden_states,
                pose_feature=pose_features[0] if self.decoder_add_posecond else None,
            )
            assert not skips
            h = fold(x)
            h = GroupNorm(self.norm_num_groups, eps=self.norm_eps, act="silu", dtype=self.dtype, name="conv_norm_out")(h)
            h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(h)
            eps = unfold(h, f)
            return (eps, deep_cache) if return_deep else eps

        # ---- down ----
        skips = [x]
        for i, ch in enumerate(chs):
            is_final = i == n_blocks - 1
            if not is_final:  # CrossAttnDownBlock3D x3
                x, outs = CrossAttnDownBlock3D(
                    out_channels=ch,
                    num_layers=self.layers_per_block,
                    attn_heads=self.attn_heads,
                    cross_attention_dim=self.cross_attention_dim,
                    add_downsample=True,
                    lora_rank=lora_rank_for(ch, self.lora_rank),
                    lora_scale=self.lora_scale,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                    **{**motion_kw, "use_motion_module": motion_at(2**i)},
                )(x, temb, encoder_hidden_states, pose_feature=pose_features[i], traj_feature=traj_features[i])
            else:  # plain DownBlock3D
                x, outs = DownBlock3D(
                    out_channels=ch,
                    num_layers=self.layers_per_block,
                    add_downsample=False,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                    **{**motion_kw, "use_motion_module": motion_at(2**i)},
                )(
                    x,
                    temb,
                    pose_feature=pose_features[i],
                    traj_feature=traj_features[i] if self.traj_on_plain_block else None,
                )
            skips.extend(outs)

        # ---- mid ----
        x = UNetMidBlock3DCrossAttn(
            channels=chs[-1],
            attn_heads=self.attn_heads,
            cross_attention_dim=self.cross_attention_dim,
            lora_rank=lora_rank_for(chs[-1], self.lora_rank),
            lora_scale=self.lora_scale,
            dtype=self.dtype,
            name="mid_block",
            **{**motion_kw, "use_motion_module": self.use_motion_module and self.motion_module_mid_block},
        )(x, temb, encoder_hidden_states, pose_feature=pose_features[-1])

        # ---- up ----
        deep = None
        for i in range(n_blocks):
            ch = list(reversed(chs))[i]
            is_final = i == n_blocks - 1
            pose_feat = pose_features[-(i + 1)] if self.decoder_add_posecond else None
            if i == 0:  # plain UpBlock3D mirrors the plain down block
                x = UpBlock3D(
                    out_channels=ch,
                    num_layers=self.layers_per_block + 1,
                    add_upsample=not is_final,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                    **{**motion_kw, "use_motion_module": motion_at(2 ** (n_blocks - 1 - i))},
                )(x, skips, temb, pose_feature=pose_feat)
            else:
                x = CrossAttnUpBlock3D(
                    out_channels=ch,
                    num_layers=self.layers_per_block + 1,
                    attn_heads=self.attn_heads,
                    cross_attention_dim=self.cross_attention_dim,
                    add_upsample=not is_final,
                    lora_rank=lora_rank_for(ch, self.lora_rank),
                    lora_scale=self.lora_scale,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                    **{**motion_kw, "use_motion_module": motion_at(2 ** (n_blocks - 1 - i))},
                )(x, skips, temb, encoder_hidden_states, pose_feature=pose_feat)
            if i == n_blocks - 2:
                deep = x  # up_blocks_2 output: the DeepCache cache point
        assert not skips, f"{len(skips)} unconsumed skip connections"

        # ---- out ---- (frame-wise GN -> SiLU -> conv, unet.py:1288-1293)
        h = fold(x)
        h = GroupNorm(self.norm_num_groups, eps=self.norm_eps, act="silu", dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(h)
        eps = unfold(h, f)
        return (eps, deep) if return_deep else eps


def unet_config_from_yaml(unet_additional_kwargs: dict | None, lora_rank: int = 0, lora_scale: float = 1.0,
                          camera_cond: bool = False, **overrides) -> dict:
    """Map reference YAML unet_additional_kwargs (cam.yaml:96-109) to UNet3D fields."""
    kw = dict(unet_additional_kwargs or {})
    mm = dict(kw.get("motion_module_kwargs", {}) or {})
    cfg = dict(
        use_motion_module=bool(kw.get("use_motion_module", False)),
        motion_module_mid_block=bool(kw.get("motion_module_mid_block", False)),
        motion_module_resolutions=tuple(kw.get("motion_module_resolutions", (1, 2, 4, 8))),
        motion_num_heads=int(mm.get("num_attention_heads", 8)),
        motion_transformer_blocks=int(mm.get("num_transformer_block", 1)),
        motion_attention_blocks=len(mm.get("attention_block_types", ["Temporal_Self", "Temporal_Self"])),
        motion_pe_max_len=int(mm.get("temporal_position_encoding_max_len", 32)),
        motion_zero_initialize=bool(mm.get("zero_initialize", False)),
        lora_rank=int(lora_rank),
        lora_scale=float(lora_scale),
        camera_cond=camera_cond,
    )
    cfg.update(overrides)
    return cfg

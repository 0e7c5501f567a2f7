#!/usr/bin/env python
"""Record torch-reference activations for scripts/parity.py — run this in the
REFERENCE environment (torch + diffusers + the SynFMC repo), then feed the
npz to parity.py on the TPU side:

    # reference side (GPU/CPU box with the SynFMC conda env):
    python scripts/record_reference_acts.py \
        --reference /path/to/SynFMC \
        --config    /path/to/SynFMC/configs/cam.yaml \
        --sd15 /path/to/stable-diffusion-v1-5 \
        --motion-module /path/to/v3_sd15_mm.ckpt \
        --lora-ckpt /path/to/lora.ckpt --cm-ckpt /path/to/cmcm.ckpt \
        --out acts.npz

    # TPU side:
    python scripts/parity.py --sd15 ... --motion-module ... --lora-ckpt ... \
        --cm-ckpt ... --activations acts.npz

The model build/load path mirrors the reference trainer exactly
(train_cam_ctrl.py:222-255 model build + set_all_attn_processor,
train_cam_obj_ctrl.py:282-292 CMC bundle load), so the recorded epsilon is
what the reference would produce in training/inference.

Schema (written by :func:`write_activation_npz`, consumed by parity.py):
  latents   (B, 4, F, h, w)  NCFHW noisy latents fed to the UNet
  timesteps (B,)             int timesteps
  input_ids (B, 77)          CLIP token ids (the SAME ids drive both stacks)
  plucker   (B, 6, F, H, W)  Plucker camera embedding [optional]
  eps       (B, 4, F, h, w)  the reference UNet's epsilon prediction
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_activation_npz(path, latents, timesteps, input_ids, eps, plucker=None):
    """Validate the parity.py activation schema and write the npz.

    Shapes are validated here so a recording produced on the reference side
    fails fast instead of failing later on the TPU side.
    """
    latents = np.asarray(latents, np.float32)
    eps = np.asarray(eps, np.float32)
    timesteps = np.asarray(timesteps)
    input_ids = np.asarray(input_ids, np.int32)
    if latents.ndim != 5:
        raise ValueError(f"latents must be 5D (B,4,F,h,w or B,F,h,w,4), got {latents.shape}")
    if eps.shape != latents.shape:
        raise ValueError(f"eps shape {eps.shape} != latents shape {latents.shape}")
    b = latents.shape[0]
    if timesteps.shape != (b,):
        raise ValueError(f"timesteps must be ({b},), got {timesteps.shape}")
    if input_ids.shape[0] != b or input_ids.ndim != 2:
        raise ValueError(f"input_ids must be ({b}, 77), got {input_ids.shape}")
    arrays = dict(latents=latents, timesteps=timesteps, input_ids=input_ids, eps=eps)
    if plucker is not None:
        plucker = np.asarray(plucker, np.float32)
        if plucker.ndim != 5 or plucker.shape[0] != b:
            raise ValueError(f"plucker must be 5D with batch {b}, got {plucker.shape}")
        arrays["plucker"] = plucker
    np.savez(path, **arrays)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True, help="path to the SynFMC repo checkout")
    p.add_argument("--config", required=True, help="reference cam.yaml")
    p.add_argument("--sd15", required=True, help="stable-diffusion-v1-5 checkpoint dir")
    p.add_argument("--motion-module", default=None, help="AnimateDiff v3 mm ckpt")
    p.add_argument("--lora-ckpt", default=None, help="stage-1 image LoRA ckpt")
    p.add_argument("--cm-ckpt", default=None, help="stage-2 CMC bundle")
    p.add_argument("--prompt", default="a robot walking through a forest, synthetic video")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--timestep", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="acts.npz")
    args = p.parse_args()

    import torch

    sys.path.insert(0, args.reference)
    from omegaconf import OmegaConf

    from transformers import CLIPTextModel, CLIPTokenizer

    # the reference's own model classes — this IS its load path
    from fmc.models.pose_adaptor import CameraPoseEncoder, PoseAdaptor
    from fmc.models.unet import UNet3DConditionModelPoseCond

    cfg = OmegaConf.load(args.config)
    torch.manual_seed(args.seed)

    # --- model build, mirroring train_cam_ctrl.py:222-255 ---
    tokenizer = CLIPTokenizer.from_pretrained(args.sd15, subfolder="tokenizer")
    text_encoder = CLIPTextModel.from_pretrained(args.sd15, subfolder="text_encoder")
    unet = UNet3DConditionModelPoseCond.from_pretrained_2d(
        args.sd15,
        subfolder=cfg.get("unet_subfolder", "unet"),
        unet_additional_kwargs=OmegaConf.to_container(cfg.unet_additional_kwargs),
    )
    pose_encoder = CameraPoseEncoder(**OmegaConf.to_container(cfg.pose_encoder_kwargs))
    unet.set_all_attn_processor(
        add_spatial_lora=args.lora_ckpt is not None,
        add_motion_lora=False,
        lora_kwargs={"lora_rank": cfg.get("lora_rank", 2),
                     "lora_scale": cfg.get("lora_scale", 1.0)},
        motion_lora_kwargs={"lora_rank": -1, "lora_scale": 1.0},
        **OmegaConf.to_container(cfg.attention_processor_kwargs),
    )

    if args.lora_ckpt:
        sd = torch.load(args.lora_ckpt, map_location="cpu")
        sd = sd.get("lora_state_dict", sd)
        _, unexpected = unet.load_state_dict(sd, strict=False)
        assert len(unexpected) == 0, unexpected
    if args.motion_module:
        sd = torch.load(args.motion_module, map_location="cpu")
        if "motion_module_state_dict" in sd:
            sd = {k.replace("module.", ""): v for k, v in sd["motion_module_state_dict"].items()}
        _, unexpected = unet.load_state_dict(sd, strict=False)
        assert len(unexpected) == 0, unexpected
    if args.cm_ckpt:
        # CMC bundle load, train_cam_obj_ctrl.py:282-292
        ckpt = torch.load(args.cm_ckpt, map_location="cpu")
        m, u = pose_encoder.load_state_dict(ckpt["pose_encoder_state_dict"], strict=False)
        assert len(m) == 0 and len(u) == 0, (m, u)
        _, u = unet.load_state_dict(ckpt["attention_processor_state_dict"], strict=False)
        assert len(u) == 0, u

    adaptor = PoseAdaptor(unet, pose_encoder).eval()
    text_encoder.eval()

    # --- record one forward ---
    b, f = 1, args.frames
    hl, wl = args.height // 8, args.width // 8
    g = torch.Generator().manual_seed(args.seed)
    latents = torch.randn(b, 4, f, hl, wl, generator=g)
    timesteps = torch.full((b,), args.timestep, dtype=torch.long)
    enc = tokenizer([args.prompt], padding="max_length", max_length=77,
                    truncation=True, return_tensors="pt")
    plucker = torch.randn(b, 6, f, args.height, args.width, generator=g) * 0.5

    with torch.no_grad():
        text_emb = text_encoder(enc["input_ids"])[0]
        eps = adaptor(latents, timesteps, text_emb, plucker)

    write_activation_npz(
        args.out,
        latents=latents.numpy(),
        timesteps=timesteps.numpy(),
        input_ids=enc["input_ids"].numpy(),
        eps=eps.numpy(),
        plucker=plucker.numpy(),
    )
    print(f"wrote {args.out}: eps std {eps.std().item():.4f}, "
          f"shapes latents={tuple(latents.shape)} plucker={tuple(plucker.shape)}")


if __name__ == "__main__":
    main()

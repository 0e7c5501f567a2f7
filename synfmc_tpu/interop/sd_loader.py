"""Load a diffusers-layout SD1.5 checkpoint directory into our param trees.

The reference points ``pretrained_model_path`` at a local SD1.5 directory
(configs/cam.yaml:2) with subfolders unet/, vae/, text_encoder/, tokenizer/.
Supports both .bin (torch.load) and .safetensors weight files.
"""

from __future__ import annotations

import os

import numpy as np


def _load_weights(folder: str) -> dict[str, np.ndarray]:
    candidates = [
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ]
    for name in candidates:
        path = os.path.join(folder, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return dict(load_file(path))
            from synfmc_tpu.training.checkpoint import torch_load_state_dict

            return torch_load_state_dict(path)
    raise FileNotFoundError(f"no weight file found in {folder} (tried {candidates})")


def load_sd15(params: dict, sd_dir: str, unet_subfolder: str = "unet") -> dict:
    """Fill unet (spatial), vae, and text params from an SD1.5 directory.

    Motion modules / pose merges / LoRA branches remain at their current
    values (they are not part of SD1.5) — the import is non-strict for the
    unet and strict for vae/text.
    """
    from synfmc_tpu.interop.torch_port import import_torch_state

    out = dict(params)
    unet_sd = _load_weights(os.path.join(sd_dir, unet_subfolder))
    out["unet"], report = import_torch_state(out["unet"], unet_sd, "unet", strict=False)
    # every SD1.5 tensor must land somewhere in our tree
    assert not report["unused"], f"unconsumed SD1.5 unet keys: {report['unused'][:5]}"

    vae_dir = os.path.join(sd_dir, "vae")
    if os.path.isdir(vae_dir) and "vae" in out:
        vae_sd = _load_weights(vae_dir)
        out["vae"], report = import_torch_state(out["vae"], vae_sd, "vae", strict=True)
        assert not report["unused"], f"unconsumed VAE keys: {report['unused'][:5]}"

    text_dir = os.path.join(sd_dir, "text_encoder")
    if os.path.isdir(text_dir) and "text" in out:
        text_sd = _load_weights(text_dir)
        out["text"], report = import_torch_state(out["text"], text_sd, "clip_text", strict=True)
        assert not report["unused"], f"unconsumed text-encoder keys: {report['unused'][:5]}"
    return out

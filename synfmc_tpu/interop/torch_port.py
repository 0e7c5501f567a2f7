"""torch <-> flax weight porting.

The PSNR>=35 parity target (BASELINE.md) requires loading the exact reference
weights: SD1.5 (diffusers UNet2D/VAE/CLIP), AnimateDiff-v3 motion modules,
and the reference's own stage-1/2/3 checkpoint bundles
(train_image_lora.py:387-396, train_cam_ctrl.py:669-684,
train_cam_obj_ctrl.py:948-980).

Approach: our param-tree paths map deterministically to torch state-dict
names via per-model rule tables; tensor layout converts by leaf kind
(conv OIHW->HWIO, linear transpose, norm weight->scale).  The mapping is
driven by OUR tree, so import reports exactly which torch keys were consumed
and which flax leaves were left uninitialized.
"""

from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# ---------------------------------------------------------------------------
# leaf-level layout conversion
# ---------------------------------------------------------------------------


def torch_to_flax_tensor(name: str, t: np.ndarray, flax_leaf: str) -> np.ndarray:
    t = np.asarray(t)
    if flax_leaf == "kernel":
        if t.ndim == 4:  # conv OIHW -> HWIO
            return t.transpose(2, 3, 1, 0)
        if t.ndim == 2:  # linear (out, in) -> (in, out)
            return t.T
        raise ValueError(f"unexpected kernel ndim for {name}: {t.shape}")
    return t  # scale / bias / embedding / raw params


def flax_to_torch_tensor(t: np.ndarray, flax_leaf: str) -> np.ndarray:
    t = np.asarray(t)
    if flax_leaf == "kernel":
        if t.ndim == 4:
            return t.transpose(3, 2, 0, 1)
        if t.ndim == 2:
            return t.T
    return t


_LEAF_TO_TORCH = {"kernel": "weight", "scale": "weight", "bias": "bias", "embedding": "weight"}

# Containers whose numeric suffix becomes a torch ModuleList index.  NOT in
# this list (underscore/digit preserved verbatim): linear_1/linear_2, block1,
# block2, norm1..norm3, layer_norm1/2, mlp_fc1/2, conv1/conv2, attn1/attn2.
_CONTAINERS = (
    "down_blocks|up_blocks|resnets|attentions|motion_modules|transformer_blocks"
    "|attention_blocks|norms|blocks|downsamplers|upsamplers|layers|body|net"
)
_CONTAINER_RULE = (rf"\b({_CONTAINERS})_(\d+)", r"\1.\2")


def _apply_rules(path: str, rules) -> str:
    for pat, rep in rules:
        path = re.sub(pat, rep, path)
    return path


def _name(path: str, leaf: str) -> str:
    return path.replace("/", ".") + "." + _LEAF_TO_TORCH[leaf]


# ---------------------------------------------------------------------------
# model-specific converters: flax path parts -> torch state-dict name
# ---------------------------------------------------------------------------


def unet_path_to_torch(parts: tuple[str, ...]) -> str:
    """Our UNet3D paths -> diffusers UNet2D / AnimateDiff / reference names.

    Examples:
      down_blocks_0/attentions_1/blocks_0/attn1/to_q/kernel
        -> down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight
      down_blocks_0/motion_modules_0/norm/scale
        -> down_blocks.0.motion_modules.0.temporal_transformer.norm.weight
      .../attention_blocks_0/qkv_merge/kernel
        -> ...attention_blocks.0.processor.qkv_merge.weight
      .../attn1/to_q_lora/down/kernel -> ...attn1.processor.to_q_lora.down.weight
    """
    leaf, path = parts[-1], "/".join(parts[:-1])
    rules = [
        (r"\bnet_0_proj\b", "net_0/proj"),  # GEGLU: ff.net.0.proj
        _CONTAINER_RULE,
        # SpatialTransformer blocks are 'transformer_blocks' in diffusers
        (r"/blocks\.(\d+)", r"/transformer_blocks.\1"),
        # motion modules nest under .temporal_transformer
        (r"(motion_modules\.\d+)/", r"\1/temporal_transformer/"),
        # LoRA branches and pose merges live under .processor in torch
        (r"/(to_(?:q|k|v|out)_lora)(/|$)", r"/processor/\1\2"),
        (r"/(qkv_merge|q_merge|kv_merge)$", r"/processor/\1"),
        # torch Attention to_out is ModuleList [linear, dropout]
        (r"/to_out$", "/to_out/0"),
    ]
    return _name(_apply_rules(path, rules), leaf)


def vae_path_to_torch(parts: tuple[str, ...]) -> str:
    """Our AutoencoderKL paths -> diffusers names.

    encoder/down_blocks_0_resnets_1/conv1 -> encoder.down_blocks.0.resnets.1.conv1
    decoder/mid_block/attentions_0/to_out -> decoder.mid_block.attentions.0.to_out.0
    """
    leaf, path = parts[-1], "/".join(parts[:-1])
    rules = [
        (r"(\d)_(resnets|downsamplers|upsamplers)", r"\1/\2"),  # composite names
        _CONTAINER_RULE,
        (r"/to_out$", "/to_out/0"),
    ]
    return _name(_apply_rules(path, rules), leaf)


def clip_path_to_torch(parts: tuple[str, ...]) -> str:
    """Our CLIPTextModel paths -> HF transformers names (text_model.*)."""
    if parts == ("position_embedding",):
        return "text_model.embeddings.position_embedding.weight"
    leaf, path = parts[-1], "/".join(parts[:-1])
    rules = [
        _CONTAINER_RULE,
        (r"^layers\.", "encoder/layers."),
        (r"/mlp_fc(\d)", r"/mlp/fc\1"),
        (r"^token_embedding$", "embeddings/token_embedding"),
    ]
    return "text_model." + _name(_apply_rules(path, rules), leaf)


def pose_encoder_path_to_torch(parts: tuple[str, ...]) -> str:
    """Our CameraPoseEncoder paths -> reference names
    (fmc/models/pose_adaptor.py:159-240)."""
    leaf, path = parts[-1], "/".join(parts[:-1])
    m = re.match(r"^blocks_(\d+)_(\d+)_(conv|attn)(/.*)?$", path)
    if m:
        i, j, kind, rest = m.groups()
        base = "encoder_down_conv_blocks" if kind == "conv" else "encoder_down_attention_blocks"
        path = f"{base}.{i}.{j}{rest or ''}"
    elif path.startswith("conv_in"):
        path = path.replace("conv_in", "encoder_conv_in", 1)
    rules = [
        (r"\bnet_0_proj\b", "net_0/proj"),
        _CONTAINER_RULE,
        (r"/to_out$", "/to_out/0"),
    ]
    return _name(_apply_rules(path, rules), leaf)


def adapter_path_to_torch(parts: tuple[str, ...]) -> str:
    """Our ObjectAdapter paths -> reference Adapter names (fmc/adapter.py:109-146)."""
    leaf, path = parts[-1], "/".join(parts[:-1])
    rules = [
        (r"^zero_conv_out_(\d+)", r"zero_conv_out_list.\1"),
        _CONTAINER_RULE,
    ]
    return _name(_apply_rules(path, rules), leaf)


_CONVERTERS: dict[str, Callable[[tuple[str, ...]], str]] = {
    "unet": unet_path_to_torch,
    "vae": vae_path_to_torch,
    "clip_text": clip_path_to_torch,
    "pose_encoder": pose_encoder_path_to_torch,
    "adapter": adapter_path_to_torch,
}

# torch keys with no flax counterpart (fixed buffers, etc.)
_IGNORABLE = re.compile(r"(pos_encoder\.pe|num_batches_tracked|position_ids)$")


def import_torch_state(
    params_template: dict,
    state_dict: Mapping[str, np.ndarray],
    model_kind: str,
    strict: bool = True,
    prefix: str = "",
) -> tuple[dict, dict]:
    """Fill a flax param tree from a torch state dict.

    Returns (params, report); report = {'missing': [...], 'unused': [...]}.
    strict=True raises when template leaves lack torch sources — the analog of
    the reference's post-load asserts (train_cam_ctrl.py:242-254, 484-489).
    """
    conv = _CONVERTERS[model_kind]
    flat = flatten_dict(params_template)
    out, used, missing = {}, set(), []
    for key, value in flat.items():
        parts = tuple(str(k) for k in key)
        tname = prefix + conv(parts)
        if tname in state_dict:
            t = torch_to_flax_tensor(tname, np.asarray(state_dict[tname]), parts[-1])
            if t.shape != tuple(value.shape):
                raise ValueError(f"shape mismatch {tname}: torch {t.shape} vs flax {value.shape}")
            out[key] = t.astype(np.asarray(value).dtype)
            used.add(tname)
        else:
            missing.append((".".join(parts), tname))
            out[key] = value
    unused = [k for k in state_dict if k not in used and not _IGNORABLE.search(k)]
    if strict and missing:
        raise KeyError(f"missing torch sources for {len(missing)} leaves, e.g. {missing[:5]}")
    return unflatten_dict(out), {"missing": missing, "unused": unused}


def export_torch_state(params: dict, model_kind: str, prefix: str = "") -> dict[str, np.ndarray]:
    """Flax param tree -> torch-style state dict (reference-compatible
    checkpoint bundles)."""
    conv = _CONVERTERS[model_kind]
    out = {}
    for key, value in flatten_dict(params).items():
        parts = tuple(str(k) for k in key)
        out[prefix + conv(parts)] = flax_to_torch_tensor(np.asarray(value), parts[-1])
    return out


def filter_state_dict(state_dict: Mapping[str, np.ndarray], pattern: str) -> dict:
    rx = re.compile(pattern)
    return {k: v for k, v in state_dict.items() if rx.search(k)}


# ---------------------------------------------------------------------------
# torch AdamW optimizer-state export
# ---------------------------------------------------------------------------

# Sibling order within each reference module, replicating torch's
# named_parameters() order (module-definition order, not alphabetical).
# Values only ever compare between true siblings, so reuse across contexts is
# safe.  Sources: diffusers Attention (to_q..to_out, processor set last in
# __init__); reference LoRAAttnProcessor (attention_processor.py:103-107),
# ResnetBlock (fmc/adapter.py:64-82), TemporalTransformerBlock
# (motion_module.py:258-286), TemporalTransformer3DModel (motion_module.py:93),
# CameraPoseEncoder (pose_adaptor.py:176-216), Adapter (fmc/adapter.py:118-146).
_NAMED_PARAM_ORDER = {
    "to_q": 0, "to_k": 1, "to_v": 2, "to_out": 3, "processor": 4,
    "to_q_lora": 0, "to_k_lora": 1, "to_v_lora": 2, "to_out_lora": 3,
    "in_conv": 0, "block1": 1, "block2": 2, "skep": 3, "down_opt": 4,
    "attention_blocks": 0, "norms": 1, "ff": 2, "ff_norm": 3,
    "norm": 0, "proj_in": 1, "transformer_blocks": 2, "proj_out": 3,
    "encoder_down_conv_blocks": 0, "encoder_down_attention_blocks": 1,
    "encoder_conv_in": 2,
    "body": 0, "conv_in": 1, "zero_conv_in": 2, "zero_conv_out_list": 3,
    "down_blocks": 5, "mid_block": 6, "up_blocks": 7,
    "weight": 0, "bias": 1,
}


def _np_order_key(name: str):
    key = []
    for p in name.split("."):
        if p.isdigit():
            key.append((1, int(p), ""))
        elif p in _NAMED_PARAM_ORDER:
            key.append((0, _NAMED_PARAM_ORDER[p], ""))
        else:
            key.append((2, 0, p))
    return key


def torch_parameter_order(names) -> list[str]:
    """Sort torch state-dict names into torch ``named_parameters()`` order
    (depth-first module-definition order) — the positional order torch
    optimizers key their per-param state by."""
    return sorted(names, key=_np_order_key)


# torch.optim.AdamW param_group keys beyond the hyperparameters; load_state_dict
# restores groups verbatim, so every key AdamW.step() reads must be present.
_ADAMW_GROUP_DEFAULTS = {
    "amsgrad": False, "maximize": False, "foreach": None,
    "capturable": False, "differentiable": False, "fused": None,
}


def export_adamw_state_dict(
    segments: list[tuple[dict, dict, str]],
    count: int,
    lr: float,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> dict:
    """optax Adam moments -> a torch.optim.AdamW ``state_dict()``.

    ``segments``: ordered list of (mu_subtree, nu_subtree, model_kind) in the
    reference's trainable_params concatenation order (train_image_lora.py:
    178-188 lora only; train_cam_ctrl.py:276-284 encoder then merge;
    train_cam_obj_ctrl.py:335-406 [cm encoder+merge] + [mm] + omcm + [lora]).
    Within each segment parameters follow torch named_parameters() order via
    ``torch_parameter_order``.  optax's mu/nu are the bias-uncorrected
    exp_avg/exp_avg_sq torch stores, and optax's count is torch's per-param
    'step', so the mapping is value-exact.

    The extra ``param_names`` key records the torch state-dict name at each
    index; torch.optim.Optimizer.load_state_dict only reads 'state' and
    'param_groups', so the key is inert there but makes the positional
    mapping auditable.
    """
    import torch

    names: list[str] = []
    state: dict[int, dict] = {}
    for mu_tree, nu_tree, kind in segments:
        conv = _CONVERTERS[kind]
        mu_flat = {conv(tuple(str(k) for k in key)): (value, key)
                   for key, value in flatten_dict(mu_tree).items()}
        nu_flat = {conv(tuple(str(k) for k in key)): value
                   for key, value in flatten_dict(nu_tree).items()}
        for name in torch_parameter_order(mu_flat):
            mu, key = mu_flat[name]
            leaf = str(key[-1])
            state[len(names)] = {
                "step": torch.tensor(float(count)),
                "exp_avg": torch.from_numpy(
                    np.ascontiguousarray(flax_to_torch_tensor(np.asarray(mu, np.float32), leaf))
                ),
                "exp_avg_sq": torch.from_numpy(
                    np.ascontiguousarray(flax_to_torch_tensor(np.asarray(nu_flat[name], np.float32), leaf))
                ),
            }
            names.append(name)
    group = {
        "lr": lr, "betas": tuple(betas), "eps": eps, "weight_decay": weight_decay,
        "initial_lr": lr, **_ADAMW_GROUP_DEFAULTS, "params": list(range(len(names))),
    }
    return {"state": state, "param_groups": [group], "param_names": names}

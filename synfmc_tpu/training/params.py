"""Parameter partitioning: trainable vs frozen subsets per training stage.

The reference drives trainability through ``requires_grad`` flags selected by
name reflection (train_cam_ctrl.py:277-284, train_cam_obj_ctrl.py:337-406).
Here the same name rules partition the param pytree; gradients are computed
only for the trainable subtree (memory-proportional to what trains).
"""

from __future__ import annotations

from typing import Callable

import jax
from flax.traverse_util import flatten_dict, unflatten_dict

PathPredicate = Callable[[str], bool]


def partition_params(params: dict, predicate: PathPredicate) -> tuple[dict, dict]:
    """Split a nested param dict into (trainable, frozen) by '/'-joined path."""
    flat = flatten_dict(params)
    trainable, frozen = {}, {}
    for key, value in flat.items():
        path = "/".join(str(k) for k in key)
        (trainable if predicate(path) else frozen)[key] = value
    return unflatten_dict(trainable), unflatten_dict(frozen)


def merge_params(*trees: dict) -> dict:
    """Inverse of partition_params (later trees win on conflicts)."""
    flat: dict = {}
    for tree in trees:
        if tree:
            flat.update(flatten_dict(tree))
    return unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


# ---- stage predicates (path rules mirror the reference name rules) ----


def stage1_lora_trainable(path: str) -> bool:
    """Stage 1: LoRA branches only (train_image_lora.py:178-188)."""
    return "lora" in path


def stage2_cmc_unet_trainable(path: str) -> bool:
    """Stage 2 UNet subset: 'merge' in name and 'lora' not in name
    (train_cam_ctrl.py:277-284).  The pose encoder trains fully (separate tree)."""
    return "merge" in path and "lora" not in path


def stage3_mm_trainable(path: str) -> bool:
    """train_mm option: norm/proj_in/proj_out of every temporal transformer
    (train_cam_obj_ctrl.py:367-384)."""
    if "motion_modules" not in path:
        return False
    leaf_owner = path.split("/")[-2] if "/" in path else path
    return leaf_owner in ("norm", "proj_in", "proj_out")


def stage3_unet_trainable(path: str, train_cm: bool = False, train_mm: bool = False,
                          train_image_lora: bool = False) -> bool:
    """Stage 3 UNet subset (the adapter itself always trains fully)."""
    if train_cm and stage2_cmc_unet_trainable(path):
        return True
    if train_mm and stage3_mm_trainable(path):
        return True
    if train_image_lora and "lora" in path:
        return True
    return False

"""Checkpoint save/resume.

Two formats:
1. **Native (Orbax)** — full TrainState (step, trainable, optimizer state)
   for exact resume, replacing the reference's torch.save resume dicts
   (train_image_lora.py:282-296, train_cam_ctrl.py:467-495).
2. **Reference-compatible bundles** (torch.save) with the same logical
   layout, so weights interconvert with the PyTorch reference:
   - stage 1: {epoch, global_step, lora_state_dict}
     (train_image_lora.py:387-396)
   - stage 2: {epoch, global_step, pose_encoder_state_dict,
     attention_processor_state_dict} (train_cam_ctrl.py:669-684)
   - stage 3: separate cmcm/omcm/img-lora files
     (train_cam_obj_ctrl.py:948-980)
   Every bundle carries ``epoch``, ``global_step`` and an
   ``optimizer_state_dict`` in torch.optim.AdamW format (optax Adam moments
   re-indexed into the reference's trainable_params positional order), so
   the reference's own resume path (train_image_lora.py:282-296,
   train_cam_ctrl.py:467-495) can consume a run started here.  Note the
   reference itself skips optimizer restore in stage 3 (574-578).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# native orbax checkpoints
# ---------------------------------------------------------------------------


def _ckptr():
    import orbax.checkpoint as ocp

    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    # Multi-process: saves happen on rank 0 only, from HOST trees gathered
    # by fetch_to_host — so scope Orbax's internal barriers to THIS process.
    # A default (global-barrier) save from one rank desyncs the other ranks'
    # training collectives: observed as a gloo "preamble.length 64 vs 2"
    # crash in tests/test_multihost.py when rank 0 checkpointed.
    opts = ocp.options.MultiprocessingOptions(
        primary_host=None,
        active_processes={jax.process_index()},
        barrier_sync_key_prefix=f"synfmc-p{jax.process_index()}",
    )
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(), multiprocessing_options=opts
    )


def save_native(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a TrainState (or any pytree) under ckpt_dir/step-N.

    ``fetch_to_host`` (not a bare device_get) so ZeRO-sharded leaves whose
    fsdp groups have local replicas assemble without a collective; the
    trainer pre-gathers any layout that genuinely spans processes.
    """
    from synfmc_tpu.parallel.mesh import fetch_to_host

    path = os.path.join(os.path.abspath(ckpt_dir), f"step-{step}")
    _ckptr().save(path, fetch_to_host(state))
    return path


def restore_native(path: str, template: Any) -> Any:
    """Restore an Orbax bundle against ``template``'s structure.

    The template is reduced to ShapeDtypeStructs first, so callers can pass
    the LIVE device state without it ever being fetched to host — at full
    scale that fetch is gigabytes through the device transport (and is what
    made resume flaky over the tunnel).  Restored leaves come back as host
    numpy; the caller re-shards (trainers.py replicates onto the mesh).
    """
    import jax

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") and hasattr(x, "dtype") else x,
        template,
    )
    return _ckptr().restore(path, item=abstract)


def find_auto_resume(output_dir: str, name: str) -> Optional[str]:
    """Latest Orbax bundle across this job's timestamped run dirs.

    ``resume_from: auto`` support: run dirs are ``{output_dir}/{name}-<ts>``
    (a restarted job gets a FRESH dir, so plain latest_native can't see the
    previous attempt).  Scans every ``{name}-*/checkpoints`` and returns the
    highest-step bundle (ties: newest mtime), or None when this is the first
    attempt.  The reference has no equivalent — a crash there means manually
    editing ``resume_from`` (SURVEY.md §5 failure detection: "none").
    """
    if not os.path.isdir(output_dir):
        return None
    # match exactly this job's dirs: {name}-%Y-%m-%dT%H-%M (a job named
    # "cam" must not pick up "cam-hires-..." checkpoints)
    pat = re.compile(re.escape(name) + r"-\d{4}-\d{2}-\d{2}T\d{2}-\d{2}$")
    best: tuple[int, float, str] | None = None
    for run in os.listdir(output_dir):
        if run != name and not pat.match(run):
            continue
        path = latest_native(os.path.join(output_dir, run, "checkpoints"))
        if path is None:
            continue
        step = int(os.path.basename(path)[5:])
        key = (step, os.path.getmtime(path), path)
        if best is None or key[:2] > best[:2]:
            best = key
    return best[2] if best else None


def latest_native(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step-") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step-{max(steps)}")


# ---------------------------------------------------------------------------
# reference-compatible torch bundles
# ---------------------------------------------------------------------------


def adam_moments(opt_state) -> Optional[tuple]:
    """Locate the ScaleByAdamState inside an optax chain state.

    Returns ``(count, mu, nu)`` — the bias-uncorrected first/second moments
    torch AdamW stores as per-param ``exp_avg``/``exp_avg_sq`` with ``step``
    — or None when the optimizer carries no Adam state.
    """
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu") and hasattr(opt_state, "count"):
        return opt_state.count, opt_state.mu, opt_state.nu
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = adam_moments(sub)
            if found is not None:
                return found
    return None


def _torch_save(obj: dict, path: str) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(
        jax.tree_util.tree_map(
            lambda x: torch.from_numpy(np.ascontiguousarray(x)) if isinstance(x, np.ndarray) else x,
            obj,
        ),
        path,
    )


def torch_load_state_dict(path: str) -> dict:
    """Load a torch checkpoint into a dict of numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else x

    return jax.tree_util.tree_map(to_np, obj)


def save_stage1_bundle(path: str, lora_params: dict, epoch: int, global_step: int,
                       optimizer_state_dict: Optional[dict] = None) -> None:
    """lora_params: the trainable-unet subtree (LoRA branches only).

    ``optimizer_state_dict`` is a torch.optim.AdamW state dict (built by
    ``interop.torch_port.export_adamw_state_dict``) so the reference's resume
    path (train_image_lora.py:282-296) can continue a run started here; the
    key is always present (None when the caller has no Adam state) so
    consumers can rely on the reference bundle schema.
    """
    from synfmc_tpu.interop.torch_port import export_torch_state

    _torch_save(
        {
            "epoch": epoch,
            "global_step": global_step,
            "lora_state_dict": export_torch_state(jax.device_get(lora_params), "unet"),
            "optimizer_state_dict": optimizer_state_dict,
        },
        path,
    )


def save_stage2_bundle(
    path: str, pose_encoder_params: dict, merge_params: dict, epoch: int, global_step: int,
    mm_params: Optional[dict] = None, optimizer_state_dict: Optional[dict] = None,
) -> None:
    from synfmc_tpu.interop.torch_port import export_torch_state

    bundle = {
        "epoch": epoch,
        "global_step": global_step,
        "optimizer_state_dict": optimizer_state_dict,
        "pose_encoder_state_dict": export_torch_state(
            jax.device_get(pose_encoder_params), "pose_encoder"
        ),
        "attention_processor_state_dict": export_torch_state(
            jax.device_get(merge_params), "unet"
        ),
    }
    if mm_params:
        bundle["mm_state_dict"] = export_torch_state(jax.device_get(mm_params), "unet")
    _torch_save(bundle, path)


def save_stage3_bundles(
    out_dir: str, global_step: int,
    omcm_params: dict,
    pose_encoder_params: Optional[dict] = None,
    merge_params: Optional[dict] = None,
    mm_params: Optional[dict] = None,
    lora_params: Optional[dict] = None,
    epoch: int = 0,
    optimizer_state_dict: Optional[dict] = None,
) -> list[str]:
    """Separate cmcm/omcm/img-lora files (train_cam_obj_ctrl.py:948-980).

    ``epoch`` rides every bundle and the AdamW ``optimizer_state_dict`` rides
    the omcm file (the one whose global_step the reference's stage-3 resume
    reads, train_cam_obj_ctrl.py:574-578 — note the reference itself never
    restores stage-3 optimizer state, so the export is forward-looking).

    ``merge_params`` must be the merge-only subtree ('merge' in k, 'lora' not
    in k) — the reference's cmcm bundle filters to exactly those names
    (train_cam_obj_ctrl.py:955-957).  ``mm_params`` (train_mm norm/proj),
    which the reference trains but never writes to ANY stage-3 bundle, ride
    an extra ``mm_state_dict`` key on the omcm file so a pure-torch consumer
    doesn't lose them; reference loaders read keys positionally and ignore it.
    """
    from synfmc_tpu.interop.torch_port import export_torch_state

    paths = []
    omcm_path = os.path.join(out_dir, f"omcm-step-{global_step}.ckpt")
    omcm_bundle = {
        "epoch": epoch,
        "global_step": global_step,
        "omcm_state_dict": export_torch_state(jax.device_get(omcm_params), "adapter"),
        "optimizer_state_dict": optimizer_state_dict,
    }
    if mm_params:
        omcm_bundle["mm_state_dict"] = export_torch_state(
            jax.device_get(mm_params), "unet"
        )
    _torch_save(omcm_bundle, omcm_path)
    paths.append(omcm_path)
    if pose_encoder_params is not None:
        cmcm_path = os.path.join(out_dir, f"cmcm-step-{global_step}.ckpt")
        _torch_save(
            {
                "epoch": epoch,
                "global_step": global_step,
                "pose_encoder_state_dict": export_torch_state(
                    jax.device_get(pose_encoder_params), "pose_encoder"
                ),
                "attention_processor_state_dict": export_torch_state(
                    jax.device_get(merge_params or {}), "unet"
                ),
            },
            cmcm_path,
        )
        paths.append(cmcm_path)
    if lora_params is not None:
        lora_path = os.path.join(out_dir, f"img-lora-step-{global_step}.ckpt")
        _torch_save(
            {
                "epoch": epoch,
                "global_step": global_step,
                "lora_state_dict": export_torch_state(jax.device_get(lora_params), "unet"),
            },
            lora_path,
        )
        paths.append(lora_path)
    return paths


# ---------------------------------------------------------------------------
# loading reference checkpoints into our trees
# ---------------------------------------------------------------------------


def load_into_params(params_template: dict, state_dict: dict, model_kind: str) -> dict:
    """Partial load: fill whatever the state dict covers; assert the state
    dict is fully consumed (the reference's `assert len(unexpected)==0`
    pattern, train_cam_ctrl.py:242-254)."""
    from synfmc_tpu.interop.torch_port import import_torch_state

    params, report = import_torch_state(params_template, state_dict, model_kind, strict=False)
    assert not report["unused"], f"unconsumed checkpoint keys: {report['unused'][:5]}"
    return params

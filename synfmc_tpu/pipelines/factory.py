"""Config -> AnimationPipeline assembly, shared by the inference surfaces
(scripts/generate.py CLI, scripts/serve.py daemon).

Mirrors the reference's pipeline construction in its validation passes
(train_cam_ctrl.py:222-255 model build + CameraCtrlPipeline assembly) with
the same checkpoint-loading semantics as training: placeholder paths skip
quietly, configured-but-missing paths fail or log loudly, and stage-3
demands a trained CMC bundle (train_cam_obj_ctrl.py:280).
"""

from __future__ import annotations

from typing import Optional


def build_pipeline(
    config,
    *,
    stage: Optional[str] = None,
    seed: int = 42,
    video_length: int = 16,
    lora_ckpt: Optional[str] = None,
    cm_ckpt: Optional[str] = None,
    omcm_ckpt: Optional[str] = None,
    allow_untrained_cm: bool = False,
    data_parallel: int = 0,
    frame_parallel: int = 0,
    batch: int = 1,
    logger=None,
):
    """Build an AnimationPipeline from a (reference-compatible) config.

    Returns (pipe, info) where info carries ``sample_size``, ``stage`` and
    the raw ``models``/``params`` trees for callers that need them.
    """
    import jax
    import jax.numpy as jnp

    from synfmc_tpu.data.tokenizer import load_tokenizer
    from synfmc_tpu.diffusion import DiffusionSchedule
    from synfmc_tpu.pipelines import AnimationPipeline
    from synfmc_tpu.training import checkpoint as ckpt
    from synfmc_tpu.training.trainers import (
        build_models,
        init_params,
        load_pretrained,
        validate_pretrained_paths,
    )
    from synfmc_tpu.utils.logger import setup_logger

    logger = logger or setup_logger(None, 0)
    for key, val in (("lora_ckpt", lora_ckpt), ("pretrained_cm_path", cm_ckpt)):
        if val:
            config[key] = val
    if stage is None:
        stage = "obj" if omcm_ckpt else "cam"
    if allow_untrained_cm:
        config["allow_untrained_cm"] = True
    # Stage-3 inference with a random pose encoder produces garbage while
    # looking healthy; same fail-fast guard as train().
    validate_pretrained_paths(config, stage)

    train_params = config.get_path("train_data.params", {}) or {}
    sample_size = tuple(train_params.get("sample_size", (256, 384)))
    dtype = jnp.bfloat16 if config.get("mixed_precision_training", True) else jnp.float32

    models = build_models(config, stage, dtype=dtype)
    params = init_params(models, config, stage, jax.random.PRNGKey(seed),
                         sample_size, video_length)
    params, _ = load_pretrained(params, config, stage, logger)
    if omcm_ckpt:
        bundle = ckpt.torch_load_state_dict(omcm_ckpt)
        params["adapter"] = ckpt.load_into_params(
            params["adapter"], bundle["omcm_state_dict"], "adapter"
        )

    schedule = DiffusionSchedule.from_config(**(config.get("noise_scheduler_kwargs") or {}))
    mesh = None
    if frame_parallel:
        from synfmc_tpu.parallel import create_serving_mesh

        ndata = 2 * batch  # CFG pair rides 'data' (see pipelines/animation.py)
        mesh = create_serving_mesh(
            num_data=ndata, num_sp=frame_parallel,
            devices=jax.devices()[: ndata * frame_parallel],
        )
    elif data_parallel:
        from synfmc_tpu.parallel import create_mesh

        mesh = create_mesh(num_data=data_parallel,
                           devices=jax.devices()[:data_parallel])

    pipe = AnimationPipeline(
        unet=models["unet"], unet_params={"params": params["unet"]},
        vae=models["vae"], vae_params={"params": params["vae"]},
        text_encoder=models["text"], text_params={"params": params["text"]},
        tokenizer=load_tokenizer(config.get("pretrained_model_path"),
                                 strict=bool(config.get("strict_pretrained", False))),
        schedule=schedule,
        pose_encoder=models.get("pose_encoder"),
        pose_encoder_params={"params": params["pose_encoder"]} if "pose_encoder" in params else None,
        adapter=models.get("adapter"),
        adapter_params={"params": params.get("adapter")} if "adapter" in params else None,
        mesh=mesh,
    )
    info = dict(stage=stage, sample_size=sample_size, models=models, params=params,
                schedule=schedule, mesh=mesh)
    return pipe, info

"""Stage trainer orchestration — the `main(**config)` drivers.

TPU-native rebuild of the reference training entry points
(train_image_lora.py:65, train_cam_ctrl.py:124, train_cam_obj_ctrl.py:125):
timestamped run dirs + config echo, pretrained/stage-checkpoint loading with
post-load asserts, per-stage trainable selection, the jitted train step over
a data-parallel mesh, periodic logging with data/step timing + ETA,
native + reference-compatible checkpoints, and validation renders.

The reference's launcher trichotomy (pytorch/slurm/single,
train_cam_ctrl.py:92-121) collapses to "one JAX process per host":
multi-host runs call jax.distributed.initialize() before main.
"""

from __future__ import annotations

import datetime
import os
import signal
import threading
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synfmc_tpu.config import ConfigDict, save_config
from synfmc_tpu.data.dataset import UnrealTrajLoraDataset, UnrealTrajVideoDataset
from synfmc_tpu.data.loader import ShardedLoader
from synfmc_tpu.data.tokenizer import load_tokenizer
from synfmc_tpu.diffusion import DiffusionSchedule
from synfmc_tpu.models.adapter import ObjectAdapter
from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.pose_encoder import CameraPoseEncoder
from synfmc_tpu.models.unet3d import UNet3D, unet_config_from_yaml
from synfmc_tpu.models.vae import AutoencoderKL
from jax.sharding import NamedSharding, PartitionSpec as P

from synfmc_tpu.parallel import (
    create_mesh,
    fetch_to_host,
    is_main_process,
    replicate,
    shard_batch,
    shard_over_fsdp,
    state_shardings,
    tree_locally_coverable,
)
from synfmc_tpu.training import checkpoint as ckpt
from synfmc_tpu.training.optim import make_lr_schedule, make_optimizer
from synfmc_tpu.training.pipeline_io import (
    AsyncCheckpointWriter,
    ThreadPrefetcher,
    snapshot_fits_on_device,
    snapshot_on_device,
)
from synfmc_tpu.training.params import (
    count_params,
    merge_params,
    partition_params,
    stage1_lora_trainable,
    stage2_cmc_unet_trainable,
    stage3_mm_trainable,
    stage3_unet_trainable,
)
from synfmc_tpu.training.steps import (
    StepConfig,
    step_from_grads,
    init_train_state,
    make_accumulating_step,
    make_cam_grads_fn,
    make_lora_grads_fn,
    make_obj_grads_fn,
)
from synfmc_tpu.utils.logger import format_time, setup_logger


# ---------------------------------------------------------------------------
# model factory
# ---------------------------------------------------------------------------

SD15_TEXT = dict(vocab_size=49408, hidden_size=768, num_layers=12, num_heads=12)


def _attn_block_indices(v) -> tuple:
    """attention_processor_kwargs.temporal_attn_names ('0', 0, [0, 1]) ->
    attention-block indices (cam.yaml:124: the merge installs in attention
    block '0' of each temporal transformer)."""
    if isinstance(v, (list, tuple)):
        return tuple(int(x) for x in v)
    return tuple(int(x) for x in str(v).split(","))


def build_models(config: ConfigDict, stage: str, dtype=jnp.float32) -> dict:
    """Instantiate model definitions from a reference-format YAML config.

    ``model_overrides`` (ours, optional) shrinks every module consistently for
    tests/benchmarks: {block_out_channels, cross_attention_dim, attn_heads,
    text: {...}, vae_channels, pose_channels}.
    """
    ov = config.get("model_overrides", ConfigDict())
    chs = tuple(ov.get("block_out_channels", (320, 640, 1280, 1280)))
    xdim = int(ov.get("cross_attention_dim", 768))
    heads = int(ov.get("attn_heads", 8))

    # attention_processor_kwargs (cam.yaml:121-129): `scale` and
    # `temporal_attn_names` are honored; the structural booleans are
    # validated by config_schema.validate_config (fail-loud, not silent)
    apk = dict(config.get("attention_processor_kwargs") or {})
    unet_kwargs = unet_config_from_yaml(
        config.get("unet_additional_kwargs"),
        lora_rank=int(config.get("lora_rank", 0)),
        lora_scale=float(config.get("lora_scale", 1.0)),
        camera_cond=stage in ("cam", "obj"),
        motion_lora_rank=int(config.get("motion_lora_rank", 0)),
        motion_lora_scale=float(config.get("motion_lora_scale", 1.0)),
        pose_scale=float(apk.get("scale", 1.0)),
        pose_cond_blocks=_attn_block_indices(apk.get("temporal_attn_names", "0")),
    )
    if stage == "lora":
        unet_kwargs["use_motion_module"] = False
    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        dtype=dtype, **unet_kwargs,
    )
    vae = AutoencoderKL(block_out_channels=tuple(ov.get("vae_channels", (128, 256, 512, 512))), dtype=dtype)
    text_kwargs = dict(SD15_TEXT)
    text_kwargs.update(ov.get("text", {}))
    text_kwargs["hidden_size"] = xdim if "text" not in ov else text_kwargs["hidden_size"]
    text = CLIPTextModel(dtype=dtype, **text_kwargs)

    out = {"unet": unet, "vae": vae, "text": text}
    if stage in ("cam", "obj"):
        pk = dict(config.get("pose_encoder_kwargs", {}) or {})
        # pose_encoder_kwargs.channels (cam.yaml:110) is honored at full
        # scale; model_overrides shrinks EVERY module consistently, so an
        # overridden UNet width takes precedence over the YAML's literal dims
        # (same rule as config_schema's pose_feature_dimensions check)
        yaml_pose_chs = chs if "block_out_channels" in ov else pk.get("channels", chs)
        out["pose_encoder"] = CameraPoseEncoder(
            downscale_factor=int(pk.get("downscale_factor", 8)),
            channels=tuple(ov.get("pose_channels", yaml_pose_chs)),
            nums_rb=int(pk.get("nums_rb", 2)),
            ksize=int(pk.get("ksize", 1)),
            temporal_attention_nhead=int(pk.get("temporal_attention_nhead", 8)),
            temporal_pe_max_len=int(pk.get("temporal_position_encoding_max_len", 16)),
            dtype=dtype,
        )
    if stage == "obj":
        ok = dict(config.get_path("omcm_config.params", ConfigDict()) or {})
        out["adapter"] = ObjectAdapter(
            channels=tuple(ov.get("pose_channels", chs)),
            nums_rb=int(ok.get("nums_rb", 2)),
            use_pre_zero_conv=bool(ok.get("use_pre_zero_conv", True)),
            use_post_zero_conv=bool(ok.get("use_post_zero_conv", True)),
            dtype=dtype,
        )
    return out


def init_params(models: dict, config: ConfigDict, stage: str, rng: jax.Array,
                sample_size, num_frames: int) -> dict:
    """Random-init all param trees at the configured shapes.

    Every ``Module.init`` is wrapped in ``jax.jit``: un-jitted init runs
    op-by-op, which at SD1.5 scale means thousands of dispatches — tens of
    minutes behind a high-latency device transport vs seconds as one
    compiled program.
    """
    h, w = sample_size
    hl, wl = h // 8, w // 8
    f = 1 if stage == "lora" else num_frames
    chs = models["unet"].block_out_channels
    xdim = models["unet"].cross_attention_dim
    keys = jax.random.split(rng, 5)
    pose_feats = None
    if stage in ("cam", "obj"):
        pose_feats = [jnp.zeros((1, f, hl // 2**i, wl // 2**i, c)) for i, c in enumerate(chs)]

    def jinit(module, key, *args, **kwargs):
        return jax.jit(lambda k: module.init(k, *args, **kwargs))(key)["params"]

    params = {
        "unet": jinit(
            models["unet"], keys[0], jnp.zeros((1, f, hl, wl, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, xdim)),
            pose_features=pose_feats,
        ),
        "vae": jinit(models["vae"], keys[1], jnp.zeros((1, 64, 64, 3))),
        "text": jinit(models["text"], keys[2], jnp.zeros((1, 77), jnp.int32)),
    }
    if "pose_encoder" in models:
        params["pose_encoder"] = jinit(
            models["pose_encoder"], keys[3], jnp.zeros((1, f, h, w, 6))
        )
    if "adapter" in models:
        params["adapter"] = jinit(
            models["adapter"], keys[4], jnp.zeros((f, h, w, 13)), jnp.zeros((f, h, w, 1))
        )
    return params


def _real_path(p) -> bool:
    """True when a config path points at an actual file (the shipped configs
    carry '[path to ...]' placeholders)."""
    return bool(p) and os.path.exists(str(p))


def _device_mem_str() -> str:
    """' mem X.XXGB' for the periodic log line (torch.cuda.max_memory_allocated
    analog, train_cam_ctrl.py:782); empty when the backend exposes no stats
    (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = (stats or {}).get("peak_bytes_in_use")
        if peak:
            return f" mem {peak / 2**30:.2f}GB"
    except Exception:
        pass
    return ""


from synfmc_tpu.config import is_placeholder_path as _is_placeholder


def load_pretrained(params: dict, config: ConfigDict, stage: str, logger) -> tuple[dict, dict]:
    """Load SD1.5 / AnimateDiff / previous-stage checkpoints when paths are
    real.  Returns ``(params, meta)`` where meta carries side-band values a
    bundle provides beyond weights (today: ``omcm_global_step``).

    A configured-but-missing path is NEVER silent: a typo'd checkpoint path
    would otherwise train from random init while looking healthy.  Missing
    non-placeholder paths log at ERROR, and ``strict_pretrained: true``
    makes them fatal (the right setting for real runs).
    """
    meta: dict = {}
    strict = bool(config.get("strict_pretrained", False))

    def real(p) -> bool:
        if not p:
            return False
        if _real_path(p):
            return True
        if _is_placeholder(p):
            return False
        msg = (
            f"configured checkpoint path does not exist: {str(p)!r} — "
            f"the affected weights stay at random init"
        )
        if strict:
            raise FileNotFoundError(f"strict_pretrained: {msg}")
        logger.error(msg + " (set strict_pretrained: true to make this fatal)")
        return False

    sd_path = config.get("pretrained_model_path")
    if real(sd_path):
        from synfmc_tpu.interop.sd_loader import load_sd15

        params = load_sd15(params, str(sd_path), config.get("unet_subfolder", "unet"))
        logger.info(f"loaded SD1.5 weights from {sd_path}")
    mm_path = config.get("motion_module_ckpt")
    if real(mm_path):
        sd = ckpt.torch_load_state_dict(str(mm_path))
        sd = sd.get("state_dict", sd)
        params["unet"] = ckpt.load_into_params(params["unet"], sd, "unet")
        logger.info(f"loaded AnimateDiff motion modules from {mm_path}")
    lora_path = config.get("lora_ckpt")
    if real(lora_path):
        bundle = ckpt.torch_load_state_dict(str(lora_path))
        params["unet"] = ckpt.load_into_params(params["unet"], bundle["lora_state_dict"], "unet")
        logger.info(f"loaded stage-1 LoRA from {lora_path}")
    cm_path = config.get("pretrained_cm_path")
    if real(cm_path):
        bundle = ckpt.torch_load_state_dict(str(cm_path))
        params["pose_encoder"] = ckpt.load_into_params(
            params["pose_encoder"], bundle["pose_encoder_state_dict"], "pose_encoder"
        )
        params["unet"] = ckpt.load_into_params(
            params["unet"], bundle["attention_processor_state_dict"], "unet"
        )
        if "mm_state_dict" in bundle:
            # reference stage 3 does NOT load mm_state_dict from the CMC
            # bundle (train_cam_obj_ctrl.py:283-292 reads only pose encoder +
            # attention processors) — quirk preserved; note it loudly.
            logger.info(
                "stage-2 bundle carries mm_state_dict (train_mm run); the "
                "reference stage-3 load path ignores it — matching that"
            )
        logger.info(f"loaded stage-2 CMC from {cm_path}")
    if stage == "obj":
        om_path = (config.get("omcm_config") or {}).get("pretrained")
        if real(om_path):
            # warm-start the OMC adapter and resume its step count
            # (train_cam_obj_ctrl.py:296-313, 574-578)
            bundle = ckpt.torch_load_state_dict(str(om_path))
            params["adapter"] = ckpt.load_into_params(
                params["adapter"], bundle["omcm_state_dict"], "adapter"
            )
            meta["omcm_global_step"] = int(bundle.get("global_step", 0))
            logger.info(
                f"loaded pretrained OMC adapter from {om_path} "
                f"(global_step {meta['omcm_global_step']})"
            )
    return params, meta


def validate_pretrained_paths(config: ConfigDict, stage: str) -> None:
    """Fail fast (before any model init) on missing mandatory checkpoints.

    The reference hard-asserts a trained CMC checkpoint before stage 3
    (train_cam_obj_ctrl.py:280).  ``allow_untrained_cm`` is an explicit
    opt-out for fixture smoke runs only.
    """
    cm_path = config.get("pretrained_cm_path")
    if stage == "obj" and not _real_path(cm_path):
        if not bool(config.get("allow_untrained_cm", False)):
            raise FileNotFoundError(
                f"stage 3 requires a trained stage-2 CMC checkpoint; "
                f"pretrained_cm_path={cm_path!r} does not exist "
                f"(set allow_untrained_cm: true to bypass in smoke tests)"
            )


# ---------------------------------------------------------------------------
# the stage driver
# ---------------------------------------------------------------------------


def train(stage: str, config: ConfigDict, max_steps_override: Optional[int] = None) -> dict:
    """Run one training stage; returns summary metrics (for tests/bench)."""
    assert stage in ("lora", "cam", "obj")
    from synfmc_tpu.training.config_schema import validate_config

    # Strict key surface BEFORE any filesystem/model work: the reference's
    # main(**config) raises TypeError on an unknown key (train_cam_ctrl.py:806);
    # a typo'd key must never silently fall back to a default.
    config_notes = validate_config(config, stage)
    name = config.get("name", f"{stage}-run")
    run_dir = os.path.join(
        str(config["output_dir"]), f"{name}-{datetime.datetime.now():%Y-%m-%dT%H-%M}"
    )
    if is_main_process():
        os.makedirs(run_dir, exist_ok=True)
        save_config(config, os.path.join(run_dir, "config.yaml"))
    # every process writes a log file: log.txt on rank 0, log.txt.rank{N}
    # elsewhere (utils/util.py:108-116 parity) — worker-host logs must not vanish
    logger = setup_logger(run_dir, jax.process_index())
    logger.info(f"stage={stage} run_dir={run_dir} devices={jax.device_count()}")
    for note in config_notes:
        logger.info(note)

    # Device-side RNG (init, CFG dropouts, noise, timesteps) must be
    # IDENTICAL across processes: under multi-process SPMD it is a replicated
    # jit input, and per-process values would desync the replicas.  Per-
    # sample randomness still differs per sample (keys split over the global
    # batch inside the step).  Only HOST-side RNG (loader shuffle, caption
    # templates) takes the reference's seed = global_seed + rank offset
    # (train_cam_ctrl.py:200-204).
    global_seed = int(config.get("global_seed", 42))
    seed = global_seed + jax.process_index()  # host-side only
    rng = jax.random.PRNGKey(global_seed)
    rng, init_rng = jax.random.split(rng)

    train_data_cfg = dict(config.get_path("train_data.params", ConfigDict()) or {})
    sample_size = tuple(train_data_cfg.get("sample_size", (256, 384)))
    num_frames = int(train_data_cfg.get("sample_n_frames", 16))

    validate_pretrained_paths(config, stage)  # fail fast, before any init

    # Data first: the epoch-denominated knobs below need len(loader)
    # (reference train_cam_ctrl.py:369-375).  Worker processes spawn lazily
    # on first iteration, so early construction costs nothing.
    tokenizer = load_tokenizer(
        config.get("pretrained_model_path"),
        strict=bool(config.get("strict_pretrained", False)),
    )
    null_ids = tokenizer([""])[0]
    dataset_cls = UnrealTrajLoraDataset if stage == "lora" else UnrealTrajVideoDataset
    dataset = dataset_cls(**train_data_cfg, seed=seed)
    loader = ShardedLoader(
        dataset,
        batch_size=int(config.get("train_batch_size", 1)),
        collate_fn=dataset_cls.collate_fn,
        num_workers=int(config.get("num_workers", 4)),
        # GLOBAL seed: the loader's epoch shuffle must be identical on every
        # host so the stride slices partition the dataset (DistributedSampler
        # semantics, train_cam_ctrl.py:342).  The loader adds its own
        # process_index offset for worker/sample RNG.
        seed=global_seed,
    )
    if len(loader) == 0:
        raise ValueError(
            f"empty data loader: dataset has {len(dataset)} examples on this "
            f"host but train_batch_size={loader.batch_size} with "
            f"drop_last — no full batch can be formed"
        )

    dtype = jnp.bfloat16 if config.get("mixed_precision_training", True) else jnp.float32
    models = build_models(config, stage, dtype=dtype)
    params = init_params(models, config, stage, init_rng, sample_size, num_frames)
    params, pretrained_meta = load_pretrained(params, config, stage, logger)

    schedule = DiffusionSchedule.from_config(**(config.get("noise_scheduler_kwargs") or {}))
    # REAL gradient accumulation (the reference's knob never accumulates —
    # train_cam_obj_ctrl.py:486-487 only scales lr arithmetic): each
    # global_step consumes `accum` loader batches stacked on a leading micro
    # axis and applies ONE optimizer update of their mean gradient — the
    # single-chip big-effective-batch lever (b=2 does not fit HBM, PERF.md).
    # Resolved BEFORE the epoch-denominated knob conversions below: one
    # optimizer step eats `accum` loader batches, so N epochs are
    # ceil(N * len(loader) / accum) optimizer steps — the same arithmetic the
    # resume path inverts with divmod(global_step * accum, len(loader)).
    accum = int(config.get("gradient_accumulation_steps", 1) or 1)
    steps_per_epoch = -(-len(loader) // accum)  # ceil
    max_steps = max_steps_override or int(config.get("max_train_steps", 100))
    if max_steps == -1:
        # epoch-denominated run length (train_cam_ctrl.py:369-371)
        max_train_epoch = int(config.get("max_train_epoch", -1))
        if max_train_epoch == -1:
            raise ValueError(
                "max_train_steps: -1 requires max_train_epoch (reference "
                "train_cam_ctrl.py:370 asserts the same)"
            )
        max_steps = max_train_epoch * steps_per_epoch
        logger.info(
            f"max_train_epoch {max_train_epoch} x {len(loader)} batches/epoch "
            f"/ {accum} accum -> max_train_steps {max_steps}"
        )
    tx = make_optimizer(
        float(config.get("learning_rate", 1e-4)),
        adam_beta1=float(config.get("adam_beta1", 0.9)),
        adam_beta2=float(config.get("adam_beta2", 0.999)),
        adam_epsilon=float(config.get("adam_epsilon", 1e-8)),
        max_grad_norm=float(config.get("max_grad_norm", 1.0)),
        lr_scheduler=str(config.get("lr_scheduler", "constant")),
        lr_warmup_steps=int(config.get("lr_warmup_steps", 0)),
        max_train_steps=max_steps,
        adam_weight_decay=float(config.get("adam_weight_decay", 1e-2)),
    )
    # host-side copy of the lr schedule for the periodic log line
    # (train_cam_ctrl.py:781-788 logs lr + device memory)
    lr_at = make_lr_schedule(
        float(config.get("learning_rate", 1e-4)),
        str(config.get("lr_scheduler", "constant")),
        int(config.get("lr_warmup_steps", 0)),
        max_steps,
    )

    step_cfg = StepConfig(
        cfg_random_null_text_ratio=float(config.get("cfg_random_null_text_ratio", 0.1))
        if config.get("cfg_random_null_text", True) else 0.0,
        apply_masked_loss=bool(config.get("apply_masked_loss", False)),
        invert_loss_mask=(stage == "cam"),
        mask_loss_weight=float(config.get("mask_loss_weight", 1.0)),
        sd_loss_weight=float(config.get("sd_loss_weight", 1.0)),
        appearance_debias=float(config.get("appearance_debias", 0.0)),
        omcm_min_step=int(config.get("omcm_min_step", 700)),
        min_step_prob=float(config.get("min_step_prob", 0.8)),
        sample_height=sample_size[0],
        sample_width=sample_size[1],
        remat=bool(config.get("gradient_checkpointing", False)),
        remat_policy=str(config.get("gradient_checkpointing_policy", "full")),
    )

    # trainable/frozen partition per stage (SURVEY.md §2.1)
    if stage == "lora":
        t_unet, f_unet = partition_params(params["unet"], stage1_lora_trainable)
        trainable = {"unet": t_unet}
        grads_fn = make_lora_grads_fn(models["unet"], models["vae"], models["text"], schedule, step_cfg)
    elif stage == "cam":
        # train_mm additionally trains the temporal transformers' norm/proj
        # layers (train_cam_ctrl.py:286-305 — same module rule as stage 3)
        cam_train_mm = bool(config.get("train_mm", False))
        t_unet, f_unet = partition_params(
            params["unet"],
            lambda p: stage2_cmc_unet_trainable(p) or (cam_train_mm and stage3_mm_trainable(p)),
        )
        trainable = {"unet": t_unet, "pose_encoder": params["pose_encoder"]}
        grads_fn = make_cam_grads_fn(
            models["unet"], models["pose_encoder"], models["vae"], models["text"], schedule, step_cfg
        )
    else:
        train_cm = bool(config.get("train_cm", False))
        train_mm = bool(config.get("train_mm", False))
        train_lora = bool(config.get("train_image_lora", False))
        t_unet, f_unet = partition_params(
            params["unet"],
            lambda p: stage3_unet_trainable(p, train_cm=train_cm, train_mm=train_mm, train_image_lora=train_lora),
        )
        trainable = {"adapter": params["adapter"], "unet": t_unet}
        if train_cm:
            trainable["pose_encoder"] = params["pose_encoder"]
        grads_fn = make_obj_grads_fn(
            models["unet"], models["pose_encoder"], models["adapter"],
            models["vae"], models["text"], schedule, step_cfg,
        )
    step_fn = (make_accumulating_step(grads_fn, tx, accum) if accum > 1
               else step_from_grads(grads_fn, tx))

    frozen = {"unet": f_unet, "vae": {"params": params["vae"]}, "text": {"params": params["text"]}}
    if stage == "obj" and "pose_encoder" not in trainable:
        frozen["pose_encoder"] = params["pose_encoder"]
    logger.info(
        f"trainable params: {count_params(trainable) / 1e6:.2f}M; "
        f"frozen: {count_params(frozen) / 1e6:.2f}M"
    )

    state = init_train_state(trainable, tx)
    # mesh knobs: `mesh: {data: N, fsdp: M}` in the YAML. fsdp > 1 shards
    # trainable params + optimizer state ZeRO-1-style over that axis (frozen
    # weights stay replicated — they have no optimizer state and are read-only)
    mesh_cfg = dict(config.get("mesh") or {})
    num_fsdp = int(mesh_cfg.get("fsdp", 1))
    num_sp = int(mesh_cfg.get("sp", 1))  # frame-axis activation sharding
    mesh = create_mesh(num_data=mesh_cfg.get("data"), num_fsdp=num_fsdp,
                       num_sp=num_sp)
    logger.info(f"mesh: {dict(mesh.shape)}")
    state = shard_over_fsdp(state, mesh)
    frozen = replicate(frozen, mesh)
    # pin output shardings so ZeRO sharding persists across steps instead of
    # silently re-replicating (metrics are scalars -> replicated)
    jit_step = jax.jit(
        step_fn, donate_argnums=(0,),
        out_shardings=(state_shardings(state), NamedSharding(mesh, P())),
    )

    def host_batch(raw: dict) -> dict:
        batch = {
            "pixel_values": raw["pixel_values"],
            "input_ids": tokenizer(raw["captions"]),
            "null_ids": null_ids,
        }
        if stage != "lora":
            batch["background_ids"] = tokenizer(raw["background_captions"])
            batch["camera_rt"] = raw["camera_rt"]
            batch["intrinsics"] = raw["intrinsics"]
            batch["obj_union_mask"] = raw["obj_union_mask"]
            if "flip_flag" in raw:
                batch["flip_flag"] = raw["flip_flag"]
        if stage == "obj":
            batch["obj_info"] = raw["obj_info"]
            batch["obj_masks"] = raw["obj_masks"]
        return batch

    def to_device_batch(raw: dict) -> dict:
        return shard_batch(host_batch(raw), mesh)

    def to_device_stacked(raws: list) -> dict:
        """accum raw batches -> one device batch stacked on a leading micro
        axis (k, B, ...), data-sharded on the SECOND axis."""
        hbs = [host_batch(r) for r in raws]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *hbs)
        return shard_batch(stacked, mesh, stacked=True)

    ckpt_steps = int(config.get("checkpointing_steps", -1))
    if ckpt_steps == -1:
        # epoch-denominated checkpoint cadence (train_cam_ctrl.py:373-375).
        # Both keys -1/absent = end-of-training checkpoint only (the final
        # save below is unconditional, so nothing is ever lost).
        ckpt_epochs = int(config.get("checkpointing_epochs", -1))
        if ckpt_epochs != -1:
            # optimizer-step cadence: one step consumes `accum` batches
            ckpt_steps = ckpt_epochs * steps_per_epoch
            logger.info(
                f"checkpointing_epochs {ckpt_epochs} x {len(loader)} "
                f"batches/epoch / {accum} accum -> checkpointing_steps {ckpt_steps}"
            )
    logger_interval = int(config.get("logger_interval", 10))
    global_step = 0
    if stage == "obj" and pretrained_meta.get("omcm_global_step") is not None:
        # warm-started OMC resumes its step count from the omcm bundle
        # (train_cam_obj_ctrl.py:574-578; the reference quirk of NOT restoring
        # optimizer state there is preserved — only weights + step carry over)
        global_step = int(pretrained_meta["omcm_global_step"])
        state = state.replace(step=jnp.asarray(global_step, jnp.int32))
        logger.info(f"omcm_config.pretrained: resuming step count at {global_step}")
    resume_from = config.get("resume_from")
    if resume_from == "auto":
        # crash-restart convenience: resume the newest checkpoint any prior
        # attempt of this job (same `name`) wrote under output_dir
        resume_from = ckpt.find_auto_resume(str(config["output_dir"]), name)
        if resume_from is None:
            logger.info("resume_from: auto — no prior checkpoint, starting fresh")
    if resume_from:
        # restore_native works from an abstract template — the live state is
        # never fetched to host (gigabytes at full scale)
        state = ckpt.restore_native(str(resume_from), state)
        state = shard_over_fsdp(state, mesh)
        global_step = int(state.step)
        logger.info(f"resumed from {resume_from} at step {global_step}")

    validation_steps = int(config.get("validation_steps", -1))
    validation_steps_tuple = tuple(config.get("validation_steps_tuple", ()) or ())
    do_sanity = bool(config.get("do_sanity_check", False))
    profile_steps = int(config.get("profile_steps", 0))  # jax.profiler trace
    metrics_out: dict = {}
    # per-step loss record for exact-resume equality tests (forces a host
    # sync every step — test/debug only)
    loss_history: Optional[list] = [] if config.get("record_loss_history") else None
    t_train_start = time.time()
    epoch = 0
    last_saved_step = -1
    start_batch = 0
    if global_step:
        # Exact data-order continuation after a crash-restart: restore the
        # epoch counter AND skip the already-consumed batches of the partial
        # epoch, so the post-resume sample sequence equals an uninterrupted
        # run's.  (The reference restores only epoch/first_epoch and replays
        # the epoch from its start, train_cam_ctrl.py:467-495.)
        # each global step consumes `accum` loader batches
        epoch, start_batch = divmod(global_step * accum, len(loader))
        logger.info(
            f"resume data order: epoch {epoch}, skipping {start_batch} "
            f"already-consumed batches"
        )

    def _batch_source():
        """(epoch, raw, device batch) stream — one item per OPTIMIZER step.

        Runs on the prefetch thread: loader wait + tokenize + device
        transfer for batch N+1 overlap the device executing step N — the
        host path (0.3–1.4 s measured) no longer serializes with the
        0.26 s device step.  ``loader.epochs`` keeps jobs flowing across
        epoch boundaries (no per-epoch drain stall).  Prefetch changes WHEN
        a batch is staged, never WHICH batch: content is a pure function of
        (seed, epoch, idx), so prefetched == serial bit-for-bit.

        With gradient accumulation, `accum` consecutive loader batches stack
        into one (k, B, ...) device batch; the step's epoch/raw are the
        FIRST micro's (what resume arithmetic and the sanity dump expect).
        """
        it = loader.epochs(start_epoch=epoch, start_batch=start_batch)
        if accum == 1:
            for ep, raw in it:
                yield ep, raw, to_device_batch(raw)
        else:
            while True:
                group = [next(it) for _ in range(accum)]  # infinite stream
                yield group[0][0], group[0][1], to_device_stacked([r for _, r in group])

    prefetch_depth = int(config.get("prefetch_batches", 1))
    async_ckpt = bool(config.get("async_checkpointing", True))
    source = _batch_source()
    prefetcher = None
    if prefetch_depth > 0:
        source = prefetcher = ThreadPrefetcher(source, depth=prefetch_depth)
    ckpt_writer = AsyncCheckpointWriter()

    # Preemption-safe training (the reference has NO failure handling —
    # SURVEY.md §5: a crash kills the torchrun job): SIGTERM/SIGINT request a
    # clean stop; the loop finishes the in-flight step, falls through to the
    # end-of-training save, and exits 0 — so `resume_from: auto` continues a
    # preempted run from its exact stopping step.  Handlers install only in
    # the main thread (train() may be called from test threads) and the
    # previous handlers are restored on exit.
    stop_requested = threading.Event()
    _old_handlers = {}
    if bool(config.get("checkpoint_on_preemption", True)):
        def _on_signal(signum, frame):
            stop_requested.set()
            logger.warning(
                f"received signal {signum}: will checkpoint at the end of "
                f"the current step and exit cleanly"
            )
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                _old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread
                break

    # Under multi-host SPMD a preemption signal can land on one rank only
    # (or on different step boundaries per rank); the stop decision is a
    # collective OR (sync_stop_flag) issued every step at the same loop
    # point on every process, so all ranks break on the SAME step and the
    # save-path collectives stay aligned with the other ranks' programs.
    # Gated on the CONFIG flag (identical across ranks), not on whether the
    # handler install succeeded locally (which can differ per rank — e.g.
    # train() called off the main thread — and would desync the collective).
    preempt_sync = (
        bool(config.get("checkpoint_on_preemption", True))
        and jax.process_count() > 1
    )

    def _stop_all_ranks() -> bool:
        local = stop_requested.is_set()
        if preempt_sync:
            from synfmc_tpu.parallel import sync_stop_flag

            return sync_stop_flag(local)
        return local

    data_t0 = time.time()
    try:
        while global_step < max_steps:
            epoch, raw, batch = next(source)
            data_time = time.time() - data_t0

            if global_step == 0 and do_sanity and is_main_process():
                _sanity_check_dump(stage, run_dir, raw)
            if profile_steps and global_step == 2 and is_main_process():
                jax.profiler.start_trace(os.path.join(run_dir, "trace"))

            # step RNG is a pure function of the step index (not a
            # sequentially threaded split): a resumed run's step k draws the
            # same key an uninterrupted run's step k drew — exact-resume
            # invariant
            step_rng = jax.random.fold_in(rng, global_step)
            state, metrics = jit_step(state, frozen, batch, step_rng)
            global_step += 1
            if loss_history is not None:
                loss_history.append(float(metrics["loss"]))

            if profile_steps and global_step == 2 + profile_steps and is_main_process():
                jax.tree_util.tree_leaves(metrics)[0].block_until_ready()
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {run_dir}/trace")

            if is_main_process() and (
                (validation_steps > 0 and global_step % validation_steps == 0)
                or global_step in validation_steps_tuple
            ) and bool(config.get("enable_validation", False)):
                try:
                    run_validation(
                        stage, run_dir, global_step, models, state, frozen,
                        config, tokenizer, schedule,
                        dataset=None if stage == "lora" else dataset,
                    )
                except Exception as e:  # validation must never kill training
                    logger.warning(f"validation at step {global_step} failed: {e}")

            if global_step % logger_interval == 0 or global_step == max_steps:
                loss = float(metrics["loss"])
                iter_time = time.time() - data_t0
                eta = (max_steps - global_step) * iter_time
                logger.info(
                    f"step {global_step}/{max_steps} loss {loss:.4f} "
                    f"lr {float(lr_at(global_step - 1)):.2e} "
                    f"data {data_time:.3f}s iter {iter_time:.3f}s "
                    f"eta {format_time(eta)}{_device_mem_str()}"
                )
                metrics_out = {k: float(v) for k, v in metrics.items()}
            if ckpt_steps > 0 and global_step % ckpt_steps == 0:
                # device-side snapshot (async dispatch, ordered before the
                # next step's donation) -> writer thread does the device
                # fetch + Orbax + torch-bundle serialization off the hot
                # loop.  When HBM can't hold a second train state (full-scale
                # b=1 runs near the limit), fall back to a blocking host
                # fetch — serialization + disk still leave the hot loop.
                # `ckpt_device_snapshot: always|never` overrides the check.
                snap_mode = str(config.get("ckpt_device_snapshot", "auto"))
                if not async_ckpt:
                    to_save = state
                elif snap_mode == "always" or (
                    snap_mode != "never" and snapshot_fits_on_device(state)
                ):
                    to_save = snapshot_on_device(state)
                else:
                    to_save = fetch_to_host(state)
                if jax.process_count() > 1 and not tree_locally_coverable(to_save):
                    # ZeRO layout spans processes: gather COLLECTIVELY here,
                    # synchronously on every process, so per-process device
                    # program streams stay aligned (a collective issued from
                    # the writer thread could interleave differently per
                    # process and deadlock)
                    to_save = fetch_to_host(to_save)
                if is_main_process():
                    if async_ckpt:
                        ckpt_writer.submit(
                            lambda s=to_save, g=global_step, e=epoch: _save_checkpoints(
                                stage, run_dir, g, e, s, config
                            )
                        )
                    else:
                        _save_checkpoints(stage, run_dir, global_step, epoch, to_save, config)
                last_saved_step = global_step
            data_t0 = time.time()
            if _stop_all_ranks():
                logger.info(
                    f"stopping on preemption signal at step {global_step}; "
                    f"final checkpoint follows"
                )
                metrics_out["preempted"] = True
                break
    finally:
        ckpt_writer.wait()  # surface write failures; order the final save
        if prefetcher is not None:
            prefetcher.close()
        loader.close()
        for sig, handler in _old_handlers.items():
            signal.signal(sig, handler)

    if global_step != last_saved_step:
        to_save = state
        if jax.process_count() > 1 and not tree_locally_coverable(state):
            to_save = fetch_to_host(state)  # collective: all processes
        if is_main_process():
            _save_checkpoints(stage, run_dir, global_step, epoch, to_save, config)
    metrics_out.update(
        steps=global_step,
        wall_s=time.time() - t_train_start,
        run_dir=run_dir,
    )
    if loss_history is not None:
        metrics_out["loss_history"] = loss_history
    return metrics_out


def build_validation_pipeline(models, state, frozen, tokenizer, schedule):
    """Assemble the inference pipeline from the live train-step trees.

    Every module's params come from ``state.trainable`` merged over
    ``frozen`` — never from startup snapshots — so any subtree made
    trainable later is automatically reflected here.
    """
    from synfmc_tpu.pipelines import AnimationPipeline
    from synfmc_tpu.training.params import merge_params as _merge

    trainable = state.trainable
    unet_params = {"params": _merge(frozen["unet"], trainable.get("unet", {}))}
    pose_params = trainable.get("pose_encoder", frozen.get("pose_encoder"))
    return AnimationPipeline(
        unet=models["unet"], unet_params=unet_params,
        vae=models["vae"], vae_params=frozen["vae"],
        text_encoder=models["text"], text_params=frozen["text"],
        tokenizer=tokenizer, schedule=schedule,
        pose_encoder=models.get("pose_encoder"),
        pose_encoder_params={"params": pose_params} if "pose_encoder" in models else None,
        adapter=models.get("adapter"),
        adapter_params={"params": trainable.get("adapter")} if "adapter" in models else None,
    )


def run_validation(stage, run_dir, global_step, models, state, frozen, config,
                   tokenizer, schedule, dataset=None):
    """Render validation samples (reference validation passes,
    train_cam_ctrl.py:686-779, train_cam_obj_ctrl.py:619-780).

    Two modes:
    - dataset-driven (stages cam/obj, when ``dataset`` is given): draw real
      clips via ``create_validation_sample`` and write the full reference
      ``samples/{step}/`` layout — real-{i}.gif, cm-{i}.gif (+ omcm-{i}.gif
      and {i}_masks/ / {i}_real_masks/ PNGs for stage 3), label_{i}.txt,
      cam_label_compute_{i}.txt + cam_label_gt_{i}.txt for RotErr/TransErr.
    - prompt-driven fallback: text prompts from validation_data rendered
      along a neutral trajectory.

    All parameters derive from the live ``state`` + ``frozen`` trees (the
    exact trees the train step consumes), so validation reflects whatever is
    currently trainable — e.g. motion-module params under stage-3
    ``train_mm`` — with no startup-time snapshots involved.
    """
    import numpy as np

    from synfmc_tpu.utils.video import save_camera_info_txt, save_image_grid, save_videos_grid

    val = config.get("validation_data") or {}
    out_dir = os.path.join(run_dir, "samples", str(global_step))
    pipe = build_validation_pipeline(models, state, frozen, tokenizer, schedule)
    train_params = config.get_path("train_data.params", ConfigDict()) or {}
    h, w = tuple(train_params.get("sample_size", (256, 384)))
    steps = int(val.get("num_inference_steps", 25))
    guidance = float(val.get("guidance_scale", 8.0))
    num = int(val.get("num", 2))
    rng = jax.random.PRNGKey(int(config.get("global_seed", 42)))

    if stage != "lora" and dataset is not None and bool(val.get("use_dataset", True)):
        samples = dataset.create_validation_samples(num)
        os.makedirs(out_dir, exist_ok=True)
        _render_dataset_validation(
            stage, out_dir, pipe, samples, config, h, w, steps, guidance, rng
        )
        return

    prompts = list(val.get("prompts", []))[:num]
    if not prompts:
        return
    os.makedirs(out_dir, exist_ok=True)

    if stage == "lora":
        imgs = pipe(prompts, video_length=1, height=h, width=w,
                    num_inference_steps=steps, guidance_scale=guidance, rng=rng)
        save_image_grid(np.asarray(imgs[:, 0]), os.path.join(out_dir, "validation.png"))
        return

    f = int(train_params.get("sample_n_frames", 16))
    plucker = None
    if "pose_encoder" in models:
        # neutral straight-ahead trajectory for validation rendering
        intr = jnp.broadcast_to(jnp.asarray([w, h, 0, 0], jnp.float32), (len(prompts), f, 4))
        c2w = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (len(prompts), f, 4, 4))
        from synfmc_tpu.geometry.plucker import plucker_embedding

        plucker = plucker_embedding(intr, c2w, h, w)
        for i in range(len(prompts)):
            save_camera_info_txt(
                os.path.join(out_dir, f"{i}-camera.txt"),
                np.asarray(intr[i]),
                np.broadcast_to(np.eye(3, 4, dtype=np.float32), (f, 3, 4)),
            )
    videos = pipe(prompts, video_length=f, height=h, width=w,
                  num_inference_steps=steps, guidance_scale=guidance, rng=rng, plucker=plucker)
    save_videos_grid(np.asarray(videos), os.path.join(out_dir, "validation.gif"))


def _render_dataset_validation(stage, out_dir, pipe, samples, config, h, w,
                               steps, guidance, rng):
    """Reference-layout validation artifacts from real dataset clips
    (train_cam_ctrl.py:722-784; train_cam_obj_ctrl.py:662-780)."""
    import numpy as np
    from PIL import Image

    from synfmc_tpu.geometry.plucker import plucker_embedding
    from synfmc_tpu.geometry.relative import absolute_from_relative_cams
    from synfmc_tpu.training.steps import rt_to_c2w
    from synfmc_tpu.utils.traj_features import rasterize_traj_features
    from synfmc_tpu.utils.video import save_camera_label_txt, save_videos_grid

    train_params = config.get_path("train_data.params", ConfigDict()) or {}
    use_sphere = bool(train_params.get("use_sphere_mask", False))
    cam_scale = float(train_params.get("cam_translation_rescale_factor", 1.0))

    for i, s in enumerate(samples):
        num_frames = s["pixel_values"].shape[0]
        # real clip (train_cam_ctrl.py:740-751)
        save_videos_grid(
            (s["pixel_values"] * 0.5 + 0.5)[None], os.path.join(out_dir, f"real-{i}.gif")
        )

        # CMC render conditioned on the clip's true camera trajectory
        rt = jnp.asarray(s["camera_rt"], jnp.float32)[None]
        intr = jnp.asarray(s["intrinsics"], jnp.float32)[None]
        plucker = plucker_embedding(intr, rt_to_c2w(rt), h, w)
        video = pipe([s["prompt"]], video_length=num_frames, height=h, width=w,
                     num_inference_steps=steps, guidance_scale=guidance,
                     rng=rng, plucker=plucker)
        save_videos_grid(np.asarray(video), os.path.join(out_dir, f"cm-{i}.gif"))

        if stage == "obj" and pipe.adapter is not None:
            # cm-only vs omcm pair + per-frame mask PNGs
            # (train_cam_obj_ctrl.py:693-780)
            masks = s["circle_masks"] if use_sphere else s["obj_masks"]
            obj_info = jnp.asarray(s["obj_info"], jnp.float32)[None]
            m = jnp.asarray(masks, jnp.float32)[None]
            traj_r, mask_r = rasterize_traj_features(obj_info, m)
            feats = jnp.concatenate([traj_r, mask_r], axis=-1) * mask_r
            b, f = feats.shape[:2]
            traj_feats = pipe.encode_traj(
                feats.reshape(b * f, *feats.shape[2:]),
                mask_r.reshape(b * f, *mask_r.shape[2:]), f,
            )
            video = pipe([s["prompt"]], video_length=num_frames, height=h, width=w,
                         num_inference_steps=steps, guidance_scale=guidance,
                         rng=rng, plucker=plucker, traj_features=traj_feats,
                         omcm_min_step=int(config.get("omcm_min_step", 700)))
            save_videos_grid(np.asarray(video), os.path.join(out_dir, f"omcm-{i}.gif"))

            def dump_masks(mask_set, dirname):
                union = np.max(np.asarray(mask_set), axis=1)  # (F,H,W)
                mask_dir = os.path.join(out_dir, dirname)
                os.makedirs(mask_dir, exist_ok=True)
                for t_idx, mk in enumerate(union):
                    Image.fromarray((np.clip(mk, 0, 1) * 255).astype(np.uint8)).save(
                        os.path.join(mask_dir, f"{t_idx}.png")
                    )

            dump_masks(masks, f"{i}_masks")
            if use_sphere:
                dump_masks(s["obj_masks"], f"{i}_real_masks")

        # prompt + source frame paths (train_cam_ctrl.py:44-47)
        with open(os.path.join(out_dir, f"label_{i}.txt"), "w") as fo:
            fo.write(s["prompt"] + "\n")
            for p in s["img_paths"]:
                fo.write(str(p) + "\n")

        # computed + GT absolute camera labels (train_cam_ctrl.py:50-74)
        abs_computed = absolute_from_relative_cams(
            s["camera_info"][0], np.asarray(s["camera_rt"]).reshape(-1, 3, 4), cam_scale
        )
        save_camera_label_txt(
            os.path.join(out_dir, f"cam_label_compute_{i}.txt"), "labels", abs_computed
        )
        save_camera_label_txt(
            os.path.join(out_dir, f"cam_label_gt_{i}.txt"), "gt labels",
            np.asarray(s["camera_info"])[:, :3, :],
        )


def _sanity_check_dump(stage, run_dir, raw_batch):
    """First-batch sanity dump (reference do_sanity_check,
    train_cam_ctrl.py:531-538)."""
    import numpy as np

    from synfmc_tpu.utils.video import save_image_grid, save_videos_grid

    out = os.path.join(run_dir, "sanity_check")
    pixels = np.asarray(raw_batch["pixel_values"]) * 0.5 + 0.5
    if stage == "lora":
        save_image_grid(pixels, os.path.join(out, "batch.png"))
    else:
        save_videos_grid(pixels, os.path.join(out, "batch.gif"))


def _export_optimizer_state(stage, state, config) -> Optional[dict]:
    """optax Adam moments → a torch.optim.AdamW ``state_dict()`` in the
    reference's trainable_params positional order, so the reference's own
    resume path can consume bundles written here (train_image_lora.py:282-296,
    train_cam_ctrl.py:467-495)."""
    from synfmc_tpu.interop.torch_port import export_adamw_state_dict

    moments = ckpt.adam_moments(state.opt_state)
    if moments is None:
        return None
    from synfmc_tpu.parallel.mesh import fetch_to_host

    count, mu, nu = fetch_to_host(moments)
    segments: list[tuple[dict, dict, str]] = []

    def add(m, n, kind):
        if m and jax.tree_util.tree_leaves(m):
            segments.append((m, n, kind))

    if stage == "lora":
        add(mu.get("unet"), nu.get("unet"), "unet")
    elif stage == "cam":
        # encoder params, merge params, then (train_mm) mm norm/proj params —
        # the reference's trainable_params order (train_cam_ctrl.py:276-305)
        add(mu.get("pose_encoder"), nu.get("pose_encoder"), "pose_encoder")
        u_mu, u_nu = mu.get("unet") or {}, nu.get("unet") or {}
        merge_mu, mm_mu = partition_params(u_mu, stage2_cmc_unet_trainable)
        merge_nu, mm_nu = partition_params(u_nu, stage2_cmc_unet_trainable)
        add(merge_mu, merge_nu, "unet")
        add(mm_mu, mm_nu, "unet")
    else:
        # [cm encoder + merge] + [mm] + omcm + [image lora]
        # (train_cam_obj_ctrl.py:335-406)
        add(mu.get("pose_encoder"), nu.get("pose_encoder"), "pose_encoder")
        u_mu, u_nu = mu.get("unet") or {}, nu.get("unet") or {}
        merge_mu, rest_mu = partition_params(u_mu, stage2_cmc_unet_trainable)
        merge_nu, rest_nu = partition_params(u_nu, stage2_cmc_unet_trainable)
        lora_mu, mm_mu = partition_params(rest_mu, lambda p: "lora" in p)
        lora_nu, mm_nu = partition_params(rest_nu, lambda p: "lora" in p)
        add(merge_mu, merge_nu, "unet")
        add(mm_mu, mm_nu, "unet")
        add(mu.get("adapter"), nu.get("adapter"), "adapter")
        add(lora_mu, lora_nu, "unet")
    return export_adamw_state_dict(
        segments,
        int(count),
        lr=float(config.get("learning_rate", 1e-4)),
        betas=(float(config.get("adam_beta1", 0.9)), float(config.get("adam_beta2", 0.999))),
        eps=float(config.get("adam_epsilon", 1e-8)),
        weight_decay=float(config.get("adam_weight_decay", 1e-2)),
    )


def _save_checkpoints(stage, run_dir, global_step, epoch, state, config):
    from synfmc_tpu.parallel.mesh import fetch_to_host

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    ckpt.save_native(ckpt_dir, global_step, state)
    trainable = fetch_to_host(state.trainable)
    opt_sd = _export_optimizer_state(stage, state, config)
    if stage == "lora":
        ckpt.save_stage1_bundle(
            os.path.join(ckpt_dir, f"lora-step-{global_step}.ckpt"),
            trainable["unet"], epoch, global_step, optimizer_state_dict=opt_sd,
        )
    elif stage == "cam":
        # under train_mm the unet trainables mix merge + mm params; the
        # reference bundle keeps them in SEPARATE keys
        # (attention_processor_state_dict vs mm_state_dict,
        # train_cam_ctrl.py:669-684)
        merge_p, mm_p = partition_params(trainable["unet"], stage2_cmc_unet_trainable)
        ckpt.save_stage2_bundle(
            os.path.join(ckpt_dir, f"cmcm-step-{global_step}.ckpt"),
            trainable["pose_encoder"], merge_p, epoch, global_step,
            mm_params=mm_p or None,
            optimizer_state_dict=opt_sd,
        )
    else:
        # the reference's stage-3 cmcm bundle holds ONLY the merge params
        # ('merge' in k and 'lora' not in k, train_cam_obj_ctrl.py:360-361,
        # 955-957); img-lora params get their own img-lora-step-N.ckpt
        # (train_cam_obj_ctrl.py:972-980); mm norm/proj params are trained
        # but never persisted to any reference bundle (quirk) — ours ride the
        # omcm bundle's extra mm_state_dict key (and the native Orbax
        # checkpoint) so nothing is lost, while reference-side strict key
        # checks on attention_processor_state_dict still pass.
        u = trainable.get("unet", {})
        merge_p, rest_p = partition_params(u, stage2_cmc_unet_trainable)
        lora_p, mm_p = partition_params(rest_p, lambda p: "lora" in p)
        ckpt.save_stage3_bundles(
            ckpt_dir, global_step, trainable["adapter"],
            pose_encoder_params=trainable.get("pose_encoder"),
            merge_params=merge_p,
            mm_params=mm_p or None,
            lora_params=lora_p or None,
            epoch=epoch, optimizer_state_dict=opt_sd,
        )

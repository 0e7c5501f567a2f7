"""jit-compiled train steps for the three stages.

TPU-native redesign of the reference training loops (SURVEY.md §3): the whole
step — caption/camera CFG dropout selection, frozen VAE encode, noise/timestep
sampling, CLIP encode, Plücker embedding, model forward/backward, clip+AdamW —
is ONE jitted function with explicit RNG key-splitting replacing the
reference's global torch/python RNG (train_cam_ctrl.py:509-665).

The batch is sharded on the leading axis over the mesh 'data' axis; XLA
inserts the gradient all-reduce the reference got from DDP/NCCL.

RNG stream layout (documented for reproducibility, SURVEY.md §7):
  0: background-caption swap   1: text null dropout    2: camera null dropout
  3: VAE sampling              4: noise                5: timesteps
  6: OMC feature dropout       7: appearance-debias anchor
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from synfmc_tpu.diffusion import DiffusionSchedule
from synfmc_tpu.geometry.plucker import plucker_embedding
from synfmc_tpu.training.losses import appearance_debias_loss, masked_diffusion_loss, mse
from synfmc_tpu.training.params import merge_params
from synfmc_tpu.utils.traj_features import build_adapter_inputs


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any
    opt_state: Any


def init_train_state(trainable: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable, opt_state=tx.init(trainable))


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static per-stage hyperparameters (from the YAML configs)."""

    cfg_random_null_text_ratio: float = 0.1
    background_caption_prob: float = 0.4  # train_cam_ctrl.py:515-524
    apply_masked_loss: bool = False
    invert_loss_mask: bool = True  # stage 2 True, stage 3 False
    mask_loss_weight: float = 1.0
    sd_loss_weight: float = 0.6
    appearance_debias: float = 0.0
    # stage 3
    cfg_random_null_om_ratio: float = 0.1
    omcm_min_step: int = 700
    min_step_prob: float = 0.8
    sample_height: int = 256
    sample_width: int = 384
    # rematerialize the UNet forward in backward (jax.checkpoint) — the
    # working version of the reference's NotImplementedError gradient
    # checkpointing branches (unet_blocks.py:379,508,663,789)
    remat: bool = False
    # remat policy: "full" recomputes everything (min memory, ~+20% executed
    # FLOPs); "dots" saves matmul outputs and recomputes the rest
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable — middle
    # ground: attention/dense saved, convs/norms recomputed)
    remat_policy: str = "full"


def rt_to_c2w(rt: jax.Array) -> jax.Array:
    """(B, F, 12) relative camera rows -> homogeneous (B, F, 4, 4)
    (train_cam_ctrl.py:77-90)."""
    b, f = rt.shape[:2]
    m = rt.reshape(b, f, 3, 4)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], m.dtype), (b, f, 1, 4))
    return jnp.concatenate([m, bottom], axis=2)


def _encode_latents(vae, vae_params, pixels: jax.Array, rng: jax.Array) -> jax.Array:
    """(B, F, H, W, 3) in [-1,1] -> (B, F, H/8, W/8, 4) scaled latents."""
    b, f = pixels.shape[:2]
    flat = pixels.reshape(b * f, *pixels.shape[2:])
    z = vae.apply(vae_params, flat, rng, method=type(vae).encode)
    return z.reshape(b, f, *z.shape[1:])


def _select_text(rngs, batch, cfg: StepConfig):
    """Background-caption swap (whole batch) then per-sample null dropout."""
    ids = batch["input_ids"]
    if "background_ids" in batch:
        use_back = jax.random.uniform(rngs[0]) < cfg.background_caption_prob
        ids = jnp.where(use_back, batch["background_ids"], ids)
    null_ids = batch["null_ids"]  # (77,)
    if cfg.cfg_random_null_text_ratio > 0:
        drop = jax.random.uniform(rngs[1], (ids.shape[0],)) < cfg.cfg_random_null_text_ratio
        ids = jnp.where(drop[:, None], null_ids[None, :], ids)
    return ids


def _maybe_remat(apply_fn, cfg: StepConfig):
    if not cfg.remat:
        return apply_fn
    if cfg.remat_policy == "dots":
        return jax.checkpoint(
            apply_fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    assert cfg.remat_policy == "full", f"unknown remat_policy {cfg.remat_policy!r}"
    return jax.checkpoint(apply_fn)


def _apply_grads(state: TrainState, grads, metrics, tx) -> tuple[TrainState, dict]:
    """Shared optimizer tail: clip+AdamW update, step bump."""
    updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    new_state = TrainState(step=state.step + 1, trainable=trainable, opt_state=opt_state)
    return new_state, metrics


def step_from_grads(grads_fn: Callable, tx: optax.GradientTransformation) -> Callable:
    """grads_fn -> step_fn (grads + optimizer apply)."""

    def step_fn(state: TrainState, frozen: dict, batch: dict, rng: jax.Array):
        grads, metrics = grads_fn(state.trainable, frozen, batch, rng)
        return _apply_grads(state, grads, metrics, tx)

    return step_fn


def make_accumulating_step(
    grads_fn: Callable, tx: optax.GradientTransformation, accum_steps: int
) -> Callable:
    """REAL gradient accumulation over ``accum_steps`` micro-batches.

    The reference declares ``gradient_accumulation_steps`` but never
    accumulates — the knob only scales its lr-scheduler arithmetic
    (train_cam_obj_ctrl.py:486-487; no ``% gradient_accumulation_steps``
    exists around any backward).  Here it is implemented for real, TPU-style:
    the batch arrives STACKED on a leading micro axis (k, B, ...), a
    ``fori_loop`` accumulates mean gradients micro-by-micro (activations live
    only per-micro — the memory of a B-batch step, the statistics of a
    k*B-batch step), and one optimizer update applies per call.  Each micro
    draws its own RNG via ``fold_in(rng, i)`` so noise/timesteps stay
    per-sample-independent exactly as k separate steps would.

    Equivalent large-batch semantics: every per-micro loss is a mean over its
    samples, so the mean of micro-gradients equals the gradient of the mean
    loss over all k*B samples.
    """
    assert accum_steps >= 2, "use the plain step for accum_steps == 1"

    def step_fn(state: TrainState, frozen: dict, batch: dict, rng: jax.Array):
        def micro(i):
            mb = jax.tree_util.tree_map(lambda x: x[i], batch)
            return grads_fn(state.trainable, frozen, mb, jax.random.fold_in(rng, i))

        def body(i, carry):
            acc, macc = carry
            g, m = micro(i)
            return (
                jax.tree_util.tree_map(jnp.add, acc, g),
                jax.tree_util.tree_map(jnp.add, macc, m),
            )

        grads, metrics = jax.lax.fori_loop(1, accum_steps, body, micro(0))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
        metrics = jax.tree_util.tree_map(lambda x: x * inv, metrics)
        return _apply_grads(state, grads, metrics, tx)

    return step_fn


def make_lora_grads_fn(unet, vae, text_encoder, schedule: DiffusionSchedule,
                       cfg: StepConfig = StepConfig()) -> Callable:
    """Stage 1: Domain-LoRA image fine-tune (train_image_lora.py:307-381).

    batch: pixel_values (B, H, W, 3), input_ids (B, 77), null_ids (77,).
    Returns (grads, metrics) for one micro-batch.
    """
    unet_apply = _maybe_remat(unet.apply, cfg)

    def grads_fn(trainable_tree, frozen: dict, batch: dict, rng: jax.Array):
        rngs = jax.random.split(rng, 8)
        ids = _select_text(rngs, batch, cfg)
        pixels = batch["pixel_values"][:, None]  # F=1
        latents = _encode_latents(vae, frozen["vae"], pixels, rngs[3])
        noise = jax.random.normal(rngs[4], latents.shape, latents.dtype)
        t = schedule.sample_timesteps(rngs[5], latents.shape[0])
        noisy = schedule.add_noise(latents, noise, t)
        context = text_encoder.apply(frozen["text"], ids)

        def loss_fn(trainable):
            unet_params = {"params": merge_params(trainable["unet"], frozen["unet"])}
            pred = unet_apply(unet_params, noisy, t, context)
            return mse(pred, noise)

        loss, grads = jax.value_and_grad(loss_fn)(trainable_tree)
        return grads, {"loss": loss}

    return grads_fn


def make_lora_train_step(
    unet, vae, text_encoder, schedule: DiffusionSchedule, tx: optax.GradientTransformation,
    cfg: StepConfig = StepConfig(),
) -> Callable:
    return step_from_grads(make_lora_grads_fn(unet, vae, text_encoder, schedule, cfg), tx)


def make_cam_grads_fn(
    unet, pose_encoder, vae, text_encoder, schedule: DiffusionSchedule,
    cfg: StepConfig = StepConfig(apply_masked_loss=True),
) -> Callable:
    """Stage 2: CMC training (train_cam_ctrl.py:509-665).

    batch: pixel_values (B,F,H,W,3), input_ids/background_ids (B,77),
    null_ids (77,), camera_rt (B,F,12), intrinsics (B,F,4),
    obj_union_mask (B,F,H,W,1).  Returns (grads, metrics).
    """
    unet_apply = _maybe_remat(unet.apply, cfg)

    def grads_fn(trainable_tree, frozen: dict, batch: dict, rng: jax.Array):
        rngs = jax.random.split(rng, 8)
        ids = _select_text(rngs, batch, cfg)

        rt = batch["camera_rt"]
        if cfg.cfg_random_null_text_ratio > 0:  # camera CFG dropout -> zeros (566-575)
            drop = jax.random.uniform(rngs[2], (rt.shape[0],)) < cfg.cfg_random_null_text_ratio
            rt = rt * (1.0 - drop[:, None, None].astype(rt.dtype))

        latents = _encode_latents(vae, frozen["vae"], batch["pixel_values"], rngs[3])
        noise = jax.random.normal(rngs[4], latents.shape, latents.dtype)
        t = schedule.sample_timesteps(rngs[5], latents.shape[0])
        noisy = schedule.add_noise(latents, noise, t)
        context = text_encoder.apply(frozen["text"], ids)
        plucker = plucker_embedding(
            batch["intrinsics"], rt_to_c2w(rt), cfg.sample_height, cfg.sample_width,
            flip_flag=batch.get("flip_flag"),
        )

        def loss_fn(trainable):
            unet_params = {"params": merge_params(trainable["unet"], frozen["unet"])}
            pose_feats = pose_encoder.apply({"params": trainable["pose_encoder"]}, plucker)
            pred = unet_apply(unet_params, noisy, t, context, pose_features=pose_feats)
            loss, metrics = masked_diffusion_loss(
                pred, noise,
                batch.get("obj_union_mask") if cfg.apply_masked_loss else None,
                cfg.invert_loss_mask, cfg.mask_loss_weight, cfg.sd_loss_weight,
            )
            if cfg.appearance_debias > 0:
                loss = loss + cfg.appearance_debias * appearance_debias_loss(pred, noise, rngs[7])
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable_tree)
        return grads, {"loss": loss, **metrics}

    return grads_fn


def make_cam_train_step(
    unet, pose_encoder, vae, text_encoder, schedule: DiffusionSchedule,
    tx: optax.GradientTransformation, cfg: StepConfig = StepConfig(apply_masked_loss=True),
) -> Callable:
    return step_from_grads(
        make_cam_grads_fn(unet, pose_encoder, vae, text_encoder, schedule, cfg), tx
    )


def make_obj_grads_fn(
    unet, pose_encoder, adapter, vae, text_encoder, schedule: DiffusionSchedule,
    cfg: StepConfig = StepConfig(apply_masked_loss=True, invert_loss_mask=False,
                                 sd_loss_weight=0.3),
) -> Callable:
    """Stage 3: OMC training (train_cam_obj_ctrl.py:597-992).

    batch adds: obj_info (B,F,O,12), obj_masks (B,F,O,H,W) — padded object
    axis replacing the reference's ragged lists (SURVEY.md §7 hard parts).
    Returns (grads, metrics).
    """
    unet_apply = _maybe_remat(unet.apply, cfg)

    def grads_fn(trainable_tree, frozen: dict, batch: dict, rng: jax.Array):
        rngs = jax.random.split(rng, 8)
        ids = _select_text(rngs, batch, cfg)

        rt = batch["camera_rt"]
        if cfg.cfg_random_null_text_ratio > 0:
            drop = jax.random.uniform(rngs[2], (rt.shape[0],)) < cfg.cfg_random_null_text_ratio
            rt = rt * (1.0 - drop[:, None, None].astype(rt.dtype))

        latents = _encode_latents(vae, frozen["vae"], batch["pixel_values"], rngs[3])
        noise = jax.random.normal(rngs[4], latents.shape, latents.dtype)
        # biased high-noise timestep sampling (793-800)
        t = schedule.sample_timesteps_biased(
            rngs[5], latents.shape[0], cfg.omcm_min_step, cfg.min_step_prob
        )
        noisy = schedule.add_noise(latents, noise, t)
        context = text_encoder.apply(frozen["text"], ids)
        plucker = plucker_embedding(
            batch["intrinsics"], rt_to_c2w(rt), cfg.sample_height, cfg.sample_width,
            flip_flag=batch.get("flip_flag"),
        )

        # OMC raster (util.py:147-213) — pose*mask, concat mask, CFG dropout,
        # re-mask — shared with the inference path (traj_features.py).
        b, f = batch["obj_info"].shape[:2]
        flat_feats, flat_mask = build_adapter_inputs(
            batch["obj_info"], batch["obj_masks"], rngs[6], cfg.cfg_random_null_om_ratio
        )

        def loss_fn(trainable):
            unet_params = {"params": merge_params(trainable.get("unet", {}), frozen["unet"])}
            pose_params = trainable.get("pose_encoder") or frozen["pose_encoder"]
            pose_feats = pose_encoder.apply({"params": pose_params}, plucker)
            adapter_feats = adapter.apply({"params": trainable["adapter"]}, flat_feats, flat_mask)
            traj_feats = [ft.reshape(b, f, *ft.shape[1:]) for ft in adapter_feats]
            pred = unet_apply(
                unet_params, noisy, t, context, pose_features=pose_feats, traj_features=traj_feats
            )
            union = (jnp.max(batch["obj_masks"], axis=2) > 0).astype(jnp.float32)[..., None]
            loss, metrics = masked_diffusion_loss(
                pred, noise,
                union if cfg.apply_masked_loss else None,
                cfg.invert_loss_mask, cfg.mask_loss_weight, cfg.sd_loss_weight,
            )
            if cfg.appearance_debias > 0:
                loss = loss + cfg.appearance_debias * appearance_debias_loss(pred, noise, rngs[7])
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable_tree)
        return grads, {"loss": loss, **metrics}

    return grads_fn


def make_obj_train_step(
    unet, pose_encoder, adapter, vae, text_encoder, schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg: StepConfig = StepConfig(apply_masked_loss=True, invert_loss_mask=False,
                                 sd_loss_weight=0.3),
) -> Callable:
    return step_from_grads(
        make_obj_grads_fn(unet, pose_encoder, adapter, vae, text_encoder, schedule, cfg), tx
    )

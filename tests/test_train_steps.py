"""Train-step tests for all three stages on tiny models (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synfmc_tpu.data.tokenizer import HashTokenizer
from synfmc_tpu.diffusion import DiffusionSchedule
from synfmc_tpu.models.adapter import ObjectAdapter
from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.pose_encoder import CameraPoseEncoder
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.models.vae import AutoencoderKL
from synfmc_tpu.training.optim import make_optimizer
from synfmc_tpu.training.params import (
    count_params,
    merge_params,
    partition_params,
    stage1_lora_trainable,
    stage2_cmc_unet_trainable,
)
from synfmc_tpu.training.steps import (
    StepConfig,
    TrainState,
    init_train_state,
    make_cam_train_step,
    make_lora_train_step,
    make_obj_train_step,
)

CHS = (32, 64, 128, 128)
H, W, F, B, O = 64, 128, 2, 2, 3
HL, WL = H // 8, W // 8


def _models(camera=False, lora=0):
    unet = UNet3D(
        block_out_channels=CHS, attn_heads=4, cross_attention_dim=32,
        use_motion_module=camera, camera_cond=camera, lora_rank=lora,
    )
    vae = AutoencoderKL(block_out_channels=(32, 32, 32, 32))
    text = CLIPTextModel(vocab_size=49408, hidden_size=32, num_layers=1, num_heads=2)
    return unet, vae, text


def _frozen_params(key, unet, vae, text, frames=F):
    x = jnp.zeros((1, frames, HL, WL, 4))
    ctx = jnp.zeros((1, 77, 32))
    pose = (
        [jnp.zeros((1, frames, HL // 2**i, WL // 2**i, c)) for i, c in enumerate(CHS)]
        if unet.camera_cond
        else None
    )
    unet_v = unet.init(key, x, jnp.zeros((1,), jnp.int32), ctx, pose_features=pose)
    vae_v = vae.init(key, jnp.zeros((1, H, W, 3)))
    text_v = text.init(key, jnp.zeros((1, 77), jnp.int32))
    return unet_v["params"], vae_v, text_v


def _text_batch(b=B):
    tok = HashTokenizer()
    return {
        "input_ids": jnp.asarray(tok(["a red car drives"] * b)),
        "background_ids": jnp.asarray(tok(["a forest"] * b)),
        "null_ids": jnp.asarray(tok([""])[0]),
    }


def test_stage1_lora_step(rng):
    unet, vae, text = _models(camera=False, lora=2)
    key = jax.random.PRNGKey(0)
    unet_params, vae_v, text_v = _frozen_params(key, unet, vae, text, frames=1)
    trainable_unet, frozen_unet = partition_params(unet_params, stage1_lora_trainable)
    assert count_params(trainable_unet) > 0

    tx = make_optimizer(1e-3)
    state = init_train_state({"unet": trainable_unet}, tx)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step = jax.jit(make_lora_train_step(unet, vae, text, DiffusionSchedule.from_config(beta_schedule="scaled_linear"), tx))

    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)).clip(-1, 1),
        **_text_batch(),
    }
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # only LoRA params changed
    diff = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
                                  state.trainable, state2.trainable)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def _video_batch(rng, b=B):
    return {
        "pixel_values": jnp.asarray(rng.normal(size=(b, F, H, W, 3)).astype(np.float32)).clip(-1, 1),
        "camera_rt": jnp.asarray(rng.normal(size=(b, F, 12)).astype(np.float32)),
        "intrinsics": jnp.asarray(
            np.broadcast_to(np.array([W, H, 0, 0], np.float32), (b, F, 4)).copy()
        ),
        "obj_union_mask": jnp.asarray(
            (rng.uniform(size=(b, F, H, W, 1)) > 0.7).astype(np.float32)
        ),
        **_text_batch(b),
    }


@pytest.fixture(scope="module")
def cam_setup():
    unet, vae, text = _models(camera=True)
    pose_enc = CameraPoseEncoder(channels=CHS, temporal_attention_nhead=4)
    key = jax.random.PRNGKey(0)
    unet_params, vae_v, text_v = _frozen_params(key, unet, vae, text)
    pose_v = pose_enc.init(key, jnp.zeros((1, F, H, W, 6)))
    return unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v


def test_stage2_cam_step(cam_setup, rng):
    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    assert count_params(trainable_unet) > 0, "no qkv_merge params found"

    tx = make_optimizer(1e-4)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    state = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step = jax.jit(make_cam_train_step(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), tx, cfg))

    batch = _video_batch(rng)
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mask_loss"]))
    # pose encoder trains
    d = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
        state.trainable["pose_encoder"], state2.trainable["pose_encoder"],
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_stage2_sharded_over_mesh(cam_setup, rng):
    from synfmc_tpu.parallel import create_mesh, replicate, shard_batch

    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    tx = make_optimizer(1e-4)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    state = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step = jax.jit(make_cam_train_step(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), tx, cfg))

    mesh = create_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    batch = shard_batch(_video_batch(rng, b=8), mesh)
    state = replicate(state, mesh)
    frozen = replicate(frozen, mesh)
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))


def test_stage2_fsdp_sharded_matches_replicated(cam_setup, rng):
    """ZeRO-1 over the fsdp axis (the production trainers.py path:
    shard_over_fsdp + out_shardings pin) must (a) keep params+opt state
    sharded across steps and (b) produce the same update as plain DP."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from synfmc_tpu.parallel import (
        create_mesh, replicate, shard_batch, shard_over_fsdp, state_shardings,
    )

    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    tx = make_optimizer(1e-4)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    state0 = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)
    frozen0 = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step_fn = make_cam_train_step(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), tx, cfg)

    mesh = create_mesh(num_fsdp=2)  # (data=4, fsdp=2)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "sp": 1}
    raw = _video_batch(rng, b=4)
    batch = shard_batch(raw, mesh)
    frozen = replicate(frozen0, mesh)

    # DP reference: fully replicated state on the same mesh
    rep_state = replicate(state0, mesh)
    s_rep, m_rep = jax.jit(step_fn)(rep_state, frozen, batch, jax.random.PRNGKey(5))

    # ZeRO: sharded state + pinned output shardings
    sh_state = shard_over_fsdp(state0, mesh)
    big = [x for x in jax.tree_util.tree_leaves(sh_state.trainable)
           if x.size >= 1024 and x.shape[0] % 2 == 0]
    assert big and all(x.sharding.spec == P("fsdp") for x in big)
    jit_sh = jax.jit(step_fn, out_shardings=(state_shardings(sh_state), NamedSharding(mesh, P())))
    s_sh, m_sh = jit_sh(sh_state, frozen, batch, jax.random.PRNGKey(5))

    assert np.isfinite(float(m_sh["loss"]))
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_rep["loss"]), rtol=1e-5)
    # sharding persisted through the step
    big2 = [x for x in jax.tree_util.tree_leaves(s_sh.trainable)
            if x.size >= 1024 and x.shape[0] % 2 == 0]
    assert big2 and all(x.sharding.spec == P("fsdp") for x in big2)
    # and the update is numerically the DP update
    for a, b in zip(jax.tree_util.tree_leaves(s_sh.trainable),
                    jax.tree_util.tree_leaves(s_rep.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_stage2_sp_sharded_training_matches_replicated(cam_setup, rng):
    """Frame-axis (sp) activation sharding in TRAINING: same update as the
    unsharded step, and the partitioned executable does ~1/N of the per-
    device FLOPs (the point: activations shrink by sp, which is what OOMs
    at 512x768 on one chip — PERF.md)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from synfmc_tpu.parallel import (
        create_mesh, replicate, shard_batch, shard_over_fsdp, state_shardings,
    )

    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    tx = make_optimizer(1e-4)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    state0 = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)
    frozen0 = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step_fn = make_cam_train_step(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), tx, cfg)

    raw = _video_batch(rng, b=2)

    # unsharded reference (single default device)
    s_ref, m_ref = jax.jit(step_fn)(state0, frozen0, raw, jax.random.PRNGKey(5))

    # sp mesh: data=2 (one batch row per data shard — the fold-contiguity
    # rule), sp=2 over the F=2 frames, fsdp=2 composing with ZeRO
    mesh = create_mesh(num_data=2, num_fsdp=2, num_sp=2)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "sp": 2}
    batch = shard_batch(raw, mesh)
    assert batch["pixel_values"].sharding.spec == P("data", "sp")
    assert batch["input_ids"].sharding.spec == P("data")  # 77 tokens: no sp
    frozen = replicate(frozen0, mesh)
    sh_state = shard_over_fsdp(state0, mesh)
    jit_sh = jax.jit(step_fn, out_shardings=(state_shardings(sh_state),
                                             NamedSharding(mesh, P())))
    s_sh, m_sh = jit_sh(sh_state, frozen, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_sh.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # per-device compute actually shrinks: partitioned flops << unsharded
    def flops(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))

    f_ref = flops(jax.jit(step_fn).lower(state0, frozen0, raw, jax.random.PRNGKey(5)).compile())
    f_sh = flops(jit_sh.lower(sh_state, frozen, batch, jax.random.PRNGKey(5)).compile())
    assert f_sh < 0.45 * f_ref, (f_sh, f_ref)  # ideal 0.25 at data*sp=4 + collectives


def test_stage3_obj_step(cam_setup, rng):
    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    adapter = ObjectAdapter(channels=CHS)
    adapter_v = adapter.init(jax.random.PRNGKey(0), jnp.zeros((F, H, W, 13)), jnp.zeros((F, H, W, 1)))

    _, frozen_unet = partition_params(unet_params, lambda p: False)
    tx = make_optimizer(1e-6)
    cfg = StepConfig(
        apply_masked_loss=True, invert_loss_mask=False, sd_loss_weight=0.3,
        sample_height=H, sample_width=W,
    )
    state = init_train_state({"adapter": adapter_v["params"]}, tx)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v, "pose_encoder": pose_v["params"]}
    step = jax.jit(
        make_obj_train_step(unet, pose_enc, adapter, vae, text, DiffusionSchedule.from_config(), tx, cfg)
    )

    batch = _video_batch(rng)
    batch["obj_info"] = jnp.asarray(rng.normal(size=(B, F, O, 12)).astype(np.float32))
    masks = (rng.uniform(size=(B, F, O, H, W)) > 0.8).astype(np.float32)
    masks[:, :, O - 1] = 0  # padding object
    batch["obj_masks"] = jnp.asarray(masks)
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["loss"]))
    d = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
        state.trainable["adapter"], state2.trainable["adapter"],
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.e2e
def test_stage2_overfits_one_batch(cam_setup, rng):
    """Training must actually LEARN: repeated steps on one fixed batch with a
    fixed (noise, timestep) draw drive the loss down substantially.  Pins the
    whole grad/optimizer path end-to-end, not just 'loss is finite'."""
    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    tx = make_optimizer(3e-3)
    cfg = StepConfig(
        apply_masked_loss=False, cfg_random_null_text_ratio=0.0,
        background_caption_prob=0.0, sample_height=H, sample_width=W,
    )
    # donate_argnums deletes the state's buffers — copy them first, or the
    # donation would destroy the module-scoped fixture's param arrays for
    # every later test in a full single-process run
    state = init_train_state(
        jax.tree.map(jnp.copy, {"unet": trainable_unet, "pose_encoder": pose_v["params"]}), tx
    )
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    step = jax.jit(
        make_cam_train_step(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), tx, cfg),
        donate_argnums=(0,),
    )

    batch = _video_batch(rng)
    key = jax.random.PRNGKey(11)  # SAME key every step -> same noise/timesteps
    losses = []
    for _ in range(25):
        state, metrics = step(state, frozen, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # only the zero-init merges + pose encoder are trainable (the frozen
    # random UNet predicts most of the target), so expect a solid but not
    # dramatic drop — measured ~0.74x over 25 steps at this lr
    assert np.mean(losses[-5:]) < 0.85 * np.mean(losses[:5]), losses


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_stage2_remat_policies_compile_and_match(cam_setup, rng, policy):
    """Remat modes must produce the SAME update as no-remat (checkpointing
    changes memory/FLOPs, never math)."""
    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    tx = make_optimizer(1e-4)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    batch = _video_batch(rng)

    outs = []
    for cfg in (StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W),
                StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W,
                           remat=True, remat_policy=policy)):
        state = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)
        step = jax.jit(make_cam_train_step(unet, pose_enc, vae, text,
                                           DiffusionSchedule.from_config(), tx, cfg))
        s2, m = step(state, frozen, batch, jax.random.PRNGKey(11))
        outs.append((float(m["loss"]), s2.trainable))
    assert np.isfinite(outs[0][0])
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_gradient_accumulation_step(cam_setup, rng):
    """make_accumulating_step == mean of per-micro gradients fed to one
    optimizer update (the reference's gradient_accumulation_steps knob never
    accumulates — train_cam_obj_ctrl.py:486-487 — ours is real)."""
    import optax

    from synfmc_tpu.training.steps import (
        make_accumulating_step,
        make_cam_grads_fn,
        step_from_grads,
    )

    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    grads_fn = make_cam_grads_fn(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), cfg)
    frozen = {"unet": frozen_unet, "vae": vae_v, "text": text_v}
    trainable = {"unet": trainable_unet, "pose_encoder": pose_v["params"]}

    k = 3
    micros = [_video_batch(np.random.default_rng(100 + i)) for i in range(k)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)
    key = jax.random.PRNGKey(7)

    # SGD makes the update equal the (scaled) gradient -> exact comparison
    tx = optax.sgd(1.0)
    state = init_train_state(trainable, tx)
    acc_step = jax.jit(make_accumulating_step(grads_fn, tx, k))
    state_acc, metrics_acc = acc_step(state, frozen, stacked, key)

    g_list, m_list = [], []
    for i in range(k):
        g, m = jax.jit(grads_fn)(trainable, frozen, micros[i], jax.random.fold_in(key, i))
        g_list.append(g)
        m_list.append(m)
    g_mean = jax.tree_util.tree_map(lambda *xs: sum(xs) / k, *g_list)

    # accumulated update == -mean(per-micro grads) under sgd(1.0)
    expected = jax.tree_util.tree_map(lambda p, g: p - g, trainable, g_mean)
    for a, b in zip(jax.tree_util.tree_leaves(state_acc.trainable),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        float(metrics_acc["loss"]),
        np.mean([float(m["loss"]) for m in m_list]), rtol=1e-6,
    )
    # exactly one optimizer update happened
    assert int(state_acc.step) == 1


def test_accumulated_stacked_batch_sharding(cam_setup, rng):
    """shard_batch(stacked=True) keeps the micro axis unsharded and the data
    axis one deeper; the accumulating step runs on the 8-device mesh."""
    from jax.sharding import PartitionSpec as P

    from synfmc_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from synfmc_tpu.training.steps import make_accumulating_step, make_cam_grads_fn

    unet, vae, text, pose_enc, unet_params, vae_v, text_v, pose_v = cam_setup
    trainable_unet, frozen_unet = partition_params(unet_params, stage2_cmc_unet_trainable)
    cfg = StepConfig(apply_masked_loss=True, sample_height=H, sample_width=W)
    grads_fn = make_cam_grads_fn(unet, pose_enc, vae, text, DiffusionSchedule.from_config(), cfg)
    tx = make_optimizer(1e-4)
    state = init_train_state({"unet": trainable_unet, "pose_encoder": pose_v["params"]}, tx)

    mesh = create_mesh(num_data=2, num_fsdp=1, devices=jax.devices()[:2])

    k = 2
    micros = [_video_batch(np.random.default_rng(i)) for i in range(k)]
    stacked_host = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *micros)
    with mesh:
        batch = shard_batch(stacked_host, mesh, stacked=True)
        assert batch["pixel_values"].sharding.spec == P(None, "data")
        state_m = replicate(state, mesh)
        frozen = replicate({"unet": frozen_unet, "vae": vae_v, "text": text_v}, mesh)
        step = jax.jit(make_accumulating_step(grads_fn, tx, k))
        state2, metrics = step(state_m, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1

"""End-to-end generation pipeline tests with tiny models."""

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
from synfmc_tpu.pipelines import AnimationPipeline

pytestmark = pytest.mark.e2e

CHS = (32, 64, 128, 128)
H, W, F = 64, 128, 4  # latent 8x16


@pytest.fixture(scope="module")
def pipe():
    key = jax.random.PRNGKey(0)
    unet = UNet3D(
        block_out_channels=CHS, attn_heads=4, cross_attention_dim=64,
        use_motion_module=True, camera_cond=True,
    )
    vae = AutoencoderKL(block_out_channels=(32, 32, 32, 32))
    text = CLIPTextModel(vocab_size=49408, hidden_size=64, num_layers=2, num_heads=4)
    pose_enc = CameraPoseEncoder(channels=CHS, temporal_attention_nhead=4)
    adapter = ObjectAdapter(channels=CHS)

    hl, wl = H // 8, W // 8
    x = jnp.zeros((2, F, hl, wl, 4))
    ctx = jnp.zeros((2, 77, 64))
    pose = [jnp.zeros((2, F, hl // 2**i, wl // 2**i, c)) for i, c in enumerate(CHS)]
    unet_params = unet.init(key, x, jnp.zeros((2,), jnp.int32), ctx, pose_features=pose)
    vae_params = vae.init(key, jnp.zeros((1, H, W, 3)))
    text_params = text.init(key, jnp.zeros((1, 77), jnp.int32))
    pose_params = pose_enc.init(key, jnp.zeros((1, F, H, W, 6)))
    adapter_params = adapter.init(key, jnp.zeros((F, H, W, 13)), jnp.zeros((F, H, W, 1)))

    return AnimationPipeline(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=HashTokenizer(),
        schedule=DiffusionSchedule.from_config(),
        pose_encoder=pose_enc, pose_encoder_params=pose_params,
        adapter=adapter, adapter_params=adapter_params,
    )


def test_text_to_video(pipe):
    video = pipe(
        ["a cat walks"], video_length=F, height=H, width=W,
        num_inference_steps=3, rng=jax.random.PRNGKey(1),
    )
    assert video.shape == (1, F, H, W, 3)
    v = np.asarray(video)
    assert v.min() >= 0.0 and v.max() <= 1.0 and np.isfinite(v).all()


def test_decode_chunk_matches_framewise(pipe):
    """Chunked VAE decode == frame-wise decode (the VAE is frame-independent;
    only the batching changes, so values match to compile tolerance)."""
    from synfmc_tpu.pipelines.animation import decode_latents

    latents = jax.random.normal(jax.random.PRNGKey(3), (1, F, H // 8, W // 8, 4))
    ref = decode_latents(pipe.vae, pipe.vae_params, latents)
    for k in (2, 3, F):  # 3 does not divide F=4: falls back to divisor 2
        got = decode_latents(pipe.vae, pipe.vae_params, latents, decode_chunk=k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_camera_ctrl_changes_output(pipe):
    kw = dict(video_length=F, height=H, width=W, num_inference_steps=2, rng=jax.random.PRNGKey(2), decode=False)
    plucker = jnp.ones((1, F, H, W, 6)) * 0.3
    lat_cam = pipe(["x"], plucker=plucker, **kw)
    lat_plain = pipe(["x"], **kw)
    assert lat_cam.shape == lat_plain.shape
    # random-init pose encoder + trained-free merge: merge is zero-init so
    # outputs should match at init (pose path inert)
    np.testing.assert_allclose(np.asarray(lat_cam), np.asarray(lat_plain), atol=1e-4)


def test_obj_ctrl_gating(pipe):
    kw = dict(video_length=F, height=H, width=W, num_inference_steps=2, rng=jax.random.PRNGKey(3), decode=False)
    hl, wl = H // 8, W // 8
    rng = np.random.default_rng(0)
    traj = [
        jnp.asarray(rng.normal(size=(1, F, hl // 2**i, wl // 2**i, c)).astype(np.float32))
        for i, c in enumerate(CHS)
    ]
    lat_obj = pipe(["x"], traj_features=traj, **kw)
    lat_plain = pipe(["x"], **kw)
    # nonzero traj features, t>=700 for both of 2 steps with 1000//2 spacing
    # (timesteps 501, 1): first step t=501 < 700 -> gated off; also uncond zeroed.
    # Use min_step 0 to force the effect:
    lat_obj_on = pipe(["x"], traj_features=traj, omcm_min_step=0, **kw)
    assert np.abs(np.asarray(lat_obj_on) - np.asarray(lat_plain)).max() > 1e-5
    # with min_step 1000 the gate is always off -> identical to plain
    lat_obj_off = pipe(["x"], traj_features=traj, omcm_min_step=1000, **kw)
    np.testing.assert_allclose(np.asarray(lat_obj_off), np.asarray(lat_plain), atol=1e-5)
    del lat_obj


def test_deepcache_matches_hand_rolled_reference(pipe):
    """deepcache_interval=2 must equal a hand-rolled loop that runs the full
    UNet on even steps (caching the up_blocks_2 output) and the shallow
    DeepCache path on odd steps."""
    steps = 4
    rng = jax.random.PRNGKey(5)
    lat_cached = pipe(
        ["x"], video_length=F, height=H, width=W, num_inference_steps=steps,
        rng=rng, deepcache_interval=2, decode=False,
    )

    schedule = pipe.schedule
    unet, params = pipe.unet, pipe.unet_params
    context = pipe.encode_prompt(["x"])
    hl, wl = H // 8, W // 8
    latents = jax.random.normal(rng, (1, F, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
    deep = None
    for idx, t in enumerate(np.asarray(schedule.ddim_timesteps(steps))):
        latent_in = jnp.concatenate([latents, latents], axis=0).astype(unet.dtype)
        t_vec = jnp.full((2,), t)
        if idx % 2 == 0:
            eps, deep = unet.apply(params, latent_in, t_vec, context, return_deep=True)
        else:
            eps = unet.apply(params, latent_in, t_vec, context, deep_cache=deep)
        uncond, cond = jnp.split(eps, 2, axis=0)
        eps_cfg = uncond + 8.0 * (cond - uncond)
        latents = schedule.ddim_step(eps_cfg, t, latents, steps)

    # jit(scan+cond) vs eager evaluation reorders float accumulation; the
    # latents are O(20) here so compare relatively.
    np.testing.assert_allclose(np.asarray(lat_cached), np.asarray(latents), rtol=2e-4, atol=1e-3)
    assert np.isfinite(np.asarray(lat_cached)).all()


def test_deepcache_shallow_step_uses_cache(pipe):
    """The shallow path must actually depend on deep_cache (not recompute)."""
    hl, wl = H // 8, W // 8
    x = jnp.ones((2, F, hl, wl, 4)) * 0.1
    ctx = jnp.zeros((2, 77, 64))
    t_vec = jnp.full((2,), 500)
    unet, params = pipe.unet, pipe.unet_params
    _, deep = unet.apply(params, x, t_vec, ctx, return_deep=True)
    eps_a = unet.apply(params, x, t_vec, ctx, deep_cache=deep)
    eps_b = unet.apply(params, x, t_vec, ctx, deep_cache=deep * 2.0)
    assert np.abs(np.asarray(eps_a) - np.asarray(eps_b)).max() > 1e-6
    # with the true cache, the shallow step equals the full forward exactly
    eps_full = unet.apply(params, x, t_vec, ctx)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_full), atol=1e-5)


def test_multidiff_windowing(pipe):
    video = pipe(
        ["pan"], video_length=F, height=H, width=W, num_inference_steps=2,
        rng=jax.random.PRNGKey(4), multidiff_total_steps=2, multidiff_overlaps=2,
        decode=False,
    )
    # total frames = 2*(4-2)+2 = 6
    assert video.shape == (1, 6, H // 8, W // 8, 4)
    assert np.isfinite(np.asarray(video)).all()


def test_denoise_loop_sharded_over_mesh(pipe):
    """Inference data parallelism: the jitted denoise_loop runs with latents
    sharded over the 8-device 'data' axis (serving-side analog of the
    training DP test)."""
    from synfmc_tpu.parallel import create_mesh
    from synfmc_tpu.pipelines.animation import denoise_loop
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh()
    hl, wl = H // 8, W // 8
    b = 8
    lat = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(6), (b, F, hl, wl, 4), jnp.float32),
        NamedSharding(mesh, P("data")),
    )
    ctx = jax.device_put(
        jnp.zeros((2 * b, 77, 64)), NamedSharding(mesh, P("data")))
    out = denoise_loop(pipe.unet, pipe.unet_params, pipe.schedule, lat, ctx,
                       num_inference_steps=2)
    assert out.shape == (b, F, hl, wl, 4)
    assert out.sharding.spec == P("data")
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_mesh_data_parallel_matches_single(pipe):
    """AnimationPipeline(mesh=...) shards generation over the 'data' axis
    (multi-chip serving); outputs must match the unsharded pipeline."""
    import dataclasses

    from synfmc_tpu.parallel import create_mesh

    prompts = [f"a cat walks {i}" for i in range(8)]
    rng = jax.random.PRNGKey(9)
    ref = pipe(prompts, video_length=F, height=H, width=W,
               num_inference_steps=2, rng=rng)

    sharded_pipe = dataclasses.replace(pipe, mesh=create_mesh())
    out = sharded_pipe(prompts, video_length=F, height=H, width=W,
                       num_inference_steps=2, rng=rng)
    assert out.shape == ref.shape == (8, F, H, W, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # batch not divisible by the data axis must fail loudly
    with pytest.raises(AssertionError, match="divide the mesh"):
        sharded_pipe(prompts[:3], video_length=F, height=H, width=W,
                     num_inference_steps=1, rng=rng)


def test_cfg_cache_matches_hand_rolled_reference(pipe):
    """cfg_cache_interval=2 must equal a hand-rolled loop that runs the full
    CFG pair on even steps and only the cond branch (reusing the cached
    uncond eps) on odd steps."""
    steps = 4
    rng = jax.random.PRNGKey(15)
    lat_cached = pipe(
        ["x"], video_length=F, height=H, width=W, num_inference_steps=steps,
        rng=rng, cfg_cache_interval=2, decode=False,
    )

    schedule = pipe.schedule
    unet, params = pipe.unet, pipe.unet_params
    context = pipe.encode_prompt(["x"])
    ctx_cond = context[1:]
    hl, wl = H // 8, W // 8
    latents = jax.random.normal(rng, (1, F, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
    uncond = None
    for idx, t in enumerate(np.asarray(schedule.ddim_timesteps(steps))):
        if idx % 2 == 0:
            latent_in = jnp.concatenate([latents, latents], axis=0).astype(unet.dtype)
            eps = unet.apply(params, latent_in, jnp.full((2,), t), context)
            uncond, cond = jnp.split(eps, 2, axis=0)
        else:
            cond = unet.apply(params, latents.astype(unet.dtype), jnp.full((1,), t), ctx_cond)
        eps_cfg = uncond + 8.0 * (cond - uncond)
        latents = schedule.ddim_step(eps_cfg, t, latents, steps)

    np.testing.assert_allclose(np.asarray(lat_cached), np.asarray(latents), rtol=2e-4, atol=1e-3)
    assert np.isfinite(np.asarray(lat_cached)).all()


def test_cfg_cache_differs_from_exact_but_close(pipe):
    """Interval > 1 is approximate (the uncond branch is stale on cache
    steps): output differs from the exact path, but stays in the same range."""
    steps = 4
    rng = jax.random.PRNGKey(16)
    kw = dict(video_length=F, height=H, width=W, num_inference_steps=steps,
              rng=rng, decode=False)
    exact = pipe(["y"], **kw)
    cached = pipe(["y"], cfg_cache_interval=2, **kw)
    diff = np.abs(np.asarray(exact) - np.asarray(cached)).max()
    assert diff > 1e-7, "cache interval had no effect — uncond never reused"
    assert np.isfinite(np.asarray(cached)).all()


def test_turbo_cache_matches_hand_rolled_reference(pipe):
    """cfg_cache_interval == deepcache_interval == 2 composes both caches:
    even steps run the full 2B forward (re-recording deep + uncond), odd
    steps run only the shallow level on the cond branch."""
    steps = 4
    rng = jax.random.PRNGKey(17)
    lat_turbo = pipe(
        ["x"], video_length=F, height=H, width=W, num_inference_steps=steps,
        rng=rng, cfg_cache_interval=2, deepcache_interval=2, decode=False,
    )

    schedule = pipe.schedule
    unet, params = pipe.unet, pipe.unet_params
    context = pipe.encode_prompt(["x"])
    ctx_cond = context[1:]
    hl, wl = H // 8, W // 8
    latents = jax.random.normal(rng, (1, F, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
    uncond = deep = None
    for idx, t in enumerate(np.asarray(schedule.ddim_timesteps(steps))):
        if idx % 2 == 0:
            latent_in = jnp.concatenate([latents, latents], axis=0).astype(unet.dtype)
            eps, deep = unet.apply(params, latent_in, jnp.full((2,), t), context,
                                   return_deep=True)
            uncond, cond = jnp.split(eps, 2, axis=0)
        else:
            cond = unet.apply(params, latents.astype(unet.dtype), jnp.full((1,), t),
                              ctx_cond, deep_cache=deep[1:])
        eps_cfg = uncond + 8.0 * (cond - uncond)
        latents = schedule.ddim_step(eps_cfg, t, latents, steps)

    np.testing.assert_allclose(np.asarray(lat_turbo), np.asarray(latents), rtol=2e-4, atol=1e-3)
    assert np.isfinite(np.asarray(lat_turbo)).all()


def test_dpmpp_solver_matches_hand_rolled_reference(pipe):
    """solver='dpmpp_2m' must equal a hand-rolled loop driving
    schedule.dpmpp_2m_step with the same CFG epsilons — and differ from the
    DDIM path (it is a different update rule, not a re-label)."""
    steps = 3
    rng = jax.random.PRNGKey(21)
    kw = dict(video_length=F, height=H, width=W, num_inference_steps=steps,
              rng=rng, decode=False)
    lat_dpm = pipe(["x"], solver="dpmpp_2m", **kw)

    schedule = pipe.schedule
    unet, params = pipe.unet, pipe.unet_params
    context = pipe.encode_prompt(["x"])
    hl, wl = H // 8, W // 8
    latents = jax.random.normal(rng, (1, F, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
    tables = schedule.dpmpp_2m_tables(steps)
    m_prev = jnp.zeros_like(latents)
    for idx, t in enumerate(np.asarray(schedule.ddim_timesteps(steps))):
        latent_in = jnp.concatenate([latents, latents], axis=0).astype(unet.dtype)
        eps = unet.apply(params, latent_in, jnp.full((2,), t), context)
        uncond, cond = jnp.split(eps, 2, axis=0)
        eps_cfg = uncond + 8.0 * (cond - uncond)
        latents, m_prev = schedule.dpmpp_2m_step(eps_cfg, idx, latents, m_prev, tables)

    np.testing.assert_allclose(np.asarray(lat_dpm), np.asarray(latents), rtol=2e-4, atol=1e-3)
    lat_ddim = pipe(["x"], solver="ddim", **kw)
    assert np.abs(np.asarray(lat_dpm) - np.asarray(lat_ddim)).max() > 1e-4


def test_dpmpp_solver_composes_with_turbo_cache(pipe):
    """The solver choice is orthogonal to the cache modes: turbo caching with
    dpmpp_2m must equal the hand-rolled turbo loop with the dpmpp update."""
    steps = 4
    rng = jax.random.PRNGKey(22)
    lat = pipe(
        ["x"], video_length=F, height=H, width=W, num_inference_steps=steps,
        rng=rng, cfg_cache_interval=2, deepcache_interval=2, solver="dpmpp_2m",
        decode=False,
    )

    schedule = pipe.schedule
    unet, params = pipe.unet, pipe.unet_params
    context = pipe.encode_prompt(["x"])
    ctx_cond = context[1:]
    hl, wl = H // 8, W // 8
    latents = jax.random.normal(rng, (1, F, hl, wl, 4), jnp.float32) * schedule.init_noise_sigma
    tables = schedule.dpmpp_2m_tables(steps)
    m_prev = jnp.zeros_like(latents)
    uncond = deep = None
    for idx, t in enumerate(np.asarray(schedule.ddim_timesteps(steps))):
        if idx % 2 == 0:
            latent_in = jnp.concatenate([latents, latents], axis=0).astype(unet.dtype)
            eps, deep = unet.apply(params, latent_in, jnp.full((2,), t), context,
                                   return_deep=True)
            uncond, cond = jnp.split(eps, 2, axis=0)
        else:
            cond = unet.apply(params, latents.astype(unet.dtype), jnp.full((1,), t),
                              ctx_cond, deep_cache=deep[1:])
        eps_cfg = uncond + 8.0 * (cond - uncond)
        latents, m_prev = schedule.dpmpp_2m_step(eps_cfg, idx, latents, m_prev, tables)

    np.testing.assert_allclose(np.asarray(lat), np.asarray(latents), rtol=2e-4, atol=1e-3)
    assert np.isfinite(np.asarray(lat)).all()


def test_turbo_cache_requires_equal_intervals(pipe):
    with pytest.raises(AssertionError, match="shared refresh interval"):
        pipe(["x"], video_length=F, height=H, width=W, num_inference_steps=2,
             rng=jax.random.PRNGKey(0), cfg_cache_interval=2, deepcache_interval=3,
             decode=False)

def test_pipeline_frame_parallel_matches_single(pipe):
    """Sequence-parallel serving: a SINGLE clip sharded over a
    {data:2, sp:4} mesh (CFG pair on 'data', frames on 'sp') must match the
    unsharded pipeline — the capability plain data parallelism cannot give."""
    import dataclasses

    from synfmc_tpu.parallel import create_serving_mesh

    kw = dict(video_length=F, height=H, width=W, num_inference_steps=2,
              rng=jax.random.PRNGKey(21))
    ref = pipe(["a red car"], **kw)

    mesh = create_serving_mesh(num_data=2, num_sp=4)
    sp_pipe = dataclasses.replace(pipe, mesh=mesh)
    out = sp_pipe(["a red car"], **kw)
    assert out.shape == ref.shape == (1, F, H, W, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # conditioned path too (pose features shard on their frame axis)
    plucker = jnp.ones((1, F, H, W, 6)) * 0.3
    ref_c = pipe(["pan left"], plucker=plucker, decode=False, **kw)
    out_c = sp_pipe(["pan left"], plucker=plucker, decode=False, **kw)
    # latents are O(20); partitioned reductions reorder float accumulation
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), rtol=2e-4, atol=5e-4)

    # mesh data axis must equal 2*batch — CFG pair rides 'data'
    with pytest.raises(AssertionError, match="2\\*batch"):
        sp_pipe(["a", "b"], **kw)


def test_frame_parallel_turbo_cache_matches(pipe):
    """The opt-in cache modes compose with frame-parallel serving."""
    import dataclasses

    from synfmc_tpu.parallel import create_serving_mesh

    kw = dict(video_length=F, height=H, width=W, num_inference_steps=4,
              rng=jax.random.PRNGKey(22), decode=False,
              cfg_cache_interval=2, deepcache_interval=2)
    ref = pipe(["orbit"], **kw)
    sp_pipe = dataclasses.replace(pipe, mesh=create_serving_mesh(num_data=2, num_sp=4))
    out = sp_pipe(["orbit"], **kw)
    # latents are O(20) and 4 steps accumulate reordered partitioned reductions
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-3)


def test_frame_parallel_actually_partitions_the_unet(pipe):
    """Partition quality, not just correctness: per-device FLOPs of the
    sp-sharded denoise loop must be a small fraction of the unsharded compile
    (ideal 1/8 on 8 devices; temporal-attention collectives/overlap allowed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from synfmc_tpu.parallel import create_serving_mesh
    from synfmc_tpu.pipelines.animation import denoise_loop

    hl, wl = H // 8, W // 8
    lat = jax.random.normal(jax.random.PRNGKey(23), (1, F, hl, wl, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 64))

    def flops(mesh):
        kw = dict(num_inference_steps=2, mesh=mesh)
        args = (pipe.unet, pipe.unet_params, pipe.schedule)
        if mesh is not None:
            lat_s = jax.device_put(lat, NamedSharding(mesh, P(None, "sp")))
            ctx_s = jax.device_put(ctx, NamedSharding(mesh, P("data")))
        else:
            lat_s, ctx_s = lat, ctx
        compiled = denoise_loop.lower(*args, lat_s, ctx_s, **kw).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost["flops"])

    mesh = create_serving_mesh(num_data=2, num_sp=4)
    full = flops(None)
    per_dev = flops(mesh)
    assert per_dev < full * 0.35, (
        f"sp mesh did not partition the UNet: per-device flops {per_dev:.3e} "
        f"vs unsharded {full:.3e} (expected ≲ 1/8 + collective overhead)"
    )


def test_pipeline_batch_invariance(pipe):
    """Batching two requests into one call (the serving MicroBatcher's
    contract) must reproduce each solo run: per-sample latents are supplied
    explicitly, so only UNet/VAE batch invariance is in play."""
    hl, wl = H // 8, W // 8
    sigma = pipe.schedule.init_noise_sigma
    lat_a = jax.random.normal(jax.random.PRNGKey(7), (1, F, hl, wl, 4), jnp.float32) * sigma
    lat_b = jax.random.normal(jax.random.PRNGKey(8), (1, F, hl, wl, 4), jnp.float32) * sigma

    kw = dict(video_length=F, height=H, width=W, num_inference_steps=3)
    solo_a = pipe(["a red car"], latents=lat_a, **kw)
    solo_b = pipe(["a blue boat"], latents=lat_b, **kw)
    both = pipe(["a red car", "a blue boat"],
                latents=jnp.concatenate([lat_a, lat_b]), **kw)

    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo_a[0]),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(solo_b[0]),
                               atol=2e-4, rtol=0)

"""Multi-shape denoise throughput: proves the stack is shape-general and
reports MFU at each point (512x768, 32-frame, and the flagship)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synfmc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # + honors JAX_PLATFORMS (the remote-TPU plugin ignores the env var)
import jax, jax.numpy as jnp
from synfmc_tpu.diffusion import DiffusionSchedule
from synfmc_tpu.models.unet3d import UNet3D

dtype = jnp.bfloat16
chs = (320, 640, 1280, 1280)
xdim = 768
schedule = DiffusionSchedule.from_config()
unet = UNet3D(block_out_channels=chs, attn_heads=8, cross_attention_dim=xdim,
              use_motion_module=True, camera_cond=True, lora_rank=2, dtype=dtype)

def flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)): ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0

def run(f, hl, wl, label, steps=25):
    b = 1
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (b, f, hl, wl, 4), jnp.float32)
    ctx = jax.random.normal(rng, (2*b, 77, xdim), dtype)
    pose = [jax.random.normal(rng, (2*b, f, hl//2**i, wl//2**i, c), dtype)*0.02
            for i, c in enumerate(chs)]
    traj = [p*0.5 for p in pose]
    shapes = jax.eval_shape(lambda r: unet.init(
        r, jnp.zeros((2*b, f, hl, wl, 4), dtype), jnp.zeros((2*b,), jnp.int32), ctx,
        pose_features=pose, traj_features=traj), jax.random.PRNGKey(1))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype), shapes)
    timesteps = jnp.asarray(schedule.ddim_timesteps(steps))

    @jax.jit
    def denoise(params, latents, ctx, pose, traj):
        def body(lat, t):
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(dtype)
            eps = unet.apply(params, lat_in, jnp.full((2*b,), t), ctx,
                             pose_features=pose, traj_features=[tr*(t>=700) for tr in traj])
            uncond, cond = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return schedule.ddim_step(uncond + 8.0*(cond-uncond), t, lat, steps), None
        out, _ = jax.lax.scan(body, latents, timesteps)
        return out

    t0 = time.time()
    _ = float(jnp.sum(denoise(params, latents, ctx, pose, traj)))
    print(f"# {label}: compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
    times = []
    for i in range(3):
        fresh = jax.random.normal(jax.random.PRNGKey(100+i), latents.shape, jnp.float32)
        _ = float(jnp.sum(fresh))
        t0 = time.time()
        _ = float(jnp.sum(denoise(params, fresh, ctx, pose, traj)))
        times.append(time.time()-t0)
    sps = steps/min(times)
    fwd = jax.jit(lambda p, lat, c_, po, tr: unet.apply(
        p, lat, jnp.full((2*b,), 500), c_, pose_features=po, traj_features=tr))
    lat2 = jnp.zeros((2*b, f, hl, wl, 4), dtype)
    fl = flops_of(fwd.lower(params, lat2, ctx, pose, traj).compile())
    tf = fl*sps/1e12
    print(f"{label}: {sps:.2f} steps/s | {fl/1e9:.0f} GFLOP/step | {tf:.1f} TF/s | {100*tf/197:.1f}% MFU")

run(16, 64, 96, "16f @ 512x768")
run(32, 32, 48, "32f @ 256x384")

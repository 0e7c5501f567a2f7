import jax
import jax.numpy as jnp
import numpy as np

from synfmc_tpu.diffusion import DiffusionSchedule


def _sched(schedule="linear"):
    return DiffusionSchedule.from_config(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule=schedule, steps_offset=1, clip_sample=False,
    )


def test_beta_schedules():
    lin = _sched("linear")
    sc = _sched("scaled_linear")
    # independent closed forms
    betas_lin = np.linspace(0.00085, 0.012, 1000)
    betas_sc = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(lin.alphas_cumprod, np.cumprod(1 - betas_lin), rtol=1e-12)
    np.testing.assert_allclose(sc.alphas_cumprod, np.cumprod(1 - betas_sc), rtol=1e-12)


def test_add_noise_closed_form(rng):
    s = _sched()
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    t = jnp.array([0, 999])
    noisy = np.asarray(s.add_noise(x0, noise, t))
    for b, tt in enumerate([0, 999]):
        a = s.alphas_cumprod[tt]
        want = np.sqrt(a) * np.asarray(x0[b]) + np.sqrt(1 - a) * np.asarray(noise[b])
        np.testing.assert_allclose(noisy[b], want, atol=1e-5)


def test_ddim_timesteps_match_diffusers_formula():
    s = _sched()
    ts = s.ddim_timesteps(25)
    want = (np.arange(25) * 40).round()[::-1].astype(np.int64) + 1
    np.testing.assert_array_equal(ts, want)
    assert ts[0] == 961 and ts[-1] == 1


def test_ddim_step_formula(rng):
    s = _sched()
    x = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    t = 961
    got = np.asarray(s.ddim_step(eps, jnp.asarray(t), x, 25))
    a_t = s.alphas_cumprod[t]
    a_prev = s.alphas_cumprod[t - 40]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # last step: alpha_prev == 1 (set_alpha_to_one)
    got_last = np.asarray(s.ddim_step(eps, jnp.asarray(1), x, 25))
    a_t = s.alphas_cumprod[1]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    np.testing.assert_allclose(got_last, x0, atol=1e-5)


def test_ddim_recovers_x0_with_oracle_eps(rng):
    """Full 25-step DDIM with an oracle epsilon exactly inverts add_noise."""
    s = _sched()
    x0 = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    eps_true = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    ts = s.ddim_timesteps(25)
    x = s.add_noise(x0, eps_true, jnp.array([ts[0]]))
    for t in ts:
        # oracle: the exact eps that generated x from the *current* implied x0
        abar = s.alphas_cumprod[t]
        eps = (np.asarray(x) - np.sqrt(abar) * np.asarray(x0)) / np.sqrt(1 - abar)
        x = s.ddim_step(jnp.asarray(eps), jnp.asarray(t), x, 25)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_biased_timestep_sampling():
    s = _sched()
    ts = np.asarray(s.sample_timesteps_biased(jax.random.PRNGKey(0), 4000, 700, 0.8))
    frac_high = (ts >= 700).mean()
    assert 0.75 < frac_high < 0.85  # min_step_prob=0.8 (train_cam_obj_ctrl.py:793-800)
    assert ts.min() >= 0 and ts.max() < 1000

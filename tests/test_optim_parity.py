"""Optimizer-update parity: clip + AdamW trajectory vs torch.optim.AdamW.

Closes the last link of the training-math chain (loss and gradients are
matched elementwise by tests/test_grad_parity.py and
test_trainable_grad_parity.py): the reference steps torch AdamW with
clip_grad_norm (train_cam_ctrl.py:160-168, 647-665); our trainer steps
optax.chain(clip_by_global_norm, adamw).  A multi-step trajectory with
shared synthetic gradients must match elementwise — pinning bias
correction, decoupled weight decay, eps placement, and the conditional
global-norm clip (one step below the clip threshold, the rest above).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from synfmc_tpu.training.optim import make_optimizer

LR, WD, EPS, CLIP = 1e-2, 1e-2, 1e-8, 1.0


def test_adamw_trajectory_matches_torch(rng):
    shapes = {"a": (7, 5), "b": (11,), "c": (3, 4, 2)}
    init = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    # step 3's gradients are tiny: exercises the clip's pass-through branch
    grads_seq = [
        {k: rng.normal(size=s).astype(np.float32) * (1e-3 if step == 3 else 1.0)
         for k, s in shapes.items()}
        for step in range(5)
    ]

    # ---- torch ----
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in init.items()}
    opt = torch.optim.AdamW(tparams.values(), lr=LR, betas=(0.9, 0.999), eps=EPS,
                            weight_decay=WD)
    for g in grads_seq:
        for k, p in tparams.items():
            p.grad = torch.from_numpy(g[k].copy())
        torch.nn.utils.clip_grad_norm_(tparams.values(), CLIP)
        opt.step()
        opt.zero_grad()
    want = {k: p.detach().numpy() for k, p in tparams.items()}

    # ---- optax via the trainer's own factory ----
    tx = make_optimizer(LR, adam_weight_decay=WD, adam_epsilon=EPS, max_grad_norm=CLIP)
    params = jax.tree.map(jnp.asarray, init)
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = tx.update(g, state, params)
        import optax

        return optax.apply_updates(params, updates), state

    for g in grads_seq:
        params, state = step(params, state, jax.tree.map(jnp.asarray, g))

    for k in shapes:
        np.testing.assert_allclose(np.asarray(params[k]), want[k], atol=1e-6, rtol=1e-5,
                                   err_msg=f"param {k}")


def test_adamw_export_resumes_in_torch(rng):
    """Reference-resume interconvert (train_image_lora.py:282-296): run k
    optax steps, export the bundle's optimizer_state_dict, load it into a
    REAL torch.optim.AdamW over the exported weights, then take one more
    step with a shared gradient on both sides — the resulting parameters
    must match elementwise.  Pins the positional param<->state alignment
    (torch_parameter_order), the mu/nu<->exp_avg/exp_avg_sq value mapping,
    the per-param 'step' counter, and the param_group hyperparameters."""
    from synfmc_tpu.config import ConfigDict
    from synfmc_tpu.interop.torch_port import export_torch_state
    from synfmc_tpu.models.unet3d import UNet3D
    from synfmc_tpu.training.params import partition_params, stage1_lora_trainable
    from synfmc_tpu.training.steps import init_train_state
    from synfmc_tpu.training.trainers import _export_optimizer_state
    import optax

    unet = UNet3D(block_out_channels=(32, 32, 32, 32), attn_heads=2,
                  cross_attention_dim=16, use_motion_module=False, lora_rank=2)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 16, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 16)),
    )["params"]
    lora, _ = partition_params(params, stage1_lora_trainable)
    trainable = {"unet": lora}

    tx = make_optimizer(LR, adam_weight_decay=WD, adam_epsilon=EPS, max_grad_norm=CLIP)
    state = init_train_state(trainable, tx)

    def grad_like(tree, salt):
        r = np.random.default_rng(salt)
        return jax.tree.map(lambda x: jnp.asarray(r.normal(size=x.shape), x.dtype), tree)

    @jax.jit
    def step(state, g):
        updates, opt_state = tx.update(g, state.opt_state, state.trainable)
        return state.replace(
            step=state.step + 1,
            trainable=optax.apply_updates(state.trainable, updates),
            opt_state=opt_state,
        )

    for k in range(3):
        state = step(state, grad_like(trainable, k))

    cfg = ConfigDict({"learning_rate": LR, "adam_weight_decay": WD, "adam_epsilon": EPS})
    exported = _export_optimizer_state("lora", state, cfg)
    assert exported is not None
    names = exported["param_names"]
    assert len(names) == len(jax.tree.leaves(lora)) and len(set(names)) == len(names)
    assert all("lora" in n for n in names)

    # ---- torch resume: params + optimizer state from the export ----
    weights = export_torch_state(jax.device_get(state.trainable["unet"]), "unet")
    assert set(weights) == set(names)
    tparams = {n: torch.nn.Parameter(torch.from_numpy(weights[n].copy())) for n in names}
    opt = torch.optim.AdamW(tparams.values(), lr=LR, betas=(0.9, 0.999), eps=EPS,
                            weight_decay=WD)
    opt.load_state_dict({k: v for k, v in exported.items() if k != "param_names"})

    g4 = grad_like(trainable, 99)
    g4_torch = export_torch_state(jax.device_get(g4["unet"]), "unet")
    for n, p in tparams.items():
        p.grad = torch.from_numpy(np.asarray(g4_torch[n]).copy())
    torch.nn.utils.clip_grad_norm_(tparams.values(), CLIP)
    opt.step()

    state = step(state, g4)
    got = export_torch_state(jax.device_get(state.trainable["unet"]), "unet")
    for n in names:
        np.testing.assert_allclose(
            got[n], tparams[n].detach().numpy(), atol=1e-6, rtol=1e-5, err_msg=n
        )

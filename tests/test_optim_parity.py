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

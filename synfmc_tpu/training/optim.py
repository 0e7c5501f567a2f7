"""Optimizer factory: AdamW + global-norm clip + constant/warmup schedule.

Parity with the reference's torch AdamW defaults (train_cam_ctrl.py:160-168:
betas (0.9, 0.999), weight decay 1e-2, eps 1e-8, max_grad_norm 1.0,
lr_scheduler 'constant', warmup 0).  bf16-on-TPU needs no GradScaler — the
reference's fp16 amp machinery (train_cam_ctrl.py:501, 647-655) maps to plain
bf16 compute with fp32 master params/optimizer state.
"""

from __future__ import annotations

import optax


def make_lr_schedule(learning_rate: float, scheduler: str = "constant", warmup_steps: int = 0,
                     total_steps: int = 0):
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        warm = None
    if scheduler == "constant":
        base = optax.constant_schedule(learning_rate)
    elif scheduler == "linear":
        base = optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1))
    elif scheduler == "cosine":
        base = optax.cosine_decay_schedule(learning_rate, max(total_steps - warmup_steps, 1))
    else:
        raise ValueError(f"unknown lr scheduler {scheduler!r}")
    if warm is None:
        return base
    return optax.join_schedules([warm, base], [warmup_steps])


def make_optimizer(
    learning_rate: float,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    max_grad_norm: float = 1.0,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    max_train_steps: int = 0,
    **_unused,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(learning_rate, lr_scheduler, lr_warmup_steps, max_train_steps)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_epsilon,
            weight_decay=adam_weight_decay,
        ),
    )

"""Optimizers + LR schedules (optax), flag-parity with the reference's
diffusers get_scheduler names (training_utils.py:63-73)."""

from __future__ import annotations

import optax


def make_lr_schedule(name: str, lr: float, warmup_steps: int,
                     total_steps: int, num_cycles: int = 1,
                     power: float = 1.0):
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "constant_with_warmup":
        return optax.linear_schedule(0.0, lr, warmup_steps)
    if name == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup_steps)),
        ], [warmup_steps])
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    if name == "cosine_with_restarts":
        per = max(1, (total_steps - warmup_steps) // max(1, num_cycles))
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps)]
            + [optax.cosine_decay_schedule(lr, per)] * num_cycles,
            [warmup_steps + i * per for i in range(num_cycles)])
    if name == "polynomial":
        return optax.join_schedules([
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.polynomial_schedule(lr, 0.0, power,
                                      max(1, total_steps - warmup_steps)),
        ], [warmup_steps])
    raise ValueError(f"unknown lr scheduler {name!r}")


def make_adamw(schedule, beta1=0.9, beta2=0.999, eps=1e-8,
               weight_decay=1e-2, max_grad_norm: float = 1.0):
    """AdamW + global-norm clipping (reference uses torch AdamW with
    accelerator.clip_grad_norm_, train_pix2pix_turbo.py:98-105,190-192)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=beta1, b2=beta2, eps=eps,
                    weight_decay=weight_decay),
    )

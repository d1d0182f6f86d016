"""One-step DDPM scheduler, fused into the generator graph.

The reference builds a full diffusers DDPMScheduler and calls
`set_timesteps(1)` so the only timestep is 999 (/root/reference/src/model.py:7-11);
`sched.step(eps, 999, x)` then reduces to the closed-form x0-prediction
    x0 = (x_t - sqrt(1 - abar_t) * eps) / sqrt(abar_t)
(with alpha_bar_prev == 1 and zero variance at the final step). Here that is
a pure function over a precomputed alphas_cumprod table; it vmaps over the
batch trivially — no per-sample Python loop (the reference loops per sample
at cyclegan_turbo.py:205).

SD-Turbo scheduler config: scaled_linear betas, beta_start=0.00085,
beta_end=0.012, 1000 train timesteps, epsilon prediction.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"


SD_TURBO_SCHED = SchedulerConfig()
ONE_STEP_T = 999


def make_alphas_cumprod(cfg: SchedulerConfig = SD_TURBO_SCHED) -> jnp.ndarray:
    """(num_train_timesteps,) float32 cumulative alpha products."""
    if cfg.beta_schedule == "scaled_linear":
        betas = jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                             cfg.num_train_timesteps,
                             dtype=jnp.float32) ** 2
    elif cfg.beta_schedule == "linear":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end,
                             cfg.num_train_timesteps, dtype=jnp.float32)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule}")
    return jnp.cumprod(1.0 - betas)


def ddpm_x0_step(eps, sample, timesteps, alphas_cumprod):
    """Closed-form final DDPM step (epsilon prediction, alpha_bar_prev = 1).

    eps, sample: (B, ...) arrays; timesteps: (B,) ints. Computed in fp32 and
    cast back, matching the reference's
    `x_denoised.to(model_pred.dtype)` (pix2pix_turbo.py:200-201).
    """
    abar = alphas_cumprod[timesteps].astype(jnp.float32)
    while abar.ndim < sample.ndim:
        abar = abar[..., None]
    x0 = (sample.astype(jnp.float32)
          - jnp.sqrt(1.0 - abar) * eps.astype(jnp.float32)) / jnp.sqrt(abar)
    return x0.astype(eps.dtype)

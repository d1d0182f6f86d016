"""Training losses: reconstruction, LPIPS, CLIP-similarity, GAN.

Loss weights and call pattern mirror the reference paired loop
(train_pix2pix_turbo.py:175-224: l2*λ_l2 + lpips*λ_lpips + clipsim*λ_clipsim,
then GAN passes scaled by λ_gan) and unpaired loop
(train_cyclegan_turbo.py:181-256: cycle L1+LPIPS, identity L1+LPIPS, GAN).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import clip_vit, discriminator as disc_mod
from img2img_turbo_tpu.models import vgg_lpips


@dataclasses.dataclass(frozen=True)
class PairedLossConfig:
    lambda_gan: float = 0.5
    lambda_lpips: float = 5.0
    lambda_l2: float = 1.0
    lambda_clipsim: float = 5.0
    gan_loss_type: str = "multilevel_sigmoid_s"


@dataclasses.dataclass(frozen=True)
class UnpairedLossConfig:
    lambda_gan: float = 0.5
    lambda_idt: float = 1.0
    lambda_cycle: float = 1.0
    lambda_cycle_lpips: float = 10.0
    lambda_idt_lpips: float = 1.0
    gan_loss_type: str = "multilevel_sigmoid"


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def lpips_loss(lpips_params, pred, target):
    return jnp.mean(vgg_lpips.lpips(lpips_params, pred, target))


def clipsim_loss(clip_params, clip_cfg: clip_vit.CLIPViTConfig, pred,
                 input_ids):
    """1 - clipsim/100 on bilinear-224 renormed images
    (train_pix2pix_turbo.py:181-187)."""
    # torch F.interpolate(bilinear, align_corners=False) does NOT antialias;
    # exact-parity separable matmul resize (reference
    # train_pix2pix_turbo.py:183)
    from img2img_turbo_tpu.ops.image import resize_torch
    x = resize_torch(pred, clip_cfg.image_size, clip_cfg.image_size,
                     "bilinear")
    sim = clip_vit.clip_similarity(clip_params, clip_cfg, x, input_ids)
    return jnp.mean(1.0 - sim / 100.0)


def gan_gen_loss(disc_params, clip_cfg, fake, cfg_smooth: bool):
    return disc_mod.disc_loss(disc_params, clip_cfg, fake, for_G=True,
                              smooth=cfg_smooth)


def gan_disc_real_loss(disc_params, clip_cfg, real, cfg_smooth: bool):
    return disc_mod.disc_loss(disc_params, clip_cfg, real, for_real=True,
                              smooth=cfg_smooth)


def gan_disc_fake_loss(disc_params, clip_cfg, fake, cfg_smooth: bool):
    return disc_mod.disc_loss(disc_params, clip_cfg,
                              jax.lax.stop_gradient(fake), for_real=False,
                              smooth=cfg_smooth)

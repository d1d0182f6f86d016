"""Paired (pix2pix-turbo) training: 4-pass adversarial step + loop.

Step semantics mirror the reference exactly
(train_pix2pix_turbo.py:168-225) — four sequential optimize passes per
iteration, each its own forward/grad/update:
  1. generator: L2*λ_l2 + LPIPS*λ_lpips (+ CLIP-sim*λ_clipsim) -> AdamW step
  2. generator: SECOND full forward -> GAN-G loss * λ_gan -> AdamW step
  3. discriminator: real loss * λ_gan -> step
  4. discriminator: fake loss (pred detached) * λ_gan -> step
— but fused into ONE jitted program (donated state). DP comes from sharding
the batch over the mesh's data axis; XLA inserts the gradient psums.

Trainable generator subtree (reference set_train, pix2pix_turbo.py:176-184):
UNet LoRA + conv_in (full), VAE LoRA + 4 skip convs. Everything else frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from img2img_turbo_tpu import lora as lora_mod, scheduler
from img2img_turbo_tpu.models import (clip_text, clip_vit,
                                      discriminator as disc_mod)
from img2img_turbo_tpu.pipelines.pix2pix import (GeneratorConfigs,
                                                 generate_deterministic)
from img2img_turbo_tpu.training import accum as accum_mod
from img2img_turbo_tpu.training import losses as losses_mod


@dataclasses.dataclass(frozen=True)
class LoraMeta:
    rank_unet: int = 8
    alpha_unet: float = 8.0
    rank_vae: int = 4
    alpha_vae: float = 8.0


def split_trainable(unet_base, vae_base, unet_lora, vae_lora
                    ) -> Tuple[Dict, Dict, LoraMeta]:
    """-> (trainable gen subtree, frozen tree, lora meta)."""
    gen = {
        "unet_lora": unet_lora["modules"],
        "vae_lora": vae_lora["modules"],
        "conv_in": unet_base["conv_in"],
        "skip_convs": vae_base["decoder"]["skip_convs"],
    }
    # frozen must NOT alias trainable buffers: the train step donates the
    # state, which would delete shared leaves out from under frozen
    frozen_unet = dict(unet_base)
    frozen_unet.pop("conv_in")
    frozen_vae = dict(vae_base)
    frozen_vae["decoder"] = dict(vae_base["decoder"])
    frozen_vae["decoder"].pop("skip_convs")
    frozen = {"unet": frozen_unet, "vae": frozen_vae}
    meta = LoraMeta(unet_lora["rank"], unet_lora["alpha"],
                    vae_lora["rank"], vae_lora["alpha"])
    return gen, frozen, meta


def build_gen_params(gen, frozen, meta: LoraMeta) -> Dict:
    """Reassemble dense generator params from trainable + frozen pieces.
    Runs inside jit; XLA fuses the LoRA merges into the weight loads."""
    unet_base = dict(frozen["unet"])
    unet_base["conv_in"] = gen["conv_in"]
    vae_base = dict(frozen["vae"])
    vae_base["decoder"] = dict(vae_base["decoder"])
    vae_base["decoder"]["skip_convs"] = gen["skip_convs"]
    unet_p = lora_mod.merge_lora(
        unet_base, {"rank": meta.rank_unet, "alpha": meta.alpha_unet,
                    "modules": gen["unet_lora"]}, model="unet")
    vae_p = lora_mod.merge_lora(
        vae_base, {"rank": meta.rank_vae, "alpha": meta.alpha_vae,
                   "modules": gen["vae_lora"]}, model="vae")
    return {"unet": unet_p, "vae": vae_p}


def make_paired_train_step(cfgs: GeneratorConfigs,
                           clip_cfg: clip_vit.CLIPViTConfig,
                           loss_cfg: losses_mod.PairedLossConfig,
                           meta: LoraMeta, gen_tx, disc_tx,
                           remat: bool = True, accum_steps: int = 1,
                           axis_name=None):
    """accum_steps > 1 runs each optimize pass as a lax.scan over k
    micro-batches at constant activation memory (accelerator.accumulate
    equivalent, train_pix2pix_turbo.py:170); the batch dim must be divisible
    by accum_steps. accum_steps == 1 is the direct fast path.

    axis_name: set to the mesh's data axis when the step runs under
    `mesh.dp_shard_map` — losses and gradients are pmean'd across shards
    before every optimizer update, so the returned state is replicated
    (the DDP allreduce, emitted inside the step)."""
    alphas = scheduler.make_alphas_cumprod()
    smooth = loss_cfg.gan_loss_type.endswith("_s")

    def gen_forward(gen, frozen, c_t, caption_enc, rng):
        params = build_gen_params(gen, frozen, meta)
        return generate_deterministic(params, cfgs, alphas, c_t, caption_enc,
                                      rng, remat=remat)

    def vgrad(loss_fn, params, data, rng):
        """Uniform (loss, aux-with-leading-k-axis), grads — direct when
        accum_steps == 1, scanned otherwise. Under DP (axis_name set) the
        loss/aux/grads are pmean'd over the data axis here — the single
        chokepoint every optimize pass goes through."""
        if accum_steps == 1:
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, data, rng)
            aux = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x)[None], aux)
        else:
            (loss, aux), g = accum_mod.accumulated_value_and_grad(
                loss_fn, params, data, rng, accum_steps)
        if axis_name is not None:
            # the DDP allreduce: grads averaged across shards. Scalar aux
            # (per-pass loss metrics, (k,)-shaped after the micro-batch
            # stack) rides along so logging is global; batch-leading aux
            # (e.g. pass 2's generated images, consumed by the local
            # discriminator pass) stays per-shard.
            loss, g = jax.lax.pmean((loss, g), axis_name)
            aux = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name) if x.ndim <= 1 else x,
                aux)
        return (loss, aux), g

    def train_step(state, frozen, aux_frozen, batch, rng):
        """state: {gen, gen_opt, disc, disc_sn, disc_opt, step};
        frozen: {unet, vae}; aux_frozen: {text, lpips, clip, disc_backbone};
        batch: conditioning [0,1], output [-1,1], input_ids (B,77).
        disc_sn carries the spectral-norm power-iteration vectors (torch
        buffers equivalent): advanced once per discriminator forward,
        never optimized."""
        c_t = batch["conditioning_pixel_values"]
        x_tgt = batch["output_pixel_values"]
        ids = batch["input_ids"]
        caption_enc = clip_text.clip_text_forward(
            aux_frozen["text"], cfgs.text, ids).astype(c_t.dtype)
        r1, r2 = jax.random.split(rng)
        metrics = {}
        data = {"c_t": c_t, "x_tgt": x_tgt, "ids": ids,
                "caption_enc": caption_enc}

        # ---- pass 1: reconstruction ------------------------------------
        def recon_loss(gen, mb, key):
            pred = gen_forward(gen, frozen, mb["c_t"], mb["caption_enc"],
                               key)
            l2 = loss_cfg.lambda_l2 * losses_mod.l2_loss(pred, mb["x_tgt"])
            lp = loss_cfg.lambda_lpips * losses_mod.lpips_loss(
                aux_frozen["lpips"], pred, mb["x_tgt"])
            total = l2 + lp
            parts = {"loss_l2": l2, "loss_lpips": lp}
            if loss_cfg.lambda_clipsim > 0 and "clip" in aux_frozen:
                cs = loss_cfg.lambda_clipsim * losses_mod.clipsim_loss(
                    aux_frozen["clip"], clip_cfg, pred, mb["ids"])
                total = total + cs
                parts["loss_clipsim"] = cs
            return total, parts

        (loss1, parts), grads = vgrad(recon_loss, state["gen"], data, r1)
        updates, gen_opt = gen_tx.update(grads, state["gen_opt"],
                                         state["gen"])
        gen = optax.apply_updates(state["gen"], updates)
        metrics.update({k: v.mean(0) for k, v in parts.items()})

        # ---- pass 2: generator GAN (fresh forward, updated gen) --------
        sn = state["disc_sn"]

        def gan_g_loss(gen, mb, key):
            pred = gen_forward(gen, frozen, mb["c_t"], mb["caption_enc"],
                               key)
            disc_params = {"backbone": aux_frozen["disc_backbone"],
                           "heads": state["disc"], "sn": sn}
            g = loss_cfg.lambda_gan * losses_mod.gan_gen_loss(
                disc_params, clip_cfg, pred, smooth)
            return g, pred

        (loss_g, pred2), grads = vgrad(gan_g_loss, gen, data, r2)
        pred2 = accum_mod.merge_micro(pred2)
        updates, gen_opt = gen_tx.update(grads, gen_opt, gen)
        gen = optax.apply_updates(gen, updates)
        metrics["loss_gan_g"] = loss_g
        sn = disc_mod.sn_step(state["disc"], sn)

        # ---- pass 3: discriminator real ---------------------------------
        def d_real(heads, mb, key):
            disc_params = {"backbone": aux_frozen["disc_backbone"],
                           "heads": heads, "sn": sn}
            loss = loss_cfg.lambda_gan * losses_mod.gan_disc_real_loss(
                disc_params, clip_cfg, mb["x_tgt"], smooth)
            return loss, ()

        (loss_dr, _), grads = vgrad(d_real, state["disc"],
                                    {"x_tgt": x_tgt}, rng)
        updates, disc_opt = disc_tx.update(grads, state["disc_opt"],
                                           state["disc"])
        sn = disc_mod.sn_step(state["disc"], sn)
        disc = optax.apply_updates(state["disc"], updates)
        metrics["loss_d_real"] = loss_dr

        # ---- pass 4: discriminator fake ---------------------------------
        def d_fake(heads, mb, key):
            disc_params = {"backbone": aux_frozen["disc_backbone"],
                           "heads": heads, "sn": sn}
            loss = loss_cfg.lambda_gan * losses_mod.gan_disc_fake_loss(
                disc_params, clip_cfg, mb["pred"], smooth)
            return loss, ()

        (loss_df, _), grads = vgrad(
            d_fake, disc, {"pred": jax.lax.stop_gradient(pred2)}, rng)
        updates, disc_opt = disc_tx.update(grads, disc_opt, disc)
        sn = disc_mod.sn_step(disc, sn)
        disc = optax.apply_updates(disc, updates)
        metrics["loss_d_fake"] = loss_df

        new_state = {"gen": gen, "gen_opt": gen_opt, "disc": disc,
                     "disc_sn": sn, "disc_opt": disc_opt,
                     "step": state["step"] + 1}
        return new_state, metrics

    return train_step


def make_eval_step(cfgs: GeneratorConfigs, clip_cfg, meta: LoraMeta):
    """Validation metrics: L2, LPIPS, CLIP-sim (reference
    train_pix2pix_turbo.py:259-301)."""
    alphas = scheduler.make_alphas_cumprod()

    @jax.jit
    def eval_step(gen, frozen, aux_frozen, batch, rng):
        params = build_gen_params(gen, frozen, meta)
        c_t = batch["conditioning_pixel_values"]
        x_tgt = batch["output_pixel_values"]
        ids = batch["input_ids"]
        caption_enc = clip_text.clip_text_forward(
            aux_frozen["text"], cfgs.text, ids).astype(c_t.dtype)
        pred = generate_deterministic(params, cfgs, alphas, c_t, caption_enc,
                                      rng)
        out = {
            "val_l2": losses_mod.l2_loss(pred, x_tgt),
            "val_lpips": losses_mod.lpips_loss(aux_frozen["lpips"], pred,
                                               x_tgt),
        }
        if "clip" in aux_frozen:
            out["val_clipsim"] = 1.0 - losses_mod.clipsim_loss(
                aux_frozen["clip"], clip_cfg, pred, ids)
        return pred, out

    return eval_step

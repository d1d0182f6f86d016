"""Unpaired (CycleGAN-Turbo) training: 6-objective adversarial step.

Mirrors the reference loop (train_cyclegan_turbo.py:165-256) exactly —
per iteration:
  1. cycle:    a->fake_b->rec_a, b->fake_a->rec_b;
               L1*λ_cycle + LPIPS*λ_cycle_lpips  -> gen AdamW step
  2. GAN-G:    fresh fake_a/fake_b; disc_a(fake_b) + disc_b(fake_a),
               each *λ_gan                        -> gen step
  3. identity: b through a2b vs b, a through b2a vs a;
               L1*λ_idt + LPIPS*λ_idt_lpips      -> gen step
  4. disc fake: (disc_a(fake_b.detach) + disc_b(fake_a.detach))*λ_gan*0.5
                                                  -> disc step
  5. disc real: (disc_a(img_b) + disc_b(img_a))*λ_gan*0.5 -> disc step
(naming as in the reference: disc_a judges domain-B images. The text
encoder never runs in the loop — fixed caption embeddings are precomputed,
train_cyclegan_turbo.py:140-144.)

All objectives fuse into ONE jitted program; 8 generator forwards per step
(4 with grads through a 2-hop cycle) run under remat.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from img2img_turbo_tpu import lora as lora_mod, scheduler
from img2img_turbo_tpu.models import clip_vit, discriminator as disc_mod
from img2img_turbo_tpu.pipelines.cyclegan import forward_with_params
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
from img2img_turbo_tpu.training import accum as accum_mod
from img2img_turbo_tpu.training import losses as losses_mod


@dataclasses.dataclass(frozen=True)
class CycleLoraMeta:
    rank_unet: int = 128
    rank_vae: int = 4
    alpha_vae: float = 8.0  # peft default; unet adapters use alpha=rank


def split_trainable(unet_base, vae_a2b, vae_b2a, unet_adapters: Dict,
                    vae_a2b_lora, vae_b2a_lora
                    ) -> Tuple[Dict, Dict, CycleLoraMeta]:
    """-> (trainable gen subtree, frozen tree, meta). Trainable set matches
    reference get_traininable_params (cyclegan_turbo.py:210-236): conv_in,
    3 unet adapters, both VAEs' LoRA + skip convs."""
    gen = {
        "unet_lora": {k: v["modules"] for k, v in unet_adapters.items()},
        "conv_in": unet_base["conv_in"],
        "vae_a2b_lora": vae_a2b_lora["modules"],
        "vae_a2b_skip": vae_a2b["decoder"]["skip_convs"],
        "vae_b2a_lora": vae_b2a_lora["modules"],
        "vae_b2a_skip": vae_b2a["decoder"]["skip_convs"],
    }
    # frozen must NOT alias trainable buffers (the step donates the state)
    frozen_unet = dict(unet_base)
    frozen_unet.pop("conv_in")

    def strip_vae(v):
        v = dict(v)
        v["decoder"] = dict(v["decoder"])
        v["decoder"].pop("skip_convs")
        return v

    frozen = {"unet": frozen_unet, "vae_a2b": strip_vae(vae_a2b),
              "vae_b2a": strip_vae(vae_b2a)}
    meta = CycleLoraMeta(
        rank_unet=next(iter(unet_adapters.values()))["rank"],
        rank_vae=vae_a2b_lora["rank"], alpha_vae=vae_a2b_lora["alpha"])
    return gen, frozen, meta


def build_gen_params(gen, frozen, meta: CycleLoraMeta) -> Dict:
    unet_base = dict(frozen["unet"])
    unet_base["conv_in"] = gen["conv_in"]
    unet_p = unet_base
    for modules in gen["unet_lora"].values():
        unet_p = lora_mod.merge_lora(
            unet_p, {"rank": meta.rank_unet, "alpha": float(meta.rank_unet),
                     "modules": modules}, model="unet")
    out = {"unet": unet_p}
    for name in ("vae_a2b", "vae_b2a"):
        vae_base = dict(frozen[name])
        vae_base["decoder"] = dict(vae_base["decoder"])
        vae_base["decoder"]["skip_convs"] = gen[f"{name}_skip"]
        out[name] = lora_mod.merge_lora(
            vae_base, {"rank": meta.rank_vae, "alpha": meta.alpha_vae,
                       "modules": gen[f"{name}_lora"]}, model="vae")
    return out


def make_unpaired_train_step(cfgs: GeneratorConfigs,
                             clip_cfg: clip_vit.CLIPViTConfig,
                             loss_cfg: losses_mod.UnpairedLossConfig,
                             meta: CycleLoraMeta, gen_tx, disc_tx,
                             remat: bool = True, accum_steps: int = 1,
                             axis_name=None):
    """accum_steps > 1 scans each objective over k micro-batches at constant
    activation memory (accelerator.accumulate equivalent,
    train_cyclegan_turbo.py:168); batch dim must divide by accum_steps.

    axis_name: the mesh data axis when running under `mesh.dp_shard_map` —
    losses/grads are pmean'd across shards before each optimizer update
    (see training/paired.py)."""
    alphas = scheduler.make_alphas_cumprod()
    smooth = loss_cfg.gan_loss_type.endswith("_s")

    def fwd(gen, frozen, x, emb, rng, direction):
        params = build_gen_params(gen, frozen, meta)
        return forward_with_params(params, cfgs, alphas, x, emb, rng,
                                   direction, remat=remat)

    def vgrad(loss_fn, params, data, rng):
        if accum_steps == 1:
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, data, rng)
            aux = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x)[None], aux)
        else:
            (loss, aux), g = accum_mod.accumulated_value_and_grad(
                loss_fn, params, data, rng, accum_steps)
        if axis_name is not None:
            # DDP allreduce: grads + scalar loss metrics averaged across
            # shards; batch-leading aux (fake images fed to the local
            # discriminator passes) stays per-shard
            loss, g = jax.lax.pmean((loss, g), axis_name)
            aux = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name) if x.ndim <= 1 else x,
                aux)
        return (loss, aux), g

    def train_step(state, frozen, aux_frozen, batch, rng):
        """state: {gen, gen_opt, disc: {a, b}, disc_sn: {a, b}, disc_opt,
        step}; aux_frozen: {lpips, disc_backbone};
        batch: pixel_values_src/tgt in [-1,1] + emb_a2b / emb_b2a
        (B, 77, D) fixed caption embeddings."""
        img_a = batch["pixel_values_src"]
        img_b = batch["pixel_values_tgt"]
        rngs = jax.random.split(rng, 8)
        metrics = {}
        lp = aux_frozen["lpips"]
        data = {"img_a": img_a, "img_b": img_b,
                "emb_a2b": batch["emb_a2b"], "emb_b2a": batch["emb_b2a"]}

        sn = state["disc_sn"]

        def disc_params(heads, u):
            return {"backbone": aux_frozen["disc_backbone"], "heads": heads,
                    "sn": u}

        def sn_advance(disc_heads, u):
            return {k: disc_mod.sn_step(disc_heads[k], u[k]) for k in u}

        # ---- 1. cycle ----------------------------------------------------
        def cycle_loss(gen, mb, key):
            k0, k1, k2, k3 = jax.random.split(key, 4)
            fake_b = fwd(gen, frozen, mb["img_a"], mb["emb_a2b"], k0, "a2b")
            rec_a = fwd(gen, frozen, fake_b, mb["emb_b2a"], k1, "b2a")
            la = (loss_cfg.lambda_cycle
                  * losses_mod.l1_loss(rec_a, mb["img_a"])
                  + loss_cfg.lambda_cycle_lpips
                  * losses_mod.lpips_loss(lp, rec_a, mb["img_a"]))
            fake_a = fwd(gen, frozen, mb["img_b"], mb["emb_b2a"], k2, "b2a")
            rec_b = fwd(gen, frozen, fake_a, mb["emb_a2b"], k3, "a2b")
            lb = (loss_cfg.lambda_cycle
                  * losses_mod.l1_loss(rec_b, mb["img_b"])
                  + loss_cfg.lambda_cycle_lpips
                  * losses_mod.lpips_loss(lp, rec_b, mb["img_b"]))
            return la + lb, (la, lb)

        (loss_c, (la, lb)), grads = vgrad(cycle_loss, state["gen"], data,
                                          rngs[0])
        updates, gen_opt = gen_tx.update(grads, state["gen_opt"],
                                         state["gen"])
        gen = optax.apply_updates(state["gen"], updates)
        metrics["cycle_a"], metrics["cycle_b"] = la.mean(0), lb.mean(0)

        # ---- 2. generator GAN -------------------------------------------
        def gan_loss(gen, mb, key):
            k4, k5 = jax.random.split(key)
            fake_a = fwd(gen, frozen, mb["img_b"], mb["emb_b2a"], k4, "b2a")
            fake_b = fwd(gen, frozen, mb["img_a"], mb["emb_a2b"], k5, "a2b")
            ga = loss_cfg.lambda_gan * losses_mod.gan_gen_loss(
                disc_params(state["disc"]["a"], sn["a"]), clip_cfg, fake_b,
                smooth)
            gb = loss_cfg.lambda_gan * losses_mod.gan_gen_loss(
                disc_params(state["disc"]["b"], sn["b"]), clip_cfg, fake_a,
                smooth)
            return ga + gb, (fake_a, fake_b, ga, gb)

        (loss_g, (fake_a, fake_b, ga, gb)), grads = vgrad(
            gan_loss, gen, data, rngs[1])
        fake_a = accum_mod.merge_micro(fake_a)
        fake_b = accum_mod.merge_micro(fake_b)
        updates, gen_opt = gen_tx.update(grads, gen_opt, gen)
        gen = optax.apply_updates(gen, updates)
        metrics["gan_a"], metrics["gan_b"] = ga.mean(0), gb.mean(0)
        sn = sn_advance(state["disc"], sn)

        # ---- 3. identity -------------------------------------------------
        def idt_loss(gen, mb, key):
            k6, k7 = jax.random.split(key)
            idt_a = fwd(gen, frozen, mb["img_b"], mb["emb_a2b"], k6, "a2b")
            li_a = (loss_cfg.lambda_idt
                    * losses_mod.l1_loss(idt_a, mb["img_b"])
                    + loss_cfg.lambda_idt_lpips
                    * losses_mod.lpips_loss(lp, idt_a, mb["img_b"]))
            idt_b = fwd(gen, frozen, mb["img_a"], mb["emb_b2a"], k7, "b2a")
            li_b = (loss_cfg.lambda_idt
                    * losses_mod.l1_loss(idt_b, mb["img_a"])
                    + loss_cfg.lambda_idt_lpips
                    * losses_mod.lpips_loss(lp, idt_b, mb["img_a"]))
            return li_a + li_b, (li_a, li_b)

        (loss_i, (li_a, li_b)), grads = vgrad(idt_loss, gen, data, rngs[2])
        updates, gen_opt = gen_tx.update(grads, gen_opt, gen)
        gen = optax.apply_updates(gen, updates)
        metrics["idt_a"], metrics["idt_b"] = li_a.mean(0), li_b.mean(0)

        # ---- 4. discriminator fake --------------------------------------
        fakes = {"fake_a": jax.lax.stop_gradient(fake_a),
                 "fake_b": jax.lax.stop_gradient(fake_b)}

        def d_fake(heads, mb, key):
            da = loss_cfg.lambda_gan * losses_mod.gan_disc_fake_loss(
                disc_params(heads["a"], sn["a"]), clip_cfg, mb["fake_b"],
                smooth)
            db = loss_cfg.lambda_gan * losses_mod.gan_disc_fake_loss(
                disc_params(heads["b"], sn["b"]), clip_cfg, mb["fake_a"],
                smooth)
            return (da + db) * 0.5, ()

        (loss_df, _), grads = vgrad(d_fake, state["disc"], fakes, rngs[3])
        updates, disc_opt = disc_tx.update(grads, state["disc_opt"],
                                           state["disc"])
        sn = sn_advance(state["disc"], sn)
        disc = optax.apply_updates(state["disc"], updates)
        metrics["disc_fake"] = loss_df

        # ---- 5. discriminator real --------------------------------------
        def d_real(heads, mb, key):
            da = loss_cfg.lambda_gan * losses_mod.gan_disc_real_loss(
                disc_params(heads["a"], sn["a"]), clip_cfg, mb["img_b"],
                smooth)
            db = loss_cfg.lambda_gan * losses_mod.gan_disc_real_loss(
                disc_params(heads["b"], sn["b"]), clip_cfg, mb["img_a"],
                smooth)
            return (da + db) * 0.5, ()

        (loss_dr, _), grads = vgrad(
            d_real, disc, {"img_a": img_a, "img_b": img_b}, rngs[4])
        updates, disc_opt = disc_tx.update(grads, disc_opt, disc)
        sn = sn_advance(disc, sn)
        disc = optax.apply_updates(disc, updates)
        metrics["disc_real"] = loss_dr

        new_state = {"gen": gen, "gen_opt": gen_opt, "disc": disc,
                     "disc_sn": sn, "disc_opt": disc_opt,
                     "step": state["step"] + 1}
        return new_state, metrics

    return train_step

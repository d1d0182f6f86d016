"""Pix2Pix-Turbo: one-step paired image translation (edge/sketch -> image).

Equivalent of the reference's `Pix2Pix_Turbo` (src/pix2pix_turbo.py:29-229),
redesigned as explicit functional dataflow: the whole generator — VAE encode
(posterior sample) -> UNet at t=999 -> closed-form denoise -> skip-fused VAE
decode — jits into ONE XLA program. No module state: skip activations flow
as values, LoRA scale r and skip gamma are traced scalars, PRNG keys are
explicit.

Two compiled paths (reference forward, pix2pix_turbo.py:186-219):
- deterministic: LoRA pre-merged into dense weights (fastest serving path)
- stochastic: factored LoRA merged inside jit with traced scale r, TwinConv
  input blend, noise_map interpolation, decoder gamma=r. One program serves
  every (r, seed).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs, lora as lora_mod, scheduler
from img2img_turbo_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.models.tokenizer import CLIPTokenizer


class GeneratorConfigs:
    def __init__(self, unet=configs.SD_TURBO_UNET, vae=configs.SD_TURBO_VAE,
                 text=configs.SD_TURBO_TEXT):
        self.unet, self.vae, self.text = unet, vae, text


# ---------------------------------------------------------------------------
# Functional generator cores (reused by training loops)
# ---------------------------------------------------------------------------


def generate_deterministic(params: Dict, cfgs: GeneratorConfigs,
                           alphas_cumprod, c_t, caption_enc, rng,
                           remat: bool = False):
    """params: {"unet", "vae"} dense (LoRA-merged) weights.
    c_t: (B, H, W, 3) in [0,1] (edge map) or [-1,1] per dataset convention.
    caption_enc: (B, 77, cross_dim). Returns (B, H, W, 3) in [-1, 1].
    Mirrors reference pix2pix_turbo.py:197-203."""
    s = cfgs.vae.scaling_factor
    z, skips = vae_mod.encode(params["vae"], cfgs.vae, c_t, rng)
    z = z * s
    t = jnp.full((c_t.shape[0],), scheduler.ONE_STEP_T, jnp.int32)
    eps = unet_mod.unet_forward(params["unet"], cfgs.unet, z, t, caption_enc,
                                remat=remat)
    x0 = scheduler.ddpm_x0_step(eps, z, t, alphas_cumprod)
    img = vae_mod.decode(params["vae"], cfgs.vae, x0 / s, skips, gamma=1.0)
    return jnp.clip(img, -1.0, 1.0)


def generate_stochastic(base: Dict, lora: Dict, cfgs: GeneratorConfigs,
                        alphas_cumprod, c_t, caption_enc, rng, r, noise_map,
                        remat: bool = False):
    """Stochastic sketch path (reference pix2pix_turbo.py:204-218).

    base: {"unet", "vae"} with a TwinConv conv_in on the unet;
    lora: {"unet", "vae"} factored adapters; r: traced scalar in [0, 1];
    noise_map: (B, H/8, W/8, 4)."""
    unet_p = lora_mod.merge_lora(base["unet"], lora["unet"], scale=r,
                                 model="unet")
    vae_p = lora_mod.merge_lora(base["vae"], lora["vae"], scale=r,
                                model="vae")
    s = cfgs.vae.scaling_factor
    z, skips = vae_mod.encode(vae_p, cfgs.vae, c_t, rng)
    z = z * s
    r_ = jnp.asarray(r, z.dtype)
    unet_in = z * r_ + noise_map.astype(z.dtype) * (1.0 - r_)
    t = jnp.full((c_t.shape[0],), scheduler.ONE_STEP_T, jnp.int32)
    eps = unet_mod.unet_forward(unet_p, cfgs.unet, unet_in, t, caption_enc,
                                r=r, remat=remat)
    x0 = scheduler.ddpm_x0_step(eps, unet_in, t, alphas_cumprod)
    img = vae_mod.decode(vae_p, cfgs.vae, x0 / s, skips, gamma=r)
    return jnp.clip(img, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


class Pix2PixTurbo:
    """User-facing pipeline with lazy per-shape jit caching.

    Init modes (mirroring reference pix2pix_turbo.py:47-155):
    - `from_pretrained(sd_turbo_dir, ckpt_path, stochastic=...)`: HF
      safetensors base + reference pkl LoRA checkpoint.
    - `from_random(key, cfgs, lora_rank_unet, lora_rank_vae)`: training init
      (zero-conv skips at 1e-5, gaussian LoRA).
    """

    def __init__(self, cfgs: Optional[GeneratorConfigs] = None,
                 params: Optional[Dict] = None,
                 base: Optional[Dict] = None,
                 lora: Optional[Dict] = None,
                 text_params=None, tokenizer: Optional[CLIPTokenizer] = None,
                 dtype=jnp.float32):
        self.cfgs = cfgs or GeneratorConfigs()
        self.alphas_cumprod = scheduler.make_alphas_cumprod()
        self.params = params          # merged/serving weights
        self.base = base              # unmerged base (stochastic path)
        self.lora = lora              # factored adapters (stochastic path)
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._prompt_cache: Dict[str, jax.Array] = {}
        self._det = jax.jit(functools.partial(
            generate_deterministic, cfgs=self.cfgs,
            alphas_cumprod=self.alphas_cumprod),
            static_argnames=("remat",))
        self._sto = jax.jit(functools.partial(
            generate_stochastic, cfgs=self.cfgs,
            alphas_cumprod=self.alphas_cumprod),
            static_argnames=("remat",))

    # -- construction ------------------------------------------------------

    @classmethod
    def from_random(cls, key, cfgs: Optional[GeneratorConfigs] = None,
                    lora_rank_unet: int = 8, lora_rank_vae: int = 4,
                    dtype=jnp.float32):
        """Random init for training (reference pix2pix_turbo.py:131-155)."""
        cfgs = cfgs or GeneratorConfigs()
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        unet_p = unet_mod.init_unet(k1, cfgs.unet)
        vae_p = vae_mod.init_vae(k2, cfgs.vae, with_skip_convs=True,
                                 skip_init=1e-5)
        lora = {
            "unet": lora_mod.init_lora(
                k3, unet_p,
                lora_mod.LoRASpec(lora_rank_unet,
                                  lora_mod.PIX2PIX_UNET_TARGETS), "unet"),
            "vae": lora_mod.init_lora(
                k4, vae_p,
                lora_mod.LoRASpec(lora_rank_vae,
                                  lora_mod.PIX2PIX_VAE_TARGETS), "vae"),
        }
        text_p = clip_text.init_clip_text(k5, cfgs.text)
        base = {"unet": unet_p, "vae": vae_p}
        return cls(cfgs=cfgs, params=None, base=base, lora=lora,
                   text_params=text_p, dtype=dtype)

    @classmethod
    def from_pretrained(cls, sd_turbo_dir: str, ckpt_path: Optional[str],
                        stochastic: bool = False,
                        cfgs: Optional[GeneratorConfigs] = None,
                        dtype=jnp.bfloat16, ckpt_folder: str = "checkpoints"):
        """Load HF sd-turbo safetensors + an img2img-turbo pkl checkpoint
        (schema: reference pix2pix_turbo.py:221-229).

        ckpt_path may also be a published model name ("edge_to_image" /
        "sketch_to_image_stochastic"), resolved/downloaded like the
        reference's pretrained_name mode (pix2pix_turbo.py:47-99).
        For the deterministic models (edge_to_image) LoRA is merged into
        dense weights; for stochastic (sketch) it stays factored with a
        TwinConv conv_in."""
        import os
        from img2img_turbo_tpu.utils.download import MODEL_FILES, get_checkpoint
        from img2img_turbo_tpu.weights import torch_import as ti

        if ckpt_path in MODEL_FILES:
            stochastic = stochastic or ckpt_path == "sketch_to_image_stochastic"
            ckpt_path = get_checkpoint(ckpt_path, ckpt_folder)

        cfgs = cfgs or GeneratorConfigs()
        unet_sd = ti.load_safetensors(os.path.join(
            sd_turbo_dir, "unet", "diffusion_pytorch_model.safetensors"))
        vae_sd = ti.load_safetensors(os.path.join(
            sd_turbo_dir, "vae", "diffusion_pytorch_model.safetensors"))
        text_sd = ti.load_safetensors(os.path.join(
            sd_turbo_dir, "text_encoder", "model.safetensors"))
        unet_p = ti.convert_unet_state_dict(unet_sd, cfgs.unet)
        vae_p = ti.convert_vae_state_dict(vae_sd, cfgs.vae)
        text_p = ti.convert_clip_text_state_dict(text_sd, cfgs.text)
        tokenizer = CLIPTokenizer.from_dir(
            os.path.join(sd_turbo_dir, "tokenizer"))

        if ckpt_path is None:
            return cls(cfgs=cfgs, params={"unet": unet_p, "vae": vae_p},
                       text_params=text_p, tokenizer=tokenizer, dtype=dtype)

        ckpt = ti.load_torch_pickle(ckpt_path)
        unet_lora = lora_mod.lora_from_torch_state_dict(
            ckpt["state_dict_unet"], rank=ckpt["rank_unet"])
        vae_lora = lora_mod.lora_from_torch_state_dict(
            ckpt["state_dict_vae"], rank=ckpt["rank_vae"])
        # overlay retrained plain weights (conv_in, skip convs)
        unet_p, _ = lora_mod.overlay_base_weights(
            unet_p, ckpt["state_dict_unet"], "unet")
        vae_p, _ = lora_mod.overlay_base_weights(
            vae_p, ckpt["state_dict_vae"], "vae")

        if stochastic:
            unet_p = unet_mod.make_twin_conv_in(unet_p)
            # TwinConv stores separate pretrained/current conv_in weights
            sd = ckpt["state_dict_unet"]
            if "conv_in.conv_in_pretrained.weight" in sd:
                unet_p["conv_in"]["pretrained"] = {
                    "kernel": jnp.asarray(
                        sd["conv_in.conv_in_pretrained.weight"]
                        .transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(sd["conv_in.conv_in_pretrained.bias"]),
                }
                unet_p["conv_in"]["current"] = {
                    "kernel": jnp.asarray(
                        sd["conv_in.conv_in_curr.weight"]
                        .transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(sd["conv_in.conv_in_curr.bias"]),
                }
            return cls(cfgs=cfgs, base={"unet": unet_p, "vae": vae_p},
                       lora={"unet": unet_lora, "vae": vae_lora},
                       text_params=text_p, tokenizer=tokenizer, dtype=dtype)

        merged = {
            "unet": lora_mod.merge_lora(unet_p, unet_lora, model="unet"),
            "vae": lora_mod.merge_lora(vae_p, vae_lora, model="vae"),
        }
        return cls(cfgs=cfgs, params=merged, text_params=text_p,
                   tokenizer=tokenizer, dtype=dtype)

    # -- prompts -----------------------------------------------------------

    def encode_prompt(self, prompt: str) -> jax.Array:
        """(1, 77, cross_dim) caption embedding, cached per prompt string."""
        if prompt in self._prompt_cache:
            return self._prompt_cache[prompt]
        assert self.tokenizer is not None and self.text_params is not None
        ids = self.tokenizer(prompt)
        enc = clip_text.clip_text_forward(self.text_params, self.cfgs.text,
                                          jnp.asarray(ids, jnp.int32))
        enc = enc.astype(self.dtype)
        self._prompt_cache[prompt] = enc
        return enc

    def encode_prompt_tokens(self, tokens) -> jax.Array:
        return clip_text.clip_text_forward(
            self.text_params, self.cfgs.text,
            jnp.asarray(tokens, jnp.int32)).astype(self.dtype)

    # -- generation --------------------------------------------------------

    def __call__(self, c_t, prompt: Optional[str] = None,
                 caption_enc=None, rng=None, deterministic: bool = True,
                 r: float = 1.0, noise_map=None):
        """c_t: (B, H, W, 3) float input (edge map in [0,1] / image in
        [-1,1]). Returns (B, H, W, 3) in [-1, 1]."""
        if c_t.shape[1] % 8 or c_t.shape[2] % 8:
            raise ValueError(
                f"input H/W must be multiples of 8, got {c_t.shape[1:3]}; "
                "crop first (see ops.image.crop_to_multiple, reference "
                "inference_paired.py:39-41)")
        if caption_enc is None:
            if prompt is None:
                raise ValueError("provide either `prompt` or `caption_enc`")
            caption_enc = self.encode_prompt(prompt)
        if caption_enc.shape[0] != c_t.shape[0]:
            caption_enc = jnp.broadcast_to(
                caption_enc, (c_t.shape[0],) + caption_enc.shape[1:])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c_t = c_t.astype(self.dtype)
        if deterministic:
            assert self.params is not None, (
                "deterministic path needs merged params; call merge() first")
            return self._det(self.params, c_t=c_t, caption_enc=caption_enc,
                             rng=rng)
        assert self.base is not None and self.lora is not None, (
            "stochastic path needs unmerged base+lora params")
        if noise_map is None:
            raise ValueError(
                "stochastic path requires noise_map of shape "
                f"(B, H/8, W/8, 4) = (.., {c_t.shape[1] // 8}, "
                f"{c_t.shape[2] // 8}, 4)")
        if noise_map.shape[1:3] != (c_t.shape[1] // 8, c_t.shape[2] // 8):
            raise ValueError(
                f"noise_map spatial dims {noise_map.shape[1:3]} != latent "
                f"dims {(c_t.shape[1] // 8, c_t.shape[2] // 8)}")
        return self._sto(self.base, self.lora, c_t=c_t,
                         caption_enc=caption_enc, rng=rng,
                         r=jnp.asarray(r, jnp.float32),
                         noise_map=noise_map)

    def merge(self, scale: float = 1.0):
        """Merge factored LoRA into dense serving weights."""
        assert self.base is not None and self.lora is not None
        self.params = {
            "unet": lora_mod.merge_lora(self.base["unet"], self.lora["unet"],
                                        scale, "unet"),
            "vae": lora_mod.merge_lora(self.base["vae"], self.lora["vae"],
                                       scale, "vae"),
        }
        return self

    # -- checkpoint IO (reference pkl schema) ------------------------------

    def save_model(self, outf: str):
        """Write the reference pix2pix pkl schema (pix2pix_turbo.py:221-229)
        so checkpoints interchange with the PyTorch implementation.

        Key layouts match the peft-wrapped reference modules exactly (its
        loader overlays onto `model.state_dict()` then strict-loads,
        pix2pix_turbo.py:117-129): UNet adapter name "default", VAE adapter
        name "vae_skip", and the LoRA-targeted skip convs' base weights
        under `.base_layer.` (peft wraps targeted convs)."""
        import torch
        from img2img_turbo_tpu.weights.torch_import import export_lora_weights
        assert self.base is not None and self.lora is not None

        def lora_sd(lora, adapter):
            out = {}
            for name, entry in lora["modules"].items():
                out.update(export_lora_weights(name, entry, adapter))
            return {k: torch.from_numpy(v) for k, v in out.items()}

        sd_unet = lora_sd(self.lora["unet"], "default")
        # conv_in (trained fully; reference filter "conv_in" in k)
        conv_in = self.base["unet"]["conv_in"]
        if "pretrained" in conv_in:
            for tag, sub in (("conv_in_pretrained", conv_in["pretrained"]),
                             ("conv_in_curr", conv_in["current"])):
                sd_unet[f"conv_in.{tag}.weight"] = torch.from_numpy(
                    np.asarray(sub["kernel"]).transpose(3, 2, 0, 1).copy())
                sd_unet[f"conv_in.{tag}.bias"] = torch.from_numpy(
                    np.asarray(sub["bias"]).copy())
        else:
            sd_unet["conv_in.weight"] = torch.from_numpy(
                np.asarray(conv_in["kernel"]).transpose(3, 2, 0, 1).copy())
            sd_unet["conv_in.bias"] = torch.from_numpy(
                np.asarray(conv_in["bias"]).copy())

        sd_vae = lora_sd(self.lora["vae"], "vae_skip")
        for i, conv in enumerate(self.base["vae"]["decoder"]["skip_convs"]):
            sd_vae[f"decoder.skip_conv_{i + 1}.base_layer.weight"] = (
                torch.from_numpy(np.asarray(conv["kernel"])
                                 .transpose(3, 2, 0, 1).copy()))

        torch.save({
            "unet_lora_target_modules": list(lora_mod.PIX2PIX_UNET_TARGETS),
            "vae_lora_target_modules": list(lora_mod.PIX2PIX_VAE_TARGETS),
            "rank_unet": self.lora["unet"]["rank"],
            "rank_vae": self.lora["vae"]["rank"],
            "state_dict_unet": sd_unet,
            "state_dict_vae": sd_vae,
        }, outf)

"""CycleGAN-Turbo: one-step unpaired image translation (day<->night etc).

Equivalent of the reference's `CycleGAN_Turbo` (src/cyclegan_turbo.py:109-254):
one SHARED UNet serves both directions (direction enters only through the
caption embedding and which VAE is used); two VAEs (a2b and its b2a copy)
with skip-tap encode / skip-fusion decode. The reference's per-sample Python
scheduler loop (cyclegan_turbo.py:205) is replaced by the batched closed-form
step.

The three UNet LoRA adapters (default_encoder / default_decoder / default_
others, reference cyclegan_turbo.py:48-72) partition the matched modules by
name, so for serving they merge into dense weights in one pass; for training
they stay factored per-adapter.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import lora as lora_mod, scheduler
from img2img_turbo_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.models.tokenizer import CLIPTokenizer
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs


# named pretrained checkpoints: fixed caption + direction
# (reference cyclegan_turbo.py:126-149)
NAMED_MODELS = {
    "day_to_night": ("day2night.pkl", "driving in the night", "a2b"),
    "night_to_day": ("night2day.pkl", "driving in the day", "b2a"),
    "clear_to_rainy": ("clear2rainy.pkl", "driving in heavy rain", "a2b"),
    "rainy_to_clear": ("rainy2clear.pkl", "driving in the day", "b2a"),
}


def cyclegan_unet_adapters(base_unet, rank: int, key) -> Dict[str, Dict]:
    """Build the encoder/decoder/others adapter trio by partitioning matched
    module names (reference initialize_unet, cyclegan_turbo.py:48-72).
    lora_alpha = rank (scale 1)."""
    names = lora_mod.module_names(base_unet, "unet")
    enc, dec, oth = [], [], []
    for n in names:
        if not lora_mod.matches_target(n, lora_mod.CYCLEGAN_UNET_GREP):
            continue
        if "down_blocks" in n or "conv_in" in n:
            enc.append(n)
        elif "up_blocks" in n:
            dec.append(n)
        else:
            oth.append(n)
    out = {}
    for adapter, targets in (("default_encoder", enc),
                             ("default_decoder", dec),
                             ("default_others", oth)):
        key, sub = jax.random.split(key)
        out[adapter] = lora_mod.init_lora(
            sub, base_unet,
            lora_mod.LoRASpec(rank, tuple(targets), alpha=float(rank)),
            "unet")
    return out


def forward_with_params(params: Dict, cfgs: GeneratorConfigs, alphas_cumprod,
                        x, caption_enc, rng, direction: str,
                        remat: bool = False):
    """Batched equivalent of reference forward_with_networks
    (cyclegan_turbo.py:199-207). direction is static ("a2b" | "b2a")."""
    assert direction in ("a2b", "b2a")
    vae_p = params["vae_a2b"] if direction == "a2b" else params["vae_b2a"]
    s = cfgs.vae.scaling_factor
    z, skips = vae_mod.encode(vae_p, cfgs.vae, x, rng)
    z = z * s
    t = jnp.full((x.shape[0],), scheduler.ONE_STEP_T, jnp.int32)
    eps = unet_mod.unet_forward(params["unet"], cfgs.unet, z, t, caption_enc,
                                remat=remat)
    x0 = scheduler.ddpm_x0_step(eps, z, t, alphas_cumprod)
    img = vae_mod.decode(vae_p, cfgs.vae, x0 / s, skips, gamma=1.0)
    return jnp.clip(img, -1.0, 1.0)


class CycleGANTurbo:
    """Serving pipeline. params: {"unet", "vae_a2b", "vae_b2a"} dense."""

    def __init__(self, cfgs: Optional[GeneratorConfigs] = None,
                 params: Optional[Dict] = None, text_params=None,
                 tokenizer: Optional[CLIPTokenizer] = None,
                 caption: Optional[str] = None,
                 direction: Optional[str] = None, dtype=jnp.float32):
        self.cfgs = cfgs or GeneratorConfigs()
        self.alphas_cumprod = scheduler.make_alphas_cumprod()
        self.params = params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.caption = caption
        self.direction = direction
        self.dtype = dtype
        self._prompt_cache: Dict[str, jax.Array] = {}
        self._fwd = jax.jit(functools.partial(
            forward_with_params, cfgs=self.cfgs,
            alphas_cumprod=self.alphas_cumprod),
            static_argnames=("direction", "remat"))

    @classmethod
    def from_random(cls, key, cfgs: Optional[GeneratorConfigs] = None,
                    lora_rank_unet: int = 128, lora_rank_vae: int = 4,
                    dtype=jnp.float32):
        """Training init (reference initialize_unet/initialize_vae,
        cyclegan_turbo.py:48-106 + train_cyclegan_turbo.py:63: vae_b2a is a
        deepcopy of vae_a2b). Returns (pipeline, base, loras)."""
        cfgs = cfgs or GeneratorConfigs()
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        unet_p = unet_mod.init_unet(k1, cfgs.unet)
        vae_p = vae_mod.init_vae(k2, cfgs.vae, with_skip_convs=True,
                                 skip_init=1e-5)
        vae_b2a = jax.tree_util.tree_map(jnp.copy, vae_p)
        unet_adapters = cyclegan_unet_adapters(unet_p, lora_rank_unet, k3)
        vae_spec = lora_mod.LoRASpec(lora_rank_vae,
                                     lora_mod.CYCLEGAN_VAE_TARGETS)
        loras = {
            "unet": unet_adapters,
            "vae_a2b": lora_mod.init_lora(k4, vae_p, vae_spec, "vae"),
            "vae_b2a": lora_mod.init_lora(k4, vae_b2a, vae_spec, "vae"),
        }
        text_p = clip_text.init_clip_text(k5, cfgs.text)
        base = {"unet": unet_p, "vae_a2b": vae_p, "vae_b2a": vae_b2a}
        pipe = cls(cfgs=cfgs, params=None, text_params=text_p, dtype=dtype)
        pipe.base, pipe.loras = base, loras
        return pipe

    @classmethod
    def from_pretrained(cls, sd_turbo_dir: str, ckpt_path: str,
                        caption: Optional[str] = None,
                        direction: Optional[str] = None,
                        cfgs: Optional[GeneratorConfigs] = None,
                        dtype=jnp.bfloat16):
        """Load sd-turbo safetensors + a CycleGAN-Turbo pkl (schema:
        train_cyclegan_turbo.py:293-307 / loader cyclegan_turbo.py:162-190).

        ckpt_path may be a published model name ("day_to_night", ...) —
        the fixed caption/direction then come from NAMED_MODELS, like the
        reference's pretrained_name mode (cyclegan_turbo.py:126-149)."""
        import os
        from img2img_turbo_tpu.utils.download import get_checkpoint
        from img2img_turbo_tpu.weights import torch_import as ti

        if ckpt_path in NAMED_MODELS:
            _, caption, direction = NAMED_MODELS[ckpt_path]
            ckpt_path = get_checkpoint(ckpt_path)

        cfgs = cfgs or GeneratorConfigs()
        unet_sd = ti.load_safetensors(os.path.join(
            sd_turbo_dir, "unet", "diffusion_pytorch_model.safetensors"))
        text_sd = ti.load_safetensors(os.path.join(
            sd_turbo_dir, "text_encoder", "model.safetensors"))
        unet_p = ti.convert_unet_state_dict(unet_sd, cfgs.unet)
        text_p = ti.convert_clip_text_state_dict(text_sd, cfgs.text)
        tokenizer = CLIPTokenizer.from_dir(
            os.path.join(sd_turbo_dir, "tokenizer"))

        ckpt = ti.load_torch_pickle(ckpt_path)
        rank_unet = ckpt["rank_unet"]
        # three adapters, lora_alpha = rank (cyclegan_turbo.py:163-165)
        for sd_key in ("sd_encoder", "sd_decoder", "sd_other"):
            lora = lora_mod.lora_from_torch_state_dict(
                ckpt[sd_key], rank=rank_unet, alpha=float(rank_unet))
            unet_p = lora_mod.merge_lora(unet_p, lora, model="unet")

        # full VAE state (incl. base weights + lora) lives in sd_vae_enc /
        # sd_vae_dec under "vae." / "vae_b2a." prefixes
        vaes = {}
        for prefix in ("vae.", "vae_b2a."):
            sd = {}
            for src in ("sd_vae_enc", "sd_vae_dec"):
                for k, v in ckpt[src].items():
                    if k.startswith(prefix):
                        sd[k[len(prefix):]] = v
            base_sd = {k.replace(".base_layer", ""): v for k, v in sd.items()
                       if ".lora_" not in k}
            vae_p = ti.convert_vae_state_dict(base_sd, cfgs.vae)
            vae_lora = lora_mod.lora_from_torch_state_dict(
                sd, rank=ckpt["rank_vae"])
            if vae_lora["modules"]:
                vae_p = lora_mod.merge_lora(vae_p, vae_lora, model="vae")
            vaes[prefix.rstrip(".")] = vae_p

        params = {"unet": unet_p, "vae_a2b": vaes["vae"],
                  "vae_b2a": vaes["vae_b2a"]}
        return cls(cfgs=cfgs, params=params, text_params=text_p,
                   tokenizer=tokenizer, caption=caption, direction=direction,
                   dtype=dtype)

    def encode_prompt(self, prompt: str) -> jax.Array:
        if prompt in self._prompt_cache:
            return self._prompt_cache[prompt]
        ids = self.tokenizer(prompt)
        enc = clip_text.clip_text_forward(
            self.text_params, self.cfgs.text,
            jnp.asarray(ids, jnp.int32)).astype(self.dtype)
        self._prompt_cache[prompt] = enc
        return enc

    def __call__(self, x, direction: Optional[str] = None,
                 caption: Optional[str] = None, caption_enc=None, rng=None):
        """x: (B, H, W, 3) in [-1, 1]. Returns translated batch in [-1, 1].
        Falls back to the pipeline's fixed caption/direction like the
        reference forward (cyclegan_turbo.py:241-249)."""
        direction = direction or self.direction
        assert direction in ("a2b", "b2a")
        if caption_enc is None:
            caption_enc = self.encode_prompt(caption or self.caption)
        if caption_enc.shape[0] != x.shape[0]:
            caption_enc = jnp.broadcast_to(
                caption_enc, (x.shape[0],) + caption_enc.shape[1:])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._fwd(self.params, x=x.astype(self.dtype),
                         caption_enc=caption_enc, rng=rng,
                         direction=direction)

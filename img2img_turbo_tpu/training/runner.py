"""Shared training-run machinery: trackers, model assembly, mesh setup.

Tracker: wandb when installed and requested (reference uses
accelerator.init_trackers/log, train_pix2pix_turbo.py:140-142,232-241);
always also appends JSONL to <output_dir>/metrics.jsonl so runs are
observable in this no-network environment.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict

import numpy as np
import jax

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import (clip_text, clip_vit, discriminator,
                                      unet as unet_mod, vae as vae_mod,
                                      vgg_lpips)
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs


def make_tracker(report_to: str, project: str, output_dir: str,
                 config: Dict) -> Callable[[Dict, int], None]:
    os.makedirs(output_dir, exist_ok=True)
    jsonl_path = os.path.join(output_dir, "metrics.jsonl")
    wandb_run = None
    if report_to == "wandb":
        try:
            import wandb
            wandb_run = wandb.init(project=project, config=config,
                                   dir=output_dir)
        except Exception:
            wandb_run = None  # offline box: fall through to jsonl only

    def log(metrics: Dict, step: int) -> None:
        row = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()}
        row["step"] = step
        row["time"] = time.time()
        with open(jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if wandb_run is not None:
            wandb_run.log(metrics, step=step)

    return log


def generator_configs(args) -> GeneratorConfigs:
    if getattr(args, "tiny_model", False):
        return GeneratorConfigs(unet=configs.TINY_UNET, vae=configs.TINY_VAE,
                                text=configs.TINY_TEXT)
    return GeneratorConfigs()


def clip_config(args) -> clip_vit.CLIPViTConfig:
    if getattr(args, "tiny_model", False):
        return clip_vit.TINY_CLIP_VIT
    return clip_vit.CLIP_VIT_B32


def load_base_models(args, cfgs: GeneratorConfigs, key):
    """(unet, vae, text_params, tokenizer) from a local sd-turbo snapshot,
    or random-init when --sd_turbo_path is omitted (reference always starts
    from pretrained; random init exists for offline smoke tests)."""
    if args.sd_turbo_path:
        import os as _os
        from img2img_turbo_tpu.models.tokenizer import CLIPTokenizer
        from img2img_turbo_tpu.weights import torch_import as ti
        unet_p = ti.convert_unet_state_dict(ti.load_safetensors(_os.path.join(
            args.sd_turbo_path, "unet",
            "diffusion_pytorch_model.safetensors")), cfgs.unet)
        vae_sd = ti.load_safetensors(_os.path.join(
            args.sd_turbo_path, "vae", "diffusion_pytorch_model.safetensors"))
        vae_p = ti.convert_vae_state_dict(vae_sd, cfgs.vae)
        text_p = ti.convert_clip_text_state_dict(ti.load_safetensors(
            _os.path.join(args.sd_turbo_path, "text_encoder",
                          "model.safetensors")), cfgs.text)
        tok = CLIPTokenizer.from_dir(_os.path.join(args.sd_turbo_path,
                                                   "tokenizer"))
        return unet_p, vae_p, text_p, tok
    k1, k2, k3 = jax.random.split(key, 3)
    return (unet_mod.init_unet(k1, cfgs.unet),
            vae_mod.init_vae(k2, cfgs.vae, skip_init=1e-5),
            clip_text.init_clip_text(k3, cfgs.text), None)


def init_aux_models(args, key, clip_cfg, with_clipsim: bool):
    """LPIPS + CLIP + discriminator backbone/heads/spectral-norm state.

    Pretrained ingestion (the reference's lpips.LPIPS(net='vgg') /
    clip.load('ViT-B/32') downloads, train_pix2pix_turbo.py:64-78):
    - --lpips_weights: torch file with an lpips.LPIPS(net='vgg')
      state_dict (or {vgg features, lin heads} pair) -> vgg_lpips converter
    - --clip_weights: OpenAI ViT-B-32.pt or HF CLIPModel state dict ->
      clip_vit.convert_clip_state_dict; feeds BOTH the clip-sim loss and
      the vision-aided discriminator backbone
    Random init otherwise (offline smoke mode).
    Returns (aux_frozen, disc_heads, disc_sn)."""
    k1, k2, k3 = jax.random.split(key, 3)
    clip_tree = None
    if getattr(args, "clip_weights", ""):
        from img2img_turbo_tpu.weights import torch_import as ti
        sd = ti.load_torch_pickle(args.clip_weights)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        clip_tree = clip_vit.convert_clip_state_dict(sd, clip_cfg)
    disc_full = discriminator.init_discriminator(
        k1, clip_cfg,
        backbone=(clip_tree["vision"] if clip_tree is not None else None))
    if getattr(args, "lpips_weights", ""):
        lpips_p = vgg_lpips.load_lpips_weights(args.lpips_weights)
    else:
        lpips_p = vgg_lpips.init_vgg_lpips(k2)
    aux = {
        "lpips": lpips_p,
        "disc_backbone": disc_full["backbone"],
    }
    if with_clipsim:
        aux["clip"] = (clip_tree if clip_tree is not None
                       else clip_vit.init_clip(k3, clip_cfg))
    return aux, disc_full["heads"], disc_full["sn"]


def init_inception(args, key):
    """FID feature extractor: pretrained via --inception_weights
    (torchvision inception_v3 state dict), random otherwise."""
    from img2img_turbo_tpu.metrics import inception as inc_mod
    if getattr(args, "inception_weights", ""):
        from img2img_turbo_tpu.weights import torch_import as ti
        sd = ti.load_torch_pickle(args.inception_weights)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return inc_mod.convert_inception_state_dict(sd)
    return inc_mod.init_inception(key)


class SmokeTokenizer:
    """Offline-only word-hash tokenizer for smoke runs without a CLIP
    vocab on disk (tests/docs training smokes). NOT semantically
    meaningful — production runs must pass a real tokenizer directory."""

    model_max_length = 77

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def __call__(self, text):
        words = (text if isinstance(text, str) else " ".join(text)).split()
        ids = [(abs(hash(w)) % (self.vocab_size - 3)) + 1
               for w in words][:75]
        return np.asarray([[49406 % self.vocab_size] + ids
                           + [0] * (76 - len(ids))], np.int32)

"""Checkpointing: orbax full-state save/RESUME + reference-pkl export.

The reference only pickles adapter weights periodically and cannot resume
(first_epoch/global_step hard-coded to 0, train_cyclegan_turbo.py:153-154;
no optimizer/scheduler state saved — SURVEY.md §5). On TPU pods preemption
is routine, so this module saves the FULL training state (generator
trainables, both optimizer states, discriminator heads, step) via orbax and
restores it exactly; the reference-schema pkls are still exported alongside
for interchange with the PyTorch implementation.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_train_state(directory: str, step: int, state: Dict,
                     max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp
    mgr = _mgr(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    import orbax.checkpoint as ocp
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_train_state(directory: str, state_like: Dict,
                        step: Optional[int] = None) -> Dict:
    """Restore into the structure of `state_like` (an abstract or concrete
    state pytree). Returns the restored state."""
    import orbax.checkpoint as ocp
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint found in {directory}"
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
    mgr.close()
    return restored


# ---------------------------------------------------------------------------
# Reference-schema pkl export (CycleGAN; the pix2pix export lives on
# Pix2PixTurbo.save_model)
# ---------------------------------------------------------------------------


def export_cyclegan_pkl(outf: str, gen: Dict, meta, adapter_targets: Dict,
                        vae_targets, frozen: Dict) -> None:
    """Write the reference CycleGAN pkl schema
    (train_cyclegan_turbo.py:293-307): 3 unet adapter state dicts (peft
    style, no adapter name in keys), and sd_vae_enc/sd_vae_dec as the FULL
    `VAE_encode`/`VAE_decode` state dicts — both vaes under "vae." /
    "vae_b2a." prefixes, every targeted module peft-wrapped (base weights
    under `.base_layer.`, lora keys carrying the `vae_skip` adapter name) —
    so the reference's strict `load_state_dict` (cyclegan_turbo.py:186-190)
    accepts them key-for-key."""
    import torch
    from img2img_turbo_tpu.weights.torch_import import (
        export_lora_weights, export_vae_state_dict, peft_wrap_state_dict)

    def lora_sd(modules):
        out = {}
        for name, entry in modules.items():
            out.update(export_lora_weights(name, entry))
        return {k: torch.from_numpy(v) for k, v in out.items()}

    def vae_full_sd(prefix, lora, skip_convs, base):
        """Wrapped AutoencoderKL state dict under `prefix` (torch layout)."""
        base = dict(base)
        base["decoder"] = dict(base["decoder"])
        base["decoder"]["skip_convs"] = skip_convs
        sd = export_vae_state_dict(base)
        sd = peft_wrap_state_dict(sd, lora, vae_targets, adapter="vae_skip")
        return {f"{prefix}{k}": torch.from_numpy(v) for k, v in sd.items()}

    sd_vae = {}
    sd_vae.update(vae_full_sd("vae.", {"modules": gen["vae_a2b_lora"]},
                              gen["vae_a2b_skip"], frozen["vae_a2b"]))
    sd_vae.update(vae_full_sd("vae_b2a.", {"modules": gen["vae_b2a_lora"]},
                              gen["vae_b2a_skip"], frozen["vae_b2a"]))

    torch.save({
        "l_target_modules_encoder": list(adapter_targets["default_encoder"]),
        "l_target_modules_decoder": list(adapter_targets["default_decoder"]),
        "l_modules_others": list(adapter_targets["default_others"]),
        "rank_unet": meta.rank_unet,
        "sd_encoder": lora_sd(gen["unet_lora"]["default_encoder"]),
        "sd_decoder": lora_sd(gen["unet_lora"]["default_decoder"]),
        "sd_other": lora_sd(gen["unet_lora"]["default_others"]),
        "rank_vae": meta.rank_vae,
        "vae_lora_target_modules": list(vae_targets),
        "sd_vae_enc": sd_vae,
        "sd_vae_dec": sd_vae,
    }, outf)

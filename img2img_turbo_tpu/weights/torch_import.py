"""Torch/HF state-dict → JAX pytree converters.

Ingests the externally-sourced weights the reference pulls from the HF hub
(`stabilityai/sd-turbo` unet/vae/text_encoder safetensors) and converts them
to this framework's NHWC param pytrees:
- Linear weights (out, in) -> (in, out)
- Conv weights (O, I, kh, kw) -> (kh, kw, I, O)
- norm weight/bias -> scale/bias

Checkpoint-format docs: reference pkl schemas at
/root/reference/src/pix2pix_turbo.py:221-229 and
/root/reference/src/train_cyclegan_turbo.py:293-307; see lora.py for the
LoRA overlay application.

All functions take a flat {name: np.ndarray} dict (from safetensors or a
torch pickle's state_dict) — no torch dependency on the load path.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from img2img_turbo_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig


Array = np.ndarray


def _lin(sd: Mapping[str, Array], prefix: str, bias: bool = True):
    p = {"kernel": jnp.asarray(np.ascontiguousarray(
        sd[prefix + ".weight"].T))}
    if bias and prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _conv(sd: Mapping[str, Array], prefix: str):
    w = sd[prefix + ".weight"]
    p = {"kernel": jnp.asarray(np.ascontiguousarray(
        w.transpose(2, 3, 1, 0)))}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _norm(sd: Mapping[str, Array], prefix: str):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def load_safetensors(path: str) -> Dict[str, Array]:
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — expected a local HF stabilityai/sd-turbo "
            "snapshot with unet/vae/text_encoder subfolders (fetch with "
            "`huggingface-cli download stabilityai/sd-turbo` on a networked "
            "machine and point --sd_turbo_path at it)")
    from safetensors.numpy import load_file
    return load_file(path)


def load_torch_pickle(path: str):
    """Load a torch pickle (the reference's pkl checkpoints) into numpy."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, torch.Tensor):
            return x.detach().float().numpy()
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_np(v) for v in x)
        return x

    return to_np(obj)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


def convert_clip_text_state_dict(sd: Mapping[str, Array],
                                 cfg: CLIPTextConfig):
    pre = "text_model."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}."
        layers.append({
            "ln1": _norm(sd, lp + "layer_norm1"),
            "attn": {
                "q": _lin(sd, lp + "self_attn.q_proj"),
                "k": _lin(sd, lp + "self_attn.k_proj"),
                "v": _lin(sd, lp + "self_attn.v_proj"),
                "out": _lin(sd, lp + "self_attn.out_proj"),
            },
            "ln2": _norm(sd, lp + "layer_norm2"),
            "fc1": _lin(sd, lp + "mlp.fc1"),
            "fc2": _lin(sd, lp + "mlp.fc2"),
        })
    return {
        "token_embedding": jnp.asarray(
            sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "layers": layers,
        "final_ln": _norm(sd, pre + "final_layer_norm"),
    }


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _resnet_from_sd(sd, prefix: str, temb: bool):
    p = {
        "norm1": _norm(sd, prefix + ".norm1"),
        "conv1": _conv(sd, prefix + ".conv1"),
        "norm2": _norm(sd, prefix + ".norm2"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }
    if temb and prefix + ".time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, prefix + ".time_emb_proj")
    if prefix + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, prefix + ".conv_shortcut")
    return p


def _attention_from_sd(sd, prefix: str):
    return {
        "to_q": _lin(sd, prefix + ".to_q"),
        "to_k": _lin(sd, prefix + ".to_k"),
        "to_v": _lin(sd, prefix + ".to_v"),
        "to_out": _lin(sd, prefix + ".to_out.0"),
    }


def _transformer_from_sd(sd, prefix: str):
    tb = prefix + ".transformer_blocks.0"
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "proj_in": _lin(sd, prefix + ".proj_in"),
        "norm1": _norm(sd, tb + ".norm1"),
        "attn1": _attention_from_sd(sd, tb + ".attn1"),
        "norm2": _norm(sd, tb + ".norm2"),
        "attn2": _attention_from_sd(sd, tb + ".attn2"),
        "norm3": _norm(sd, tb + ".norm3"),
        "ff": {
            "proj": _lin(sd, tb + ".ff.net.0.proj"),
            "out": _lin(sd, tb + ".ff.net.2"),
        },
        "proj_out": _lin(sd, prefix + ".proj_out"),
    }


def convert_unet_state_dict(sd: Mapping[str, Array], cfg: UNetConfig):
    n = cfg.num_levels
    down = []
    for i in range(n):
        block = {"resnets": [
            _resnet_from_sd(sd, f"down_blocks.{i}.resnets.{j}", temb=True)
            for j in range(cfg.layers_per_block)]}
        if cfg.transformer_levels[i]:
            block["attns"] = [
                _transformer_from_sd(sd, f"down_blocks.{i}.attentions.{j}")
                for j in range(cfg.layers_per_block)]
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
        down.append(block)

    up = []
    rev_tlevels = list(reversed(cfg.transformer_levels))
    for i in range(n):
        block = {"resnets": [
            _resnet_from_sd(sd, f"up_blocks.{i}.resnets.{j}", temb=True)
            for j in range(cfg.layers_per_block + 1)]}
        if rev_tlevels[i]:
            block["attns"] = [
                _transformer_from_sd(sd, f"up_blocks.{i}.attentions.{j}")
                for j in range(cfg.layers_per_block + 1)]
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
        up.append(block)

    return {
        "conv_in": _conv(sd, "conv_in"),
        "time_mlp": {
            "lin1": _lin(sd, "time_embedding.linear_1"),
            "lin2": _lin(sd, "time_embedding.linear_2"),
        },
        "down": down,
        "mid": {
            "res1": _resnet_from_sd(sd, "mid_block.resnets.0", temb=True),
            "attn": _transformer_from_sd(sd, "mid_block.attentions.0"),
            "res2": _resnet_from_sd(sd, "mid_block.resnets.1", temb=True),
        },
        "up": up,
        "norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Inverse converters: JAX pytree -> torch/diffusers state dict (numpy, torch
# layouts). Used for reference-loadable checkpoint export; bijection with the
# convert_* functions is pinned by tests/test_weights.py.
# ---------------------------------------------------------------------------


def _inv_lin(out: Dict[str, Array], prefix: str, mod) -> None:
    out[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(mod["kernel"]).T)
    if "bias" in mod:
        out[prefix + ".bias"] = np.asarray(mod["bias"]).copy()


def _inv_conv(out: Dict[str, Array], prefix: str, mod) -> None:
    out[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(mod["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in mod:
        out[prefix + ".bias"] = np.asarray(mod["bias"]).copy()


def _inv_norm(out: Dict[str, Array], prefix: str, mod) -> None:
    out[prefix + ".weight"] = np.asarray(mod["scale"]).copy()
    out[prefix + ".bias"] = np.asarray(mod["bias"]).copy()


def _inv_resnet(out, prefix: str, p) -> None:
    _inv_norm(out, prefix + ".norm1", p["norm1"])
    _inv_conv(out, prefix + ".conv1", p["conv1"])
    _inv_norm(out, prefix + ".norm2", p["norm2"])
    _inv_conv(out, prefix + ".conv2", p["conv2"])
    if "time_emb_proj" in p:
        _inv_lin(out, prefix + ".time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _inv_conv(out, prefix + ".conv_shortcut", p["conv_shortcut"])


def _inv_vae_mid(out, prefix: str, p) -> None:
    ap = prefix + ".attentions.0"
    _inv_resnet(out, prefix + ".resnets.0", p["res1"])
    _inv_norm(out, ap + ".group_norm", p["attn"]["norm"])
    _inv_lin(out, ap + ".to_q", p["attn"]["to_q"])
    _inv_lin(out, ap + ".to_k", p["attn"]["to_k"])
    _inv_lin(out, ap + ".to_v", p["attn"]["to_v"])
    _inv_lin(out, ap + ".to_out.0", p["attn"]["to_out"])
    _inv_resnet(out, prefix + ".resnets.1", p["res2"])


def _inv_attention(out, prefix: str, p) -> None:
    _inv_lin(out, prefix + ".to_q", p["to_q"])
    _inv_lin(out, prefix + ".to_k", p["to_k"])
    _inv_lin(out, prefix + ".to_v", p["to_v"])
    _inv_lin(out, prefix + ".to_out.0", p["to_out"])


def _inv_transformer(out, prefix: str, p) -> None:
    _inv_norm(out, prefix + ".norm", p["norm"])
    _inv_lin(out, prefix + ".proj_in", p["proj_in"])
    tb = prefix + ".transformer_blocks.0"
    _inv_norm(out, tb + ".norm1", p["norm1"])
    _inv_attention(out, tb + ".attn1", p["attn1"])
    _inv_norm(out, tb + ".norm2", p["norm2"])
    _inv_attention(out, tb + ".attn2", p["attn2"])
    _inv_norm(out, tb + ".norm3", p["norm3"])
    _inv_lin(out, tb + ".ff.net.0.proj", p["ff"]["proj"])
    _inv_lin(out, tb + ".ff.net.2", p["ff"]["out"])
    _inv_lin(out, prefix + ".proj_out", p["proj_out"])


def export_unet_state_dict(params) -> Dict[str, Array]:
    """Full diffusers `UNet2DConditionModel` state dict from a UNet param
    tree — the exact inverse of `convert_unet_state_dict` (bijection pinned
    by tests/test_full_parity.py). Enables reference-format export of the
    dense (LoRA-merged) UNet and the full-model torch-mirror goldens."""
    out: Dict[str, Array] = {}
    _inv_conv(out, "conv_in", params["conv_in"])
    _inv_lin(out, "time_embedding.linear_1", params["time_mlp"]["lin1"])
    _inv_lin(out, "time_embedding.linear_2", params["time_mlp"]["lin2"])
    for i, block in enumerate(params["down"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(out, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block.get("attns", ())):
            _inv_transformer(out, f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in block:
            _inv_conv(out, f"down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    _inv_resnet(out, "mid_block.resnets.0", params["mid"]["res1"])
    _inv_transformer(out, "mid_block.attentions.0", params["mid"]["attn"])
    _inv_resnet(out, "mid_block.resnets.1", params["mid"]["res2"])
    for i, block in enumerate(params["up"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(out, f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block.get("attns", ())):
            _inv_transformer(out, f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in block:
            _inv_conv(out, f"up_blocks.{i}.upsamplers.0.conv",
                      block["upsample"])
    _inv_norm(out, "conv_norm_out", params["norm_out"])
    _inv_conv(out, "conv_out", params["conv_out"])
    return out


def export_vae_state_dict(params) -> Dict[str, Array]:
    """Full diffusers `AutoencoderKL` state dict (incl. GroupNorms, quant
    convs and the img2img-turbo skip convs) from a VAE param tree — the
    exact inverse of `convert_vae_state_dict`."""
    out: Dict[str, Array] = {}
    enc = params["encoder"]
    _inv_conv(out, "encoder.conv_in", enc["conv_in"])
    for i, block in enumerate(enc["down"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(out, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in block:
            _inv_conv(out, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    _inv_vae_mid(out, "encoder.mid_block", enc["mid"])
    _inv_norm(out, "encoder.conv_norm_out", enc["norm_out"])
    _inv_conv(out, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _inv_conv(out, "decoder.conv_in", dec["conv_in"])
    _inv_vae_mid(out, "decoder.mid_block", dec["mid"])
    for i, block in enumerate(dec["up"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet(out, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in block:
            _inv_conv(out, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      block["upsample"])
    _inv_norm(out, "decoder.conv_norm_out", dec["norm_out"])
    _inv_conv(out, "decoder.conv_out", dec["conv_out"])
    if "skip_convs" in dec:
        for i, conv in enumerate(dec["skip_convs"]):
            _inv_conv(out, f"decoder.skip_conv_{i + 1}", conv)

    _inv_conv(out, "quant_conv", params["quant_conv"])
    _inv_conv(out, "post_quant_conv", params["post_quant_conv"])
    return out


def export_lora_weights(name: str, entry, adapter=None) -> Dict[str, Array]:
    """peft-layout lora_A/lora_B torch tensors for one adapted module.
    Conv: A (r, in, kh, kw), B (out, r, 1, 1); Linear: A (r, in), B (out, r).
    Key schema `<module>.lora_{A,B}[.<adapter>].weight` matches what
    `vae.add_adapter(..., adapter_name=...)` produces (peft's LoraLayer)."""
    a = np.asarray(entry["a"])
    b = np.asarray(entry["b"])
    if a.ndim == 4:
        ta = np.ascontiguousarray(a.transpose(3, 2, 0, 1))
        tb = np.ascontiguousarray(b.T[:, :, None, None])
    else:
        ta = np.ascontiguousarray(a.T)
        tb = np.ascontiguousarray(b.T)
    mid = f".{adapter}" if adapter else ""
    return {f"{name}.lora_A{mid}.weight": ta,
            f"{name}.lora_B{mid}.weight": tb}


def peft_wrap_state_dict(sd: Dict[str, Array], lora,
                         targets, adapter: str) -> Dict[str, Array]:
    """Rewrite a plain diffusers state dict into the key layout of the same
    model after `add_adapter(LoraConfig(target_modules=targets),
    adapter_name=adapter)`: targeted modules' base params move under
    `.base_layer.`, and each adapted module gains
    `lora_{A,B}.<adapter>.weight` entries (peft tuner injection; reference
    loads these with strict `load_state_dict`, cyclegan_turbo.py:186-190)."""
    from img2img_turbo_tpu.lora import matches_target

    out: Dict[str, Array] = {}
    for k, v in sd.items():
        name, field = k.rsplit(".", 1)
        if matches_target(name, targets):
            out[f"{name}.base_layer.{field}"] = v
        else:
            out[k] = v
    for name, entry in lora["modules"].items():
        out.update(export_lora_weights(name, entry, adapter))
    return out


def _vae_mid_from_sd(sd, prefix: str):
    ap = prefix + ".attentions.0"
    # diffusers >=0.17 stores VAE attention as linear to_q/to_k/to_v; older
    # exports use conv-shaped (C, C, 1, 1) weights — squeeze those.
    def attn_lin(name):
        w = sd[f"{ap}.{name}.weight"]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        p = {"kernel": jnp.asarray(np.ascontiguousarray(w.T))}
        if f"{ap}.{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{ap}.{name}.bias"])
        return p

    out_name = ("to_out.0" if f"{ap}.to_out.0.weight" in sd else "proj_attn")
    q_name = "to_q" if f"{ap}.to_q.weight" in sd else "query"
    k_name = "to_k" if f"{ap}.to_k.weight" in sd else "key"
    v_name = "to_v" if f"{ap}.to_v.weight" in sd else "value"
    norm_name = ("group_norm" if f"{ap}.group_norm.weight" in sd
                 else "norm")
    return {
        "res1": _resnet_from_sd(sd, prefix + ".resnets.0", temb=False),
        "attn": {
            "norm": _norm(sd, f"{ap}.{norm_name}"),
            "to_q": attn_lin(q_name),
            "to_k": attn_lin(k_name),
            "to_v": attn_lin(v_name),
            "to_out": attn_lin(out_name),
        },
        "res2": _resnet_from_sd(sd, prefix + ".resnets.1", temb=False),
    }


def convert_vae_state_dict(sd: Mapping[str, Array], cfg: VAEConfig,
                           with_skip_convs: bool = True):
    n = cfg.num_levels
    down = []
    for i in range(n):
        block = {"resnets": [
            _resnet_from_sd(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                            temb=False)
            for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        down.append(block)

    up = []
    for i in range(n):
        block = {"resnets": [
            _resnet_from_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                            temb=False)
            for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        up.append(block)

    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": _vae_mid_from_sd(sd, "decoder.mid_block"),
        "up": up,
        "norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    if with_skip_convs:
        if "decoder.skip_conv_1.weight" in sd:
            decoder["skip_convs"] = [
                _conv(sd, f"decoder.skip_conv_{i + 1}") for i in range(4)]
        else:
            decoder["skip_convs"] = [
                {"kernel": jnp.full((1, 1, ic, oc), 1e-5, jnp.float32)}
                for ic, oc in cfg.skip_conv_channels]

    return {
        "encoder": {
            "conv_in": _conv(sd, "encoder.conv_in"),
            "down": down,
            "mid": _vae_mid_from_sd(sd, "encoder.mid_block"),
            "norm_out": _norm(sd, "encoder.conv_norm_out"),
            "conv_out": _conv(sd, "encoder.conv_out"),
        },
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }

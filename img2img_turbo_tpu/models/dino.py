"""DINO ViT (timm-style) with explicit per-block q/k/v outputs.

Replaces the torch.hub `dino_vitb8` the reference loads for the
DINO-Structure metric (src/my_utils/dino_struct.py:6-52: forward hooks
capture per-block qkv). Here the forward simply *returns* the per-block
keys — no hooks.

timm/DINO ViT block: x + attn(LN(x)), then x + mlp(LN(x)); qkv is one
fused linear with bias; GELU mlp; patch embed conv (patch 8 for ViT-B/8);
cls token; final LN (not needed for the keys metric).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    patch_size: int = 8
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6


DINO_VITB8 = DINOConfig()
TINY_DINO = DINOConfig(patch_size=8, hidden_size=32, num_layers=2,
                       num_heads=4)

# DINO input normalization (ImageNet stats; dino_struct.py:100-109)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_dino(key, cfg: DINOConfig = DINO_VITB8) -> Dict:
    d = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 3)
    blocks = []
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[i], 3)
        blocks.append({
            "ln1": L.init_layer_norm(d),
            "qkv": L.init_linear(bk[0], d, 3 * d),
            "proj": L.init_linear(bk[1], d, d),
            "ln2": L.init_layer_norm(d),
            "fc1": L.init_linear(bk[2], d, d * cfg.mlp_ratio),
            "fc2": L.init_linear(jax.random.fold_in(bk[2], 1),
                                 d * cfg.mlp_ratio, d),
        })
    return {
        "patch_embed": L.init_conv2d(keys[-3], 3, d, cfg.patch_size),
        "cls_token": jax.random.normal(keys[-2], (d,)) * 0.02,
        "pos_embed_grid": jax.random.normal(
            keys[-1], (28, 28, d)) * 0.02,  # 224/8 grid; interpolated
        "pos_embed_cls": jnp.zeros((d,)),
        "blocks": blocks,
        "ln_final": L.init_layer_norm(d),
    }


def dino_forward(params, cfg: DINOConfig, pixels
                 ) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """pixels: (B, H, W, 3) ImageNet-normalized, H/W divisible by patch.
    Returns (final tokens (B, 1+N, D), per-block [{"q","k","v"}] each
    (B, heads, 1+N, head_dim))."""
    x = L.conv2d(params["patch_embed"], pixels, stride=cfg.patch_size,
                 padding="VALID")
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    pos = params["pos_embed_grid"]
    if pos.shape[:2] != (gh, gw):
        pos = jax.image.resize(pos, (gh, gw, d), "bicubic")
    x = x + pos.reshape(1, gh * gw, d).astype(x.dtype)
    cls = (params["cls_token"] + params["pos_embed_cls"]).astype(x.dtype)
    x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)

    h = cfg.num_heads
    hd = d // h
    qkvs = []
    for blk in params["blocks"]:
        n = x.shape[1]
        hidden = L.layer_norm(blk["ln1"], x, cfg.layer_norm_eps)
        qkv = L.linear(blk["qkv"], hidden)  # (B, n, 3d)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        qkvs.append({"q": q, "k": k, "v": v})
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + L.linear(blk["proj"], o)
        hidden = L.layer_norm(blk["ln2"], x, cfg.layer_norm_eps)
        x = x + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], hidden)))
    x = L.layer_norm(params["ln_final"], x, cfg.layer_norm_eps)
    return x, qkvs


def convert_dino_state_dict(sd: Dict[str, np.ndarray],
                            cfg: DINOConfig = DINO_VITB8) -> Dict:
    """torch.hub dino state dict -> our pytree."""
    d = cfg.hidden_size
    grid = int(np.sqrt(sd["pos_embed"].shape[1] - 1))
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        blocks.append({
            "ln1": {"scale": jnp.asarray(sd[pre + "norm1.weight"]),
                    "bias": jnp.asarray(sd[pre + "norm1.bias"])},
            "qkv": {"kernel": jnp.asarray(sd[pre + "attn.qkv.weight"].T),
                    "bias": jnp.asarray(sd[pre + "attn.qkv.bias"])},
            "proj": {"kernel": jnp.asarray(sd[pre + "attn.proj.weight"].T),
                     "bias": jnp.asarray(sd[pre + "attn.proj.bias"])},
            "ln2": {"scale": jnp.asarray(sd[pre + "norm2.weight"]),
                    "bias": jnp.asarray(sd[pre + "norm2.bias"])},
            "fc1": {"kernel": jnp.asarray(sd[pre + "mlp.fc1.weight"].T),
                    "bias": jnp.asarray(sd[pre + "mlp.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[pre + "mlp.fc2.weight"].T),
                    "bias": jnp.asarray(sd[pre + "mlp.fc2.bias"])},
        })
    return {
        "patch_embed": {
            "kernel": jnp.asarray(np.ascontiguousarray(
                sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"][0, 0]),
        "pos_embed_grid": jnp.asarray(
            sd["pos_embed"][0, 1:].reshape(grid, grid, d)),
        "pos_embed_cls": jnp.asarray(sd["pos_embed"][0, 0]),
        "blocks": blocks,
        "ln_final": {"scale": jnp.asarray(sd["norm.weight"]),
                     "bias": jnp.asarray(sd["norm.bias"])},
    }

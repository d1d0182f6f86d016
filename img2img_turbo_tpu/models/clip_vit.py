"""OpenAI-CLIP (ViT image tower + text tower with projections) in JAX.

Replaces the `clip` pip package the reference uses for the CLIP-similarity
loss (train_pix2pix_turbo.py:76-78,181-187: ViT-B/32, bilinear-resize to
224, ImageNet renorm, `1 - clipsim/100`) and serves as the frozen backbone
of the vision-aided discriminator (models/discriminator.py).

The image tower exposes per-block token features (explicit outputs, no
hooks) so the discriminator taps intermediate levels functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    # text tower
    vocab_size: int = 49408
    text_hidden: int = 512
    text_layers: int = 12
    text_heads: int = 8
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # OpenAI CLIP uses QuickGELU


CLIP_VIT_B32 = CLIPViTConfig()
CLIP_VIT_B16 = CLIPViTConfig(patch_size=16)
TINY_CLIP_VIT = CLIPViTConfig(image_size=64, patch_size=16, hidden_size=32,
                              num_layers=2, num_heads=4,
                              intermediate_size=64, projection_dim=16,
                              vocab_size=1000, text_hidden=32, text_layers=2,
                              text_heads=4)

# ImageNet renorm applied before CLIP-sim (reference
# train_pix2pix_turbo.py:181-184: images arrive in [-1,1])
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _init_block(key, dim: int, mlp_dim: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": L.init_layer_norm(dim),
        "attn": {
            "q": L.init_linear(k1, dim, dim),
            "k": L.init_linear(jax.random.fold_in(k1, 1), dim, dim),
            "v": L.init_linear(jax.random.fold_in(k1, 2), dim, dim),
            "out": L.init_linear(jax.random.fold_in(k1, 3), dim, dim),
        },
        "ln2": L.init_layer_norm(dim),
        "fc1": L.init_linear(k2, dim, mlp_dim),
        "fc2": L.init_linear(k3, mlp_dim, dim),
    }


def _block(p, x, num_heads: int, act, eps: float, causal_bias=None):
    b, s, d = x.shape
    h = L.layer_norm(p["ln1"], x, eps)
    hd = d // num_heads
    q = L.linear(p["attn"]["q"], h).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    k = L.linear(p["attn"]["k"], h).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    v = L.linear(p["attn"]["v"], h).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if causal_bias is not None:
        scores = scores + causal_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + L.linear(p["attn"]["out"], o)
    h = L.layer_norm(p["ln2"], x, eps)
    x = x + L.linear(p["fc2"], act(L.linear(p["fc1"], h)))
    return x


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def init_vision_tower(key, cfg: CLIPViTConfig) -> Dict:
    keys = jax.random.split(key, cfg.num_layers + 4)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "patch_embed": L.init_conv2d(keys[0], 3, cfg.hidden_size,
                                     cfg.patch_size, bias=False),
        "class_embed": jax.random.normal(keys[1], (cfg.hidden_size,)) * 0.02,
        "pos_embed": jax.random.normal(
            keys[2], (n_patches + 1, cfg.hidden_size)) * 0.02,
        "ln_pre": L.init_layer_norm(cfg.hidden_size),
        "blocks": [_init_block(keys[3 + i], cfg.hidden_size,
                               cfg.intermediate_size)
                   for i in range(cfg.num_layers)],
        "ln_post": L.init_layer_norm(cfg.hidden_size),
        "proj": jax.random.normal(
            jax.random.fold_in(key, 99),
            (cfg.hidden_size, cfg.projection_dim)) * cfg.hidden_size ** -0.5,
    }


def vision_forward(params, cfg: CLIPViTConfig, pixels,
                   return_blocks: bool = False
                   ) -> Tuple[jax.Array, Optional[List[jax.Array]]]:
    """pixels: (B, H, W, 3) CLIP-normalized. Returns (image_embedding
    (B, proj_dim), per-block token features [(B, 1+N, D)] if requested)."""
    act = L.ACTIVATIONS[cfg.hidden_act]
    x = L.conv2d(params["patch_embed"], pixels, stride=cfg.patch_size,
                 padding="VALID")
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(params["class_embed"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None].astype(x.dtype)
    x = L.layer_norm(params["ln_pre"], x, cfg.layer_norm_eps)
    blocks_out = []
    for blk in params["blocks"]:
        x = _block(blk, x, cfg.num_heads, act, cfg.layer_norm_eps)
        if return_blocks:
            blocks_out.append(x)
    pooled = L.layer_norm(params["ln_post"], x[:, 0], cfg.layer_norm_eps)
    emb = jnp.dot(pooled, params["proj"].astype(pooled.dtype))
    return emb, (blocks_out if return_blocks else None)


# ---------------------------------------------------------------------------
# Text tower (OpenAI-CLIP style: eos-argmax pooling + projection)
# ---------------------------------------------------------------------------


def init_text_tower(key, cfg: CLIPViTConfig) -> Dict:
    keys = jax.random.split(key, cfg.text_layers + 4)
    return {
        "token_embedding": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.text_hidden)) * 0.02,
        "pos_embed": jax.random.normal(
            keys[1], (cfg.max_positions, cfg.text_hidden)) * 0.01,
        "blocks": [_init_block(keys[2 + i], cfg.text_hidden,
                               cfg.text_hidden * 4)
                   for i in range(cfg.text_layers)],
        "ln_final": L.init_layer_norm(cfg.text_hidden),
        "proj": jax.random.normal(
            jax.random.fold_in(key, 98),
            (cfg.text_hidden, cfg.projection_dim)) * cfg.text_hidden ** -0.5,
    }


def text_forward(params, cfg: CLIPViTConfig, ids) -> jax.Array:
    """ids: (B, 77) int32. Returns (B, proj_dim) text embeddings."""
    act = L.ACTIVATIONS[cfg.hidden_act]
    b, s = ids.shape
    x = params["token_embedding"][ids] + params["pos_embed"][None, :s]
    mask = jnp.tril(jnp.ones((s, s), jnp.bool_))
    bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)
    for blk in params["blocks"]:
        x = _block(blk, x, cfg.text_heads, act, cfg.layer_norm_eps, bias)
    x = L.layer_norm(params["ln_final"], x, cfg.layer_norm_eps)
    eos = jnp.argmax(ids, axis=-1)  # highest id = eot token (CLIP pooling)
    pooled = x[jnp.arange(b), eos]
    return jnp.dot(pooled, params["proj"].astype(pooled.dtype))


# ---------------------------------------------------------------------------
# Full CLIP + similarity loss
# ---------------------------------------------------------------------------


def init_clip(key, cfg: CLIPViTConfig = CLIP_VIT_B32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "vision": init_vision_tower(k1, cfg),
        "text": init_text_tower(k2, cfg),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def renorm_signed_to_clip(x):
    """[-1,1] image -> ImageNet renorm -> CLIP-norm pixels, mirroring the
    reference transform chain (train_pix2pix_turbo.py:181-184)."""
    unit = x * 0.5 + 0.5
    inorm = (unit - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
        IMAGENET_STD, x.dtype)
    # the reference feeds ImageNet-normalized pixels straight into the clip
    # package's model (which was trained with CLIP stats); replicate that.
    return inorm


# ---------------------------------------------------------------------------
# Weight ingestion: OpenAI `ViT-B-32.pt` state dicts (what `clip.load` uses,
# reference train_pix2pix_turbo.py:76) and HF CLIPModel state dicts.
# ---------------------------------------------------------------------------


def _np(x):
    return np.asarray(x)


def _cv_lin(w, b=None):
    p = {"kernel": jnp.asarray(np.ascontiguousarray(_np(w).T))}
    if b is not None:
        p["bias"] = jnp.asarray(_np(b))
    return p


def _cv_norm(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _openai_blocks(sd, prefix, n_layers, width):
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}.resblocks.{i}"
        in_w = _np(sd[bp + ".attn.in_proj_weight"])  # (3W, W)
        in_b = _np(sd[bp + ".attn.in_proj_bias"])
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        blocks.append({
            "ln1": _cv_norm(sd, bp + ".ln_1"),
            "attn": {
                "q": _cv_lin(qw, qb),
                "k": _cv_lin(kw, kb),
                "v": _cv_lin(vw, vb),
                "out": _cv_lin(sd[bp + ".attn.out_proj.weight"],
                               sd[bp + ".attn.out_proj.bias"]),
            },
            "ln2": _cv_norm(sd, bp + ".ln_2"),
            "fc1": _cv_lin(sd[bp + ".mlp.c_fc.weight"],
                           sd[bp + ".mlp.c_fc.bias"]),
            "fc2": _cv_lin(sd[bp + ".mlp.c_proj.weight"],
                           sd[bp + ".mlp.c_proj.bias"]),
        })
    return blocks


def _hf_blocks(sd, prefix, n_layers):
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}.layers.{i}"
        blocks.append({
            "ln1": _cv_norm(sd, bp + ".layer_norm1"),
            "attn": {k: _cv_lin(sd[f"{bp}.self_attn.{n}_proj.weight"],
                                sd[f"{bp}.self_attn.{n}_proj.bias"])
                     for k, n in (("q", "q"), ("k", "k"), ("v", "v"),
                                  ("out", "out"))},
            "ln2": _cv_norm(sd, bp + ".layer_norm2"),
            "fc1": _cv_lin(sd[bp + ".mlp.fc1.weight"],
                           sd[bp + ".mlp.fc1.bias"]),
            "fc2": _cv_lin(sd[bp + ".mlp.fc2.weight"],
                           sd[bp + ".mlp.fc2.bias"]),
        })
    return blocks


def convert_clip_state_dict(sd, cfg: CLIPViTConfig = CLIP_VIT_B32) -> Dict:
    """OpenAI `clip` checkpoint (ViT-B-32.pt state_dict) or HF CLIPModel
    state dict -> {"vision", "text", "logit_scale"} pytree for
    vision_forward/text_forward. Feed ["vision"] to the vision-aided
    discriminator backbone (models/discriminator.py) and the whole tree to
    clip_similarity (reference train_pix2pix_turbo.py:64-78,181-187)."""
    if "visual.proj" in sd:  # OpenAI layout
        vision = {
            "patch_embed": {"kernel": jnp.asarray(np.ascontiguousarray(
                _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)))},
            "class_embed": jnp.asarray(_np(sd["visual.class_embedding"])),
            "pos_embed": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre": _cv_norm(sd, "visual.ln_pre"),
            "blocks": _openai_blocks(sd, "visual.transformer",
                                     cfg.num_layers, cfg.hidden_size),
            "ln_post": _cv_norm(sd, "visual.ln_post"),
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        }
        text = {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "pos_embed": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": _openai_blocks(sd, "transformer", cfg.text_layers,
                                     cfg.text_hidden),
            "ln_final": _cv_norm(sd, "ln_final"),
            "proj": jnp.asarray(_np(sd["text_projection"])),
        }
    elif "visual_projection.weight" in sd:  # HF CLIPModel layout
        vp = "vision_model."
        pre_ln = (vp + "pre_layrnorm" if vp + "pre_layrnorm.weight" in sd
                  else vp + "pre_layernorm")  # HF's historical typo
        vision = {
            "patch_embed": {"kernel": jnp.asarray(np.ascontiguousarray(
                _np(sd[vp + "embeddings.patch_embedding.weight"])
                .transpose(2, 3, 1, 0)))},
            "class_embed": jnp.asarray(
                _np(sd[vp + "embeddings.class_embedding"]).reshape(-1)),
            "pos_embed": jnp.asarray(
                _np(sd[vp + "embeddings.position_embedding.weight"])),
            "ln_pre": _cv_norm(sd, pre_ln),
            "blocks": _hf_blocks(sd, vp + "encoder", cfg.num_layers),
            "ln_post": _cv_norm(sd, vp + "post_layernorm"),
            "proj": jnp.asarray(np.ascontiguousarray(
                _np(sd["visual_projection.weight"]).T)),
        }
        tp = "text_model."
        text = {
            "token_embedding": jnp.asarray(
                _np(sd[tp + "embeddings.token_embedding.weight"])),
            "pos_embed": jnp.asarray(
                _np(sd[tp + "embeddings.position_embedding.weight"])),
            "blocks": _hf_blocks(sd, tp + "encoder", cfg.text_layers),
            "ln_final": _cv_norm(sd, tp + "final_layer_norm"),
            "proj": jnp.asarray(np.ascontiguousarray(
                _np(sd["text_projection.weight"]).T)),
        }
    else:
        raise ValueError(
            "unrecognized CLIP state dict: expected OpenAI ('visual.proj') "
            "or HF CLIPModel ('visual_projection.weight') key layout")
    scale = sd.get("logit_scale", np.log(1.0 / 0.07))
    return {"vision": vision, "text": text,
            "logit_scale": jnp.asarray(float(_np(scale)), jnp.float32)}


def clip_similarity(params, cfg: CLIPViTConfig, images, text_ids):
    """Reference clipsim (train_pix2pix_turbo.py:185-187): cosine sim * 100
    between matched image/text pairs. images: (B,H,W,3) in [-1,1] already
    resized to cfg.image_size (bilinear)."""
    img = renorm_signed_to_clip(images)
    iemb, _ = vision_forward(params["vision"], cfg, img)
    temb = text_forward(params["text"], cfg, text_ids)
    iemb = iemb / jnp.linalg.norm(iemb, axis=-1, keepdims=True)
    temb = temb / jnp.linalg.norm(temb, axis=-1, keepdims=True)
    return 100.0 * jnp.sum(iemb * temb, axis=-1)

"""CLIP text encoder (transformers CLIPTextModel equivalent).

The reference loads `CLIPTextModel.from_pretrained("stabilityai/sd-turbo",
subfolder="text_encoder")` (/root/reference/src/pix2pix_turbo.py:33) — the
OpenCLIP ViT-H text tower trimmed to 23 layers, hidden 1024, 16 heads, exact
GELU — and always consumes output[0] (the final-layer-norm'd last hidden
state) with no padding attention mask (causal mask only), e.g.
pix2pix_turbo.py:191-194. This reimplements exactly that surface.

Prompt embeddings are meant to be computed once and cached (the reference
precomputes them for CycleGAN training, train_cyclegan_turbo.py:140-144);
pipelines here treat them as inputs to the compiled generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.configs import CLIPTextConfig
from img2img_turbo_tpu.models import layers as L


def _init_attn(key, dim: int):
    keys = jax.random.split(key, 4)
    return {
        "q": L.init_linear(keys[0], dim, dim),
        "k": L.init_linear(keys[1], dim, dim),
        "v": L.init_linear(keys[2], dim, dim),
        "out": L.init_linear(keys[3], dim, dim),
    }


def init_clip_text(key, cfg: CLIPTextConfig):
    keys = jax.random.split(key, cfg.num_layers + 3)
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 3)
        layers.append({
            "ln1": L.init_layer_norm(cfg.hidden_size),
            "attn": _init_attn(lk[0], cfg.hidden_size),
            "ln2": L.init_layer_norm(cfg.hidden_size),
            "fc1": L.init_linear(lk[1], cfg.hidden_size,
                                 cfg.intermediate_size),
            "fc2": L.init_linear(lk[2], cfg.intermediate_size,
                                 cfg.hidden_size),
        })
    emb_scale = 0.02
    return {
        "token_embedding": jax.random.normal(
            keys[-2], (cfg.vocab_size, cfg.hidden_size)) * emb_scale,
        "position_embedding": jax.random.normal(
            keys[-1], (cfg.max_position_embeddings, cfg.hidden_size))
        * emb_scale,
        "layers": layers,
        "final_ln": L.init_layer_norm(cfg.hidden_size),
    }


def _attn(p, x, cfg: CLIPTextConfig, causal_bias):
    b, s, d = x.shape
    h = cfg.num_heads
    hd = d // h
    q = L.linear(p["q"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = L.linear(p["k"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = L.linear(p["v"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    scale = hd ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + causal_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    return L.linear(p["out"], o)


def clip_text_forward(params, cfg: CLIPTextConfig, input_ids):
    """input_ids: (B, S) int32 -> (B, S, hidden) last hidden state (final LN
    applied), matching `CLIPTextModel(...)[0]`."""
    b, s = input_ids.shape
    act = L.ACTIVATIONS[cfg.hidden_act]
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][None, :s, :]
    x = x.astype(params["token_embedding"].dtype)

    # causal additive bias, fp32 (transformers uses dtype-min fill)
    mask = jnp.tril(jnp.ones((s, s), jnp.bool_))
    causal_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)

    for layer in params["layers"]:
        x = x + _attn(layer["attn"], L.layer_norm(layer["ln1"], x,
                                                  cfg.layer_norm_eps),
                      cfg, causal_bias)
        h = L.layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        h = L.linear(layer["fc2"], act(L.linear(layer["fc1"], h)))
        x = x + h
    return L.layer_norm(params["final_ln"], x, cfg.layer_norm_eps)

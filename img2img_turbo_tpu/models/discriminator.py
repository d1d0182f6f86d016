"""Vision-aided CLIP discriminator (vision_aided_loss equivalent).

The reference trains against `vision_aided_loss.Discriminator(cv_type='clip',
loss_type='multilevel_sigmoid_s'|'multilevel_sigmoid',
output_type='conv_multi_level')` (train_pix2pix_turbo.py:64-73,
train_cyclegan_turbo.py:45-49): a frozen OpenAI-CLIP ViT-B/32 visual
backbone whose features feed small trainable spectrally-normalized heads at
three levels, with a non-saturating sigmoid GAN loss per level. API parity:
`disc_loss(params, cfg, x, for_G=True / for_real=...)` returning the scalar
loss, like the reference call sites.

Structure mirrors vision_aided_loss's CLIP `conv_multi_level` path:
- input [-1,1] -> *0.5+0.5 -> bicubic resize to 224 -> CLIP-stat normalize
  (the package normalizes internally; distinct from the reference's
  ImageNet renorm used only for the CLIP-sim loss).
- levels: token grids after transformer blocks n/3 and 2n/3 (blocks 4 and 8
  of 12 for ViT-B/32), reshaped to (B, 7, 7, 768), plus the final projected
  image embedding (B, 512).
- heads (MultiLevelDViT): per spatial level
  SN-Conv(768->256, k3, s2, p1) -> LeakyReLU(0.2) -> SN-Conv(256->1, k1);
  for the embedding SN-Linear(512->256) -> LeakyReLU(0.2) -> SN-Linear(256->1).

Spectral norm is torch-style power iteration with persistent `u` vectors.
Because the framework is pure-functional, `u` lives in a separate "sn"
state tree (the torch analog of non-parameter buffers): losses consume it
under stop_gradient, and the train step advances it once per discriminator
pass via `sn_step` — so it is never touched by the optimizer.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from img2img_turbo_tpu.models import clip_vit
from img2img_turbo_tpu.models import layers as L

HEAD_CHANNELS = 256


def tap_indices(cfg: clip_vit.CLIPViTConfig) -> Tuple[int, int]:
    """After-block indices of the two spatial taps (4 and 8 for 12 layers,
    matching vision_aided_loss's CLIP forward hooks)."""
    n = cfg.num_layers
    return (n // 3, (2 * n) // 3 if n > 2 else n - 1)


def _u(key, n: int):
    u = jax.random.normal(key, (n,), jnp.float32)
    return u / jnp.linalg.norm(u)


def init_discriminator(key, cfg: clip_vit.CLIPViTConfig =
                       clip_vit.CLIP_VIT_B32,
                       backbone: Dict = None) -> Dict:
    """backbone: frozen CLIP vision tower params (shared with the clip-sim
    loss when possible); created fresh if None. Returns
    {"backbone", "heads", "sn"}."""
    k1, k2 = jax.random.split(key)
    if backbone is None:
        backbone = clip_vit.init_vision_tower(k1, cfg)
    d = cfg.hidden_size
    hc = HEAD_CHANNELS
    spatial, sn_spatial = [], []
    for i in range(2):
        k2, a, b, ua, ub = jax.random.split(k2, 5)
        spatial.append({
            "conv1": L.init_conv2d(a, d, hc, 3),
            "conv2": L.init_conv2d(b, hc, 1, 1),
        })
        sn_spatial.append({"conv1": _u(ua, hc), "conv2": _u(ub, 1)})
    k2, a, b, ua, ub = jax.random.split(k2, 5)
    heads = {
        "spatial": spatial,
        "final": {
            "lin1": L.init_linear(a, cfg.projection_dim, hc),
            "lin2": L.init_linear(b, hc, 1),
        },
    }
    sn = {"spatial": sn_spatial,
          "final": {"lin1": _u(ua, hc), "lin2": _u(ub, 1)}}
    return {"backbone": backbone, "heads": heads, "sn": sn}


# ---------------------------------------------------------------------------
# Spectral norm (torch parity: weight matrix (O, N), 1 power iteration per
# forward in train mode, eps 1e-12)
# ---------------------------------------------------------------------------

_SN_EPS = 1e-12


def _as_matrix(w) -> jax.Array:
    """HWIO conv / (in, out) linear kernel -> torch-style (O, N) matrix."""
    return w.reshape(-1, w.shape[-1]).T


def _power_iter(w, u):
    mat = _as_matrix(w.astype(jnp.float32))
    v = mat.T @ u
    v = v / (jnp.linalg.norm(v) + _SN_EPS)
    u_new = mat @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + _SN_EPS)
    return u_new, v


def spectral_normalize(w, u):
    """Return w / sigma(w) using the stored left-singular estimate `u`.
    The iteration update happens in `sn_step`; here u is a constant."""
    u = jax.lax.stop_gradient(u)
    mat = _as_matrix(w.astype(jnp.float32))
    v = jax.lax.stop_gradient(mat.T @ u)
    v = v / (jnp.linalg.norm(v) + _SN_EPS)
    sigma = jnp.einsum("i,ij,j->", u, mat, v)
    return (w / sigma.astype(w.dtype)), sigma


def sn_step(heads: Dict, sn: Dict) -> Dict:
    """One power iteration on every head weight (the torch train-mode
    per-forward update). Pure: returns the new sn tree."""
    new_spatial = []
    for hp, up in zip(heads["spatial"], sn["spatial"]):
        new_spatial.append({
            k: _power_iter(hp[k]["kernel"], up[k])[0] for k in ("conv1",
                                                                "conv2")})
    new_final = {k: _power_iter(heads["final"][k]["kernel"],
                                sn["final"][k])[0] for k in ("lin1", "lin2")}
    return jax.lax.stop_gradient(
        {"spatial": new_spatial, "final": new_final})


def _sn_conv(p, u, x, stride=1, padding="SAME"):
    w, _ = spectral_normalize(p["kernel"], u)
    return L.conv2d({"kernel": w, **({"bias": p["bias"]} if "bias" in p
                                     else {})}, x, stride=stride,
                    padding=padding)


def _sn_linear(p, u, x):
    w, _ = spectral_normalize(p["kernel"], u)
    y = jnp.dot(x, w.astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def discriminator_logits(params, cfg: clip_vit.CLIPViTConfig, images
                         ) -> List[jax.Array]:
    """images: (B, H, W, 3) in [-1, 1]; vision_aided preprocessing (bicubic
    224, CLIP stats) on device. Returns per-level logits
    [(B, g', g', 1), (B, g', g', 1), (B, 1)]."""
    x = images.astype(jnp.float32) * 0.5 + 0.5
    if x.shape[1] != cfg.image_size or x.shape[2] != cfg.image_size:
        # vision_aided_loss resizes with torch F.interpolate(bicubic):
        # a=-0.75 cubic, no antialias — exact-parity separable matmul resize
        from img2img_turbo_tpu.ops.image import resize_torch
        x = resize_torch(x, cfg.image_size, cfg.image_size, "bicubic")
    x = (x - jnp.asarray(clip_vit.CLIP_MEAN)) / jnp.asarray(clip_vit.CLIP_STD)
    # frozen backbone: no grads flow into it
    backbone = jax.lax.stop_gradient(params["backbone"])
    emb, blocks = clip_vit.vision_forward(backbone, cfg, x,
                                          return_blocks=True)
    g = cfg.image_size // cfg.patch_size
    heads, sn = params["heads"], params["sn"]
    outs = []
    for head, u, lvl in zip(heads["spatial"], sn["spatial"],
                            tap_indices(cfg)):
        tokens = blocks[lvl][:, 1:, :]  # drop CLS
        b, n, d = tokens.shape
        feat = tokens.reshape(b, g, g, d)
        h = jax.nn.leaky_relu(
            _sn_conv(head["conv1"], u["conv1"], feat, stride=2,
                     padding=((1, 1), (1, 1))), 0.2)
        outs.append(_sn_conv(head["conv2"], u["conv2"], h))
    h = jax.nn.leaky_relu(
        _sn_linear(heads["final"]["lin1"], sn["final"]["lin1"], emb), 0.2)
    outs.append(_sn_linear(heads["final"]["lin2"], sn["final"]["lin2"], h))
    return outs


def disc_loss(params, cfg, images, *, for_G=False, for_real=None,
              smooth: bool = True) -> jax.Array:
    """Multilevel non-saturating sigmoid GAN loss (the reference's
    `multilevel_sigmoid(_s)`; `_s` adds one-sided label smoothing on real).

    - for_G=True: generator loss on fake images: softplus(-logit)
    - for_real=True: discriminator real loss: softplus(-logit) [smoothed]
    - for_real=False: discriminator fake loss: softplus(logit)
    Returns scalar (sum of per-level means, matching the reference's
    per-level sum reduction).
    """
    logits = discriminator_logits(params, cfg, images)
    total = 0.0
    for lg in logits:
        lg = lg.astype(jnp.float32)
        if for_G:
            loss = jax.nn.softplus(-lg)
        elif for_real:
            if smooth:
                # one-sided smoothing: target 0.9 -> 0.9*sp(-x) + 0.1*sp(x)
                loss = 0.9 * jax.nn.softplus(-lg) + 0.1 * jax.nn.softplus(lg)
            else:
                loss = jax.nn.softplus(-lg)
        else:
            loss = jax.nn.softplus(lg)
        total = total + jnp.mean(loss)
    return total


def head_params(params) -> Dict:
    """Trainable subtree (the heads; backbone and sn state stay out of the
    optimizer)."""
    return params["heads"]

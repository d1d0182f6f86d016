"""Vision-aided CLIP discriminator (vision_aided_loss equivalent).

The reference trains against `vision_aided_loss.Discriminator(cv_type='clip',
loss_type='multilevel_sigmoid_s'|'multilevel_sigmoid',
output_type='conv_multi_level')` (train_pix2pix_turbo.py:64-73,
train_cyclegan_turbo.py:45-49): a frozen CLIP ViT vision backbone whose
intermediate token grids feed small trainable conv heads at multiple depths,
with a non-saturating sigmoid GAN loss per level. API parity:
`disc(params, x, for_G=True)` / `for_real=True/False` returning the scalar
loss, like the reference call sites.

Deviation noted: the torch package spectrally normalizes head convs; here
heads are plain convs with a smaller lr recommended instead (spectral-norm
power iteration is stateful and interacts poorly with pure-functional jit;
revisit if GAN stability requires it). The "_s" loss variant's label
smoothing is implemented.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import clip_vit
from img2img_turbo_tpu.models import layers as L

# which backbone blocks feed heads (vision_aided taps shallow/mid/deep)
LEVEL_FRACTIONS = (0.25, 0.5, 1.0)


def init_discriminator(key, cfg: clip_vit.CLIPViTConfig =
                       clip_vit.CLIP_VIT_B32,
                       backbone: Dict = None) -> Dict:
    """backbone: frozen CLIP vision tower params (shared with the clip-sim
    loss when possible); created fresh if None."""
    k1, k2 = jax.random.split(key)
    if backbone is None:
        backbone = clip_vit.init_vision_tower(k1, cfg)
    d = cfg.hidden_size
    heads = []
    for i in range(len(LEVEL_FRACTIONS)):
        k2, a, b = jax.random.split(k2, 3)
        heads.append({
            "ln": L.init_layer_norm(d),
            "conv1": L.init_conv2d(a, d, d // 2, 3),
            "conv2": L.init_conv2d(b, d // 2, 1, 1),
        })
    return {"backbone": backbone, "heads": heads}


def _levels(cfg: clip_vit.CLIPViTConfig) -> List[int]:
    n = cfg.num_layers
    return [max(0, min(n - 1, int(round(f * n)) - 1))
            for f in LEVEL_FRACTIONS]


def discriminator_logits(params, cfg: clip_vit.CLIPViTConfig, images
                         ) -> List[jax.Array]:
    """images: (B, H, W, 3) in [-1, 1]; resized to the backbone's input size
    on device. Returns per-level logit maps [(B, g, g, 1)]."""
    x = clip_vit.renorm_signed_to_clip(images)
    if x.shape[1] != cfg.image_size:
        x = jax.image.resize(
            x, (x.shape[0], cfg.image_size, cfg.image_size, 3), "bilinear")
    # frozen backbone: no grads flow into it
    backbone = jax.lax.stop_gradient(params["backbone"])
    _, blocks = clip_vit.vision_forward(backbone, cfg, x, return_blocks=True)
    g = cfg.image_size // cfg.patch_size
    outs = []
    for head, lvl in zip(params["heads"], _levels(cfg)):
        tokens = blocks[lvl][:, 1:, :]  # drop CLS
        b, n, d = tokens.shape
        feat = L.layer_norm(head["ln"], tokens).reshape(b, g, g, d)
        h = jax.nn.leaky_relu(L.conv2d(head["conv1"], feat), 0.2)
        outs.append(L.conv2d(head["conv2"], h))
    return outs


def disc_loss(params, cfg, images, *, for_G=False, for_real=None,
              smooth: bool = True) -> jax.Array:
    """Multilevel non-saturating sigmoid GAN loss (the reference's
    `multilevel_sigmoid(_s)`; `_s` adds one-sided label smoothing on real).

    - for_G=True: generator loss on fake images: softplus(-logit)
    - for_real=True: discriminator real loss: softplus(-logit) [smoothed]
    - for_real=False: discriminator fake loss: softplus(logit)
    Returns scalar (mean over levels, pixels, batch — summed per level to
    match the reference's per-level sum reduction).
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
    """Trainable subtree (the heads; backbone stays frozen)."""
    return params["heads"]

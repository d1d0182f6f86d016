"""DINO-Structure preservation metric.

Equivalent of the reference's `DinoStructureLoss`
(src/my_utils/dino_struct.py:161-185): per image, the self-cosine-similarity
map of DINO ViT-B/8 *keys* at the last block (layer 11), MSE between the
input image's map and the translated image's map. Per-block keys come as
explicit outputs of models/dino.py — no hooks.

Protocol parity: the reference preprocess is
`torchvision.transforms.Resize(224)` + ToTensor + Normalize
(dino_struct.py:171-175) — Resize with an int size is SHORT-side-224 with
aspect ratio preserved (bilinear on PIL input), NOT a square squash;
non-square images stay non-square and the ViT runs on the resulting
(224, W') grid (patch conv floors, pos embed interpolated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import dino as dino_mod


def _attn_cosine_sim(x, eps: float = 1e-08):
    """x: (1, 1, tokens, feats) -> (1, tokens, tokens) cosine-sim map
    (reference attn_cosine_sim, dino_struct.py:156-166)."""
    x = x[0]  # (1, tokens, feats)
    norm1 = jnp.linalg.norm(x, axis=2, keepdims=True)
    factor = jnp.clip(norm1 @ norm1.transpose(0, 2, 1), a_min=eps)
    sim_matrix = (x @ x.transpose(0, 2, 1)) / factor
    return sim_matrix


def keys_self_sim(params, cfg: dino_mod.DINOConfig, image_unit,
                  layer_num: int = 11):
    """image_unit: (1, 224, 224, 3) in [0, 1]. Returns (1, T, T) self-sim
    of layer-`layer_num` keys (head-concatenated, incl. cls token)."""
    x = (image_unit - jnp.asarray(dino_mod.IMAGENET_MEAN, image_unit.dtype)
         ) / jnp.asarray(dino_mod.IMAGENET_STD, image_unit.dtype)
    _, qkvs = dino_mod.dino_forward(params, cfg, x)
    # layer 11 on the 12-block ViT-B/8 (dino_struct.py:178-185); clamp for
    # smaller test configs
    k = qkvs[min(layer_num, len(qkvs) - 1)]["k"]  # (1, heads, T, hd)
    b, h, t, hd = k.shape
    keys = k.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
    return _attn_cosine_sim(keys[None][0][None])


def dino_struct_distance(params, cfg, src_unit, out_unit,
                         layer_num: int = 11):
    """MSE between the two self-sim maps (dino_struct.py:178-185)."""
    a = keys_self_sim(params, cfg, src_unit, layer_num)
    b = keys_self_sim(params, cfg, out_unit, layer_num)
    return jnp.mean(jnp.square(a - b))


class DinoStructureLoss:
    """API-parity wrapper (reference dino_struct.py:169-185)."""

    def __init__(self, params=None, cfg: dino_mod.DINOConfig =
                 dino_mod.DINO_VITB8):
        self.cfg = cfg
        self.params = params if params is not None else dino_mod.init_dino(
            jax.random.PRNGKey(0), cfg)
        self._fn = jax.jit(lambda a, b: dino_struct_distance(
            self.params, self.cfg, a, b))

    def preprocess(self, pil_image, size: int = 224):
        """torchvision `Resize(224)` parity: short side -> 224, aspect
        preserved, bilinear (torchvision calls PIL.resize with BILINEAR on
        PIL inputs; long side = int(size * long / short), truncated —
        torchvision _compute_resized_output_size semantics)."""
        import numpy as np
        from PIL import Image
        img = pil_image.convert("RGB")
        w, h = img.size
        if w <= h:
            new_w, new_h = size, int(size * h / w)
        else:
            new_w, new_h = int(size * w / h), size
        img = img.resize((new_w, new_h), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        return jnp.asarray(arr)[None]

    def calculate_global_ssim_loss(self, outputs, inputs) -> float:
        return float(self._fn(inputs, outputs))

"""Unpaired training-time evaluation: FID (a2b, b2a) + DINO-Struct.

Mirrors the reference's validation pass (train_cyclegan_turbo.py:89-125 —
reference FID stats cached from the val-transformed test sets — and
:311-379 — translate every test image, save PNGs, FID vs cached mu/Sigma,
per-image DINO-Struct).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def cache_reference_fid_stats(inception_params, image_paths: List[str],
                              transform, out_dir: str, tag: str
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Save val-transformed reference images + return (mu, sigma)
    (reference train_cyclegan_turbo.py:93-125)."""
    from PIL import Image
    from img2img_turbo_tpu.metrics import fid as fid_mod

    ref_dir = os.path.join(out_dir, f"fid_reference_{tag}")
    os.makedirs(ref_dir, exist_ok=True)
    imgs = []
    for path in sorted(image_paths):
        outf = os.path.join(
            ref_dir, os.path.basename(path).replace(".jpg", ".png"))
        if not os.path.exists(outf):
            transform(Image.open(path).convert("RGB")).save(outf)
        imgs.append(np.asarray(Image.open(outf).convert("RGB"), np.uint8))
    feats = fid_mod.features_from_images(inception_params, imgs)
    return fid_mod.compute_stats(feats)


def evaluate_direction(fwd_fn, image_paths: List[str], transform,
                       inception_params, ref_stats, dino,
                       out_dir: str, tag: str, step: int,
                       max_images: int = -1) -> Dict[str, float]:
    """Translate every test image; FID vs cached stats + mean DINO-Struct.

    fwd_fn(signed_image (1,H,W,3)) -> translated (1,H,W,3) in [-1,1].
    dino: DinoStructureLoss instance or None.
    """
    from PIL import Image
    from img2img_turbo_tpu.metrics import fid as fid_mod

    viz_dir = os.path.join(out_dir, f"fid-{step}", f"samples_{tag}")
    os.makedirs(viz_dir, exist_ok=True)
    outputs, dino_scores = [], []
    paths = sorted(image_paths)
    if max_images > 0:
        paths = paths[:max_images]
    for path in paths:
        src = transform(Image.open(path).convert("RGB"))
        arr = np.asarray(src, np.float32) / 127.5 - 1.0
        out = np.asarray(fwd_fn(jnp.asarray(arr)[None]))[0]
        out_u8 = np.clip((out * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(out_u8).save(os.path.join(
            viz_dir, os.path.basename(path).replace(".jpg", ".png")))
        outputs.append(out_u8)
        if dino is not None:
            a = dino.preprocess(src)
            b = dino.preprocess(Image.fromarray(out_u8))
            dino_scores.append(dino.calculate_global_ssim_loss(b, a))
    feats = fid_mod.features_from_images(inception_params, outputs)
    mu, sigma = fid_mod.compute_stats(feats)
    metrics = {f"fid_{tag}": fid_mod.frechet_distance(
        mu, sigma, ref_stats[0], ref_stats[1])}
    if dino_scores:
        metrics[f"dino_struct_{tag}"] = float(np.mean(dino_scores))
    return metrics

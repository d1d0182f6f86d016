"""FID computation (clean-fid protocol equivalents).

Host-side statistics in float64 numpy (mu/Sigma + Frechet distance with
scipy sqrtm), device-side InceptionV3 features. The reference uses
clean-fid's `get_folder_features` + `frechet_distance` / `fid_from_feats`
(train_cyclegan_turbo.py:103-125,339-376; train_pix2pix_turbo.py:152-163,
291-296). The "clean" resize discipline — PIL bicubic to 299x299 on the
uint8 image before normalization — is preserved via resize_fn.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.metrics import inception as inc


def clean_resize_299(img_u8: np.ndarray) -> np.ndarray:
    """clean-fid resize: PIL bicubic per channel to 299x299 in float32
    'F' mode — no uint8 re-quantization of the filter output (clean-fid's
    build_resizer "clean" protocol)."""
    from PIL import Image
    out = np.empty((299, 299, 3), np.float32)
    for c in range(3):
        ch = Image.fromarray(img_u8[..., c].astype(np.float32), mode="F")
        out[..., c] = np.asarray(
            ch.resize((299, 299), Image.BICUBIC), np.float32)
    return out / 255.0


def features_from_images(params, images_u8: Iterable[np.ndarray],
                         batch_size: int = 8) -> np.ndarray:
    """images_u8: iterable of (H, W, 3) uint8. Returns (N, 2048) float64."""
    fn = inc.make_feature_fn(params)
    feats = []
    batch = []
    for img in images_u8:
        batch.append(clean_resize_299(img))
        if len(batch) == batch_size:
            feats.append(np.asarray(fn(jnp.asarray(np.stack(batch)))))
            batch = []
    if batch:
        # pad the tail to the full batch to avoid a second compile
        n = len(batch)
        while len(batch) < batch_size:
            batch.append(batch[-1])
        feats.append(np.asarray(fn(jnp.asarray(np.stack(batch))))[:n])
    return np.concatenate(feats).astype(np.float64)


def compute_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return np.mean(feats, axis=0), np.cov(feats, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Standard FID Frechet distance (host, float64, scipy sqrtm)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_feats(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, s1 = compute_stats(feats1)
    mu2, s2 = compute_stats(feats2)
    return frechet_distance(mu1, s1, mu2, s2)

"""On-device image ops + host-side PIL helpers.

The serving path is uint8-in/uint8-out on TPU (BASELINE.json north star):
normalization, resizing and edge extraction run as JAX ops inside the
compiled generator. Host-side PIL (LANCZOS) helpers mirror the reference's
file IO exactly where metric parity demands it (FID resize discipline,
reference src/my_utils/training_utils.py:184-215, inference_paired.py:38-41).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# dtype / range conversions (device)
# ---------------------------------------------------------------------------


def uint8_to_unit(x):
    """uint8 [0,255] -> float [0,1]."""
    return x.astype(jnp.float32) / 255.0


def uint8_to_signed(x):
    """uint8 [0,255] -> float [-1,1] (transforms.Normalize(0.5, 0.5))."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def signed_to_uint8(x):
    """float [-1,1] -> uint8, matching ToPILImage(out*0.5+0.5) rounding."""
    y = (jnp.clip(x, -1.0, 1.0) * 0.5 + 0.5) * 255.0
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def unit_to_uint8(x):
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# torch-parity separable resize (device, MXU-friendly matmuls)
# ---------------------------------------------------------------------------


def _torch_resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out, in) interpolation matrix reproducing torch
    `F.interpolate(mode=..., align_corners=False)` exactly: half-pixel
    source centers, NO antialias (taps stay fixed-width on downscale),
    border handled by index clamping. mode: "bilinear" | "bicubic"
    (cubic convolution a=-0.75, torch/OpenCV convention — note PIL and
    jax.image use a=-0.5, which does NOT match)."""
    scale = in_size / out_size
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    W = np.zeros((out_size, in_size), np.float64)
    if mode == "bilinear":
        base = np.floor(centers).astype(np.int64)
        frac = centers - base
        for tap, wgt in ((base, 1.0 - frac), (base + 1, frac)):
            np.add.at(W, (np.arange(out_size), np.clip(tap, 0, in_size - 1)),
                      wgt)
    elif mode == "bicubic":
        a = -0.75

        def k(t):
            t = np.abs(t)
            return np.where(
                t <= 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
                np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0))

        base = np.floor(centers).astype(np.int64)
        for j in range(-1, 3):
            tap = base + j
            wgt = k(centers - tap)
            np.add.at(W, (np.arange(out_size), np.clip(tap, 0, in_size - 1)),
                      wgt)
    else:
        raise ValueError(mode)
    return W.astype(np.float32)


def resize_torch(x, height: int, width: int, mode: str = "bicubic"):
    """NHWC resize with exact torch F.interpolate(align_corners=False)
    numerics as two dense matmuls (static-shape, rides the MXU). Used where
    the reference resizes activations with torch: vision_aided discriminator
    preprocessing and the CLIP-sim loss."""
    b, h, w, c = x.shape
    wh = jnp.asarray(_torch_resize_matrix(h, height, mode), x.dtype)
    ww = jnp.asarray(_torch_resize_matrix(w, width, mode), x.dtype)
    y = jnp.einsum("Oh,bhwc->bOwc", wh, x)
    return jnp.einsum("Ww,bhwc->bhWc", ww, y)


# ---------------------------------------------------------------------------
# resize / crop (device)
# ---------------------------------------------------------------------------


def resize(x, height: int, width: int, method: str = "lanczos3",
           antialias: bool = True):
    """NHWC resize. 'lanczos3' approximates PIL LANCZOS."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method=method,
                            antialias=antialias)


def center_crop(x, size: int):
    b, h, w, c = x.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top:top + size, left:left + size, :]


def crop_to_multiple(h: int, w: int, m: int = 8):
    """New (h, w) rounded down to multiples of m (reference
    inference_paired.py:39-41)."""
    return h - h % m, w - w % m


# ---------------------------------------------------------------------------
# host-side PIL helpers (file IO parity)
# ---------------------------------------------------------------------------


def load_image_pil(path: str):
    from PIL import Image
    return Image.open(path).convert("RGB")


def pil_resize_lanczos(img, width: int, height: int):
    from PIL import Image
    return img.resize((width, height), Image.LANCZOS)


def pil_to_numpy(img) -> np.ndarray:
    return np.asarray(img, dtype=np.uint8)


def numpy_to_pil(arr: np.ndarray):
    from PIL import Image
    return Image.fromarray(arr)

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

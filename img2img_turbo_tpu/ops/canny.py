"""On-device Canny edge detection (cv2.Canny equivalent).

The reference shells out to OpenCV's C++ Canny on host
(/root/reference/src/image_prep.py:6-12). Here the whole pipeline —
Sobel gradients, per-pixel max-magnitude channel selection, quantized
non-maximum suppression, double threshold, and hysteresis by iterated
masked dilation to fixpoint — runs as XLA ops on TPU so edge_to_image
stays uint8-in/uint8-out on device.

Algorithm parity notes (cv2.Canny defaults): 3x3 Sobel with REFLECT_101
borders, L1 gradient magnitude (L2gradient=False), multi-channel input
takes the channel with the largest magnitude per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


def _sobel(x):
    """x: (B, H, W) -> (gx, gy) with REFLECT_101 padding."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    xp = xp[:, :, :, None]

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img, k[:, :, None, None], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    return conv(xp, _SOBEL_X), conv(xp, _SOBEL_Y)


def _shift(x, dy: int, dx: int):
    """Shift with zero padding: out[y, x] = in[y+dy, x+dx]."""
    return jnp.roll(x, (-dy, -dx), axis=(1, 2)) * _edge_mask(x.shape, dy, dx)


@functools.lru_cache(maxsize=None)
def _edge_mask_np(shape, dy, dx):
    import numpy as np
    m = np.ones(shape[1:], np.float32)
    if dy > 0:
        m[-dy:, :] = 0
    elif dy < 0:
        m[:-dy, :] = 0
    if dx > 0:
        m[:, -dx:] = 0
    elif dx < 0:
        m[:, :-dx] = 0
    return m


def _edge_mask(shape, dy, dx):
    return jnp.asarray(_edge_mask_np(tuple(shape), dy, dx))


def canny(image_u8, low_threshold: float = 100.0,
          high_threshold: float = 200.0, max_hysteresis_iters: int = 64):
    """cv2.Canny-equivalent on device.

    image_u8: (B, H, W, C) uint8 (C=1 or 3). Returns (B, H, W) uint8 edge
    map in {0, 255}.
    """
    x = image_u8.astype(jnp.float32)
    b, h, w, c = x.shape

    # per-channel Sobel; pick the channel with the largest L1 magnitude
    gx_c, gy_c = [], []
    for ch in range(c):
        gx, gy = _sobel(x[..., ch])
        gx_c.append(gx)
        gy_c.append(gy)
    gx = jnp.stack(gx_c, -1)
    gy = jnp.stack(gy_c, -1)
    mag_c = jnp.abs(gx) + jnp.abs(gy)
    best = jnp.argmax(mag_c, axis=-1, keepdims=True)
    gx = jnp.take_along_axis(gx, best, -1)[..., 0]
    gy = jnp.take_along_axis(gy, best, -1)[..., 0]
    mag = jnp.abs(gx) + jnp.abs(gy)

    # quantized NMS (cv2 fixed-point tan(22.5)/tan(67.5) binning)
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22 = 0.4142135623730951
    tg67 = 2.414213562373095
    horiz = ay < ax * tg22                       # gradient ~ horizontal
    vert = ay > ax * tg67                        # gradient ~ vertical
    diag = ~(horiz | vert)
    same_sign = (gx * gy) >= 0                   # 45-deg vs 135-deg diagonal

    m_l, m_r = _shift(mag, 0, -1), _shift(mag, 0, 1)
    m_u, m_d = _shift(mag, -1, 0), _shift(mag, 1, 0)
    m_ul, m_dr = _shift(mag, -1, -1), _shift(mag, 1, 1)
    m_ur, m_dl = _shift(mag, -1, 1), _shift(mag, 1, -1)

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    keep_d1 = (mag > m_ul) & (mag >= m_dr)       # gradient along main diag
    keep_d2 = (mag > m_ur) & (mag >= m_dl)
    keep = jnp.where(horiz, keep_h,
                     jnp.where(vert, keep_v,
                               jnp.where(same_sign, keep_d1, keep_d2)))
    keep = keep & (diag | horiz | vert)

    strong = keep & (mag > high_threshold)
    weak = keep & (mag > low_threshold)

    # hysteresis: grow strong into weak (8-connectivity) to fixpoint
    def dilate(m):
        mf = m.astype(jnp.float32)[..., None]
        k = jnp.ones((3, 3, 1, 1), jnp.float32)
        out = jax.lax.conv_general_dilated(
            mf, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
        return out > 0

    def cond(state):
        i, cur, changed = state
        return changed & (i < max_hysteresis_iters)

    def body(state):
        i, cur, _ = state
        grown = weak & dilate(cur)
        new = cur | grown
        return i + 1, new, jnp.any(new != cur)

    _, edges, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), strong, jnp.bool_(True)))
    return (edges * 255).astype(jnp.uint8)


def canny_3ch_unit(image_u8, low_threshold: float = 100.0,
                   high_threshold: float = 200.0):
    """Reference canny_from_pil + ToTensor: 3-channel replicated edge map in
    [0, 1] float (image_prep.py:8-11, inference_paired.py:49-50)."""
    e = canny(image_u8, low_threshold, high_threshold)
    e = e.astype(jnp.float32) / 255.0
    return jnp.repeat(e[..., None], 3, axis=-1)

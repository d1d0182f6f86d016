"""Validate + benchmark the upsample/downsample Pallas kernels on-chip.

Usage: python scripts/bench_updown.py [shape_idx ...]
Same module-event p50 basis as bench_fused_conv.py. Correctness is vs the
XLA composition (nearest-upsample+SAME conv / stride-2 conv).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.ops import fused_conv
from img2img_turbo_tpu.utils.profiling import device_time_per_call

# (kind, B, H, W, Cin, Cout) — H/W are INPUT dims
SHAPES = [
    ("up", 1, 64, 64, 512, 512),     # VAE dec up0
    ("up", 1, 128, 128, 512, 512),   # VAE dec up1
    ("up", 1, 256, 256, 256, 256),   # VAE dec up2
    ("down", 1, 512, 512, 128, 128),  # VAE enc down1
    ("down", 1, 256, 256, 256, 256),  # VAE enc down2
    ("down", 1, 128, 128, 512, 512),  # VAE enc down3
    ("up", 8, 64, 64, 512, 512),     # b8 up0
    ("up", 8, 128, 128, 512, 512),   # b8 up1
    ("up", 8, 256, 256, 256, 256),   # b8 up2
    ("down", 8, 128, 128, 512, 512),  # b8 enc down3
    ("up", 1, 16, 16, 1280, 1280),   # UNet up 16->32
    ("up", 8, 16, 16, 1280, 1280),   # b8 UNet up
]


def run(idx):
    kind, b, h, wd, c, co = SHAPES[idx]
    rng = np.random.RandomState(idx)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, h, wd, c), dt)
    w = jnp.asarray(rng.randn(3, 3, c, co) * 0.05, dt)
    cb = jnp.asarray(rng.randn(co) * 0.1, dt)

    if kind == "up":
        if not fused_conv.upsample_supported(x.shape, co):
            print(f"[{idx}] {SHAPES[idx]}: UNSUPPORTED")
            return

        @jax.jit
        def fused(x, w, cb):
            y, _ = fused_conv.upsample2x_conv3x3(x, w, cb)
            return y

        @jax.jit
        def ref(x, w, cb):
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            y = jax.lax.conv_general_dilated(
                up, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)
            return y + cb

        gflop = 2 * b * (2 * h) * (2 * wd) * 4 * c * co / 1e9
    else:
        if not fused_conv.downsample_supported(x.shape, co):
            print(f"[{idx}] {SHAPES[idx]}: UNSUPPORTED")
            return

        @jax.jit
        def fused(x, w, cb):
            y, _ = fused_conv.downsample2x_conv3x3(x, w, cb, pad_lo=0)
            return y

        @jax.jit
        def ref(x, w, cb):
            y = jax.lax.conv_general_dilated(
                x, w, (2, 2), [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)
            return y + cb

        gflop = 2 * b * (h // 2) * (wd // 2) * 9 * c * co / 1e9

    y_ref = np.asarray(ref(x, w, cb), np.float32)
    y_fused = np.asarray(fused(x, w, cb), np.float32)
    err = np.abs(y_fused - y_ref)
    rel = err / (np.abs(y_ref) + 1e-2)
    ok = np.median(rel) < 0.02 and np.mean(rel) < 0.05
    print(f"[{idx}] {SHAPES[idx]}: max_abs={err.max():.4f} "
          f"med_rel={np.median(rel):.5f} {'OK' if ok else 'FAIL'}")
    if not ok:
        return
    args = (x, w, cb)
    sf = device_time_per_call(fused, args, iters=20)
    sx = device_time_per_call(ref, args, iters=20)
    t_f = sf.get("device_p50_per_call_s") \
        or sf["device_busy_total_s"] / sf["iters"]
    t_x = sx.get("device_p50_per_call_s") \
        or sx["device_busy_total_s"] / sx["iters"]
    print(f"   fused {t_f*1e6:8.1f} us  {gflop/t_f/1e3:6.1f} TF/s   "
          f"xla {t_x*1e6:8.1f} us  {gflop/t_x/1e3:6.1f} TF/s   "
          f"speedup {t_x/t_f:.2f}x")


if __name__ == "__main__":
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SHAPES)))
    for i in idxs:
        run(i)

"""Validate + benchmark ops/fused_conv.py on the real TPU chip.

Usage: python scripts/bench_fused_conv.py [shape_idx ...]
Runs correctness (vs the XLA GN+SiLU+conv reference) and device-time perf
for each selected hot shape. Run a few shapes per process — the remote
compile tunnel gets flaky when many big compiles pile into one process.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.ops import fused_conv
from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs
from img2img_turbo_tpu.models import layers as L
from img2img_turbo_tpu.utils.profiling import device_time_per_call

# (B, H, W, Cin, Cout, with_temb, with_residual) — the resnet-body hot set
SHAPES = [
    (1, 64, 64, 512, 512, False, True),     # VAE dec up0 / mid
    (1, 128, 128, 512, 512, False, True),   # VAE dec up1
    (1, 256, 256, 512, 256, False, False),  # VAE dec up2 entry
    (1, 256, 256, 256, 256, False, True),
    (1, 512, 512, 256, 128, False, False),  # VAE dec up3 entry
    (1, 512, 512, 128, 128, False, True),
    (1, 64, 64, 320, 320, True, True),      # UNet level 0
    (1, 32, 32, 640, 640, True, True),      # UNet level 1
    (1, 16, 16, 1280, 1280, True, True),    # UNet level 2
    (1, 8, 8, 1280, 1280, True, True),      # UNet mid
    (8, 64, 64, 512, 512, False, True),     # batch-8 serving
    (4, 66, 88, 320, 320, True, True),      # odd-spatial (bird 528x704)
    (8, 16, 16, 1280, 1280, True, True),    # b8 UNet level 2
    (8, 32, 32, 640, 640, True, True),      # b8 UNet level 1
    (8, 8, 8, 1280, 1280, True, True),      # b8 UNet mid
    (8, 64, 64, 320, 320, True, True),      # b8 UNet level 0
    (8, 128, 128, 512, 512, False, True),   # b8 VAE dec up1
    (8, 256, 256, 256, 256, False, True),   # b8 VAE dec up2
    (8, 512, 512, 128, 128, False, True),   # b8 VAE dec up3
    (8, 512, 512, 256, 128, False, False),  # b8 VAE dec up3 entry
]

NG, EPS = 32, 1e-6


def xla_ref(x, scale, bias, w, cb, eb, res):
    h = L.group_norm({"scale": scale, "bias": bias}, x, NG, EPS)
    y = L.conv2d({"kernel": w, "bias": cb}, L.silu(h))
    if eb is not None:
        y = y + eb[:, None, None, :].astype(y.dtype)
    if res is not None:
        y = y + res
    return y


def run(idx):
    b, h, wd, c, co, temb, resid = SHAPES[idx]
    rng = np.random.RandomState(idx)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, h, wd, c), dt) * 2
    w = jnp.asarray(rng.randn(3, 3, c, co) * 0.05, dt)
    cb = jnp.asarray(rng.randn(co) * 0.1, dt)
    scale = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    eb = jnp.asarray(rng.randn(b, co), dt) if temb else None
    res = jnp.asarray(rng.randn(b, h, wd, co), dt) if resid else None

    if not fused_conv.supported(x.shape, co):
        print(f"[{idx}] {SHAPES[idx]}: UNSUPPORTED by tile picker")
        return

    @jax.jit
    def fused(x, scale, bias, w, cb, eb, res):
        a, bt = group_norm_coeffs(x, scale, bias, NG, EPS)
        y, _ = fused_conv.fused_gn_silu_conv3x3(
            x, w, cb, a=a, b=bt, extra_bias=eb, residual=res)
        return y

    y_ref = np.asarray(jax.jit(xla_ref)(x, scale, bias, w, cb, eb, res),
                       np.float32)
    y_fused = np.asarray(fused(x, scale, bias, w, cb, eb, res), np.float32)
    err = np.abs(y_fused - y_ref)
    rel = err / (np.abs(y_ref) + 1e-2)
    ok = np.median(rel) < 0.02 and np.mean(rel) < 0.05
    print(f"[{idx}] {SHAPES[idx]}: max_abs={err.max():.4f} "
          f"med_rel={np.median(rel):.5f} mean_rel={np.mean(rel):.5f} "
          f"{'OK' if ok else 'FAIL'}")
    if not ok:
        bad = np.unravel_index(np.argmax(err), err.shape)
        print("   worst at", bad, "fused", y_fused[bad], "ref", y_ref[bad])
        return

    gflop = 2 * b * h * wd * 9 * c * co / 1e9
    args = (x, scale, bias, w, cb, eb, res)
    # busy = summed device-op durations / iters: for the fused path (one
    # pallas op + tiny gn prologue) this is the true kernel time and is
    # immune to the per-dispatch tunnel latency that pollutes span-based
    # timing on small kernels; span is reported for reference
    sf = device_time_per_call(fused, args, iters=20)
    sx = device_time_per_call(jax.jit(xla_ref), args, iters=20)
    # module-event p50 (one event per call) is the trustworthy basis on
    # this rig (docs/perf_journal.md 2026-08-19); busy kept for continuity
    t_f = sf.get("device_p50_per_call_s") \
        or sf["device_busy_total_s"] / sf["iters"]
    t_x = sx.get("device_p50_per_call_s") \
        or sx["device_busy_total_s"] / sx["iters"]
    b_f = sf["device_busy_total_s"] / sf["iters"]
    b_x = sx["device_busy_total_s"] / sx["iters"]
    print(f"   fused {t_f*1e6:8.1f} us  {gflop/t_f/1e3:6.1f} TF/s   "
          f"xla {t_x*1e6:8.1f} us  {gflop/t_x/1e3:6.1f} TF/s   "
          f"speedup {t_x/t_f:.2f}x   "
          f"(busy {b_f*1e6:.1f}/{b_x*1e6:.1f})")


if __name__ == "__main__":
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SHAPES)))
    for i in idxs:
        run(i)

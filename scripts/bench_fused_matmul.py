"""Validate + benchmark ops/fused_matmul.py on the real TPU chip.

Usage: python scripts/bench_fused_matmul.py [shape_idx ...]
Runs correctness (vs the pure-XLA _ref composition) and device-time perf
for each selected transformer-glue hot shape (the 512^2 / b8 UNet levels
plus the VAE mid-attention). Run a few shapes per process — the remote
compile tunnel gets flaky when many big compiles pile into one process.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.ops import fused_matmul as fm
from img2img_turbo_tpu.utils.profiling import device_time_per_call

# (name, B, S, C, Co, n_w, ln, residual, gate)
SHAPES = [
    ("L0 qkv",      1, 4096, 320, 320, 3, True, False, False),
    ("L0 geglu",    1, 4096, 320, 1280, 1, True, False, True),
    ("L0 ff-out",   1, 4096, 1280, 320, 1, False, True, False),
    ("L0 proj",     1, 4096, 320, 320, 1, False, True, False),
    ("L1 qkv",      1, 1024, 640, 640, 3, True, False, False),
    ("L1 geglu",    1, 1024, 640, 2560, 1, True, False, True),
    ("L1 ff-out",   1, 1024, 2560, 640, 1, False, True, False),
    ("L2 qkv",      1, 256, 1280, 1280, 3, True, False, False),
    ("L2 geglu",    1, 256, 1280, 5120, 1, True, False, True),
    ("L2 ff-out",   1, 256, 5120, 1280, 1, False, True, False),
    ("L2 cross-kv", 1, 77, 1024, 1280, 2, False, False, False),
    ("VAE qkv",     1, 4096, 512, 512, 3, False, False, False),
    ("b8 L0 qkv",   8, 4096, 320, 320, 3, True, False, False),
    ("b8 L0 geglu", 8, 4096, 320, 1280, 1, True, False, True),
    ("b8 L2 geglu", 8, 256, 1280, 5120, 1, True, False, True),
    ("b8 VAE qkv",  8, 4096, 512, 512, 3, False, False, False),
]


def run(idx):
    name, b, s, c, co, n_w, ln_on, res_on, gate = SHAPES[idx]
    rng = np.random.RandomState(idx)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, s, c) * 0.5, dt)
    if gate:
        ws = (jnp.asarray(rng.randn(c, 2 * co) * 0.05, dt),)
        bs = (jnp.asarray(rng.randn(2 * co) * 0.1, dt),)
    else:
        ws = tuple(jnp.asarray(rng.randn(c, co) * 0.05, dt)
                   for _ in range(n_w))
        bs = tuple(jnp.asarray(rng.randn(co) * 0.1, dt)
                   for _ in range(n_w))
    ln = ((jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32),
           jnp.asarray(0.1 * rng.randn(c), jnp.float32))
          if ln_on else None)
    res = (jnp.asarray(rng.randn(b, s, co), dt) if res_on else None)

    @jax.jit
    def fused(x, ws, bs, ln, res):
        out = fm.fused(x, ws, bs, ln=ln, residual=res, gate=gate)
        assert out is not None, "plan failed"
        return out

    @jax.jit
    def xla(x, ws, bs, ln, res):
        r2 = res.reshape(-1, co) if res is not None else None
        outs = fm._ref(x.reshape(-1, c), ws, bs, ln, r2, gate,
                       gate and len(ws) == 1, 1e-5)
        return tuple(o.reshape(b, s, co) for o in outs)

    y_f = [np.asarray(o, np.float32) for o in fused(x, ws, bs, ln, res)]
    y_x = [np.asarray(o, np.float32) for o in xla(x, ws, bs, ln, res)]
    err = max(np.abs(f - r).max() for f, r in zip(y_f, y_x))
    scale = max(np.abs(r).max() for r in y_x)
    ok = err < 0.02 * max(1.0, scale)
    print(f"[{idx}] {name} {SHAPES[idx][1:]}: max_abs={err:.4f} "
          f"scale={scale:.1f} {'OK' if ok else 'FAIL'}")
    if not ok:
        return

    n_mm = 2 if gate else n_w
    gflop = 2 * b * s * c * co * n_mm / 1e9
    args = (x, ws, bs, ln, res)
    sf = device_time_per_call(fused, args, iters=20)
    sx = device_time_per_call(xla, args, iters=20)
    t_f = sf["device_busy_total_s"] / sf["iters"]
    t_x = sx["device_busy_total_s"] / sx["iters"]
    print(f"   fused {t_f*1e6:8.1f} us  {gflop/t_f/1e3:6.1f} TF/s   "
          f"xla {t_x*1e6:8.1f} us  {gflop/t_x/1e3:6.1f} TF/s   "
          f"speedup {t_x/t_f:.2f}x   "
          f"(span {sf['device_span_per_call_s']*1e6:.1f}/"
          f"{sx['device_span_per_call_s']*1e6:.1f})")


if __name__ == "__main__":
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SHAPES)))
    for i in idxs:
        run(i)

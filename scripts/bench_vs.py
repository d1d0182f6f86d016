"""On-chip A/B: value-space (FC_VS) vs memref-staged compute in the
fused GN+SiLU+conv kernel, per hot shape.

Motivation (docs/perf_journal.md 2026-08-19): the 512^2x128 decoder conv
measures 736 us = 390 us matmul floor + ~345 us VPU prologue, exactly
additive — the memref-staged prologue achieves no VPU/MXU overlap. The
value-space path (ops/fused_conv.py::compute_vs) removes the scratch
round trip so the scheduler can overlap.

Usage: python scripts/bench_vs.py <shape_idx> [...]
Run 1-2 shapes per process (remote compile tunnel flakiness).
Each shape: parity check vs the XLA composition, then device time for
vs=False (current default) and vs=True at a few chunk sizes.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from img2img_turbo_tpu.ops import fused_conv as fc
from img2img_turbo_tpu.utils.profiling import device_time_per_call

# (B, H, W, Cin, Cout, residual) — decoder-heavy: the shapes that are 70%
# of e2e (profile_e2e 2026-08-18/19)
SHAPES = [
    (1, 512, 512, 128, 128, True),    # 0 VAE dec up3 body — THE hot shape
    (1, 512, 512, 256, 128, False),   # 1 VAE dec up3 entry
    (1, 256, 256, 256, 256, True),    # 2 VAE dec up2
    (1, 128, 128, 512, 512, True),    # 3 VAE dec up1
    (1, 64, 64, 512, 512, True),      # 4 VAE dec up0/mid (regime S at b1)
    (8, 512, 512, 128, 128, True),    # 5 b8 up3 body
    (8, 512, 512, 256, 128, False),   # 6 b8 up3 entry
    (8, 256, 256, 256, 256, True),    # 7 b8 up2
    (1, 64, 64, 320, 320, True),      # 8 UNet L0 (with temb-style eb)
]

NG, EPS = 32, 1e-6


def run(idx, iters=20):
    from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs

    b, h, wd, c, co, resid = SHAPES[idx]
    rng = np.random.RandomState(idx)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, h, wd, c), dt) * 2
    w = jnp.asarray(rng.randn(3, 3, c, co) * 0.05, dt)
    cb = jnp.asarray(rng.randn(co) * 0.1, dt)
    scale = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    res = jnp.asarray(rng.randn(b, h, wd, co), dt) if resid else None

    def fused(vs, vs_cc=None):
        @jax.jit
        def f(x, scale, bias, w, cb, res):
            a, bt = group_norm_coeffs(x, scale, bias, NG, EPS)
            y, _ = fc.fused_gn_silu_conv3x3(
                x, w, cb, a=a, b=bt, residual=res, vs=vs, vs_cc=vs_cc)
            return y
        return f

    # parity (on-chip!) vs the XLA composition
    from img2img_turbo_tpu.models import layers as L

    @jax.jit
    def ref(x, scale, bias, w, cb, res):
        hh = L.group_norm({"scale": scale, "bias": bias}, x, NG, EPS)
        y = L.conv2d({"kernel": w, "bias": cb}, L.silu(hh))
        return y + res if res is not None else y

    args = (x, scale, bias, w, cb, res)
    y_ref = np.asarray(ref(*args), np.float32)
    y_vs = np.asarray(fused(True)(*args), np.float32)
    err = np.max(np.abs(y_vs - y_ref)) / (np.abs(y_ref).max() + 1e-6)
    flops = 2 * b * h * wd * 9 * c * co
    print(f"[{idx}] {SHAPES[idx]} rel_err(vs)={err:.4f}", flush=True)
    assert err < 0.05, "VS PARITY FAIL"

    rows = []
    for label, vs, cc in [("memref", False, None), ("vs_cc8", True, 8),
                          ("vs_cc16", True, 16), ("vs_cc4", True, 4)]:
        st = device_time_per_call(fused(vs, cc), args, iters=iters)
        t = st.get("device_p50_per_call_s",
                   st.get("device_span_per_call_s", float("nan")))
        rows.append((label, t))
        print(f"[{idx}] {label:8s} {t * 1e6:9.1f} us "
              f"{flops / t / 1e12:6.1f} TF/s", flush=True)
    best = min(rows, key=lambda r: r[1])
    print(f"[{idx}] WINNER {best[0]} {best[1] * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    # warm the tunnel's first-fetch path (minutes on this rig, round-5
    # CLAUDE.md finding) before any timed region
    _ = float(jax.jit(lambda: jnp.zeros(()))())
    for s in sys.argv[1:]:
        run(int(s))

"""GroupNorm statistics as a Pallas kernel — XLA fusion-pathology fix.

Round-1 profiling (CLAUDE.md) showed XLA:TPU fuses the GroupNorm reduction
into the PRECEDING conv ("convert_reduce_fusion"), dragging 512-channel
small-spatial convs from 118 to 25 TFLOP/s in-graph; a blanket
`lax.optimization_barrier` made things worse by forcing an extra full copy
and blocking good elementwise fusions. This kernel gives the reduction an
opaque boundary with no copy: it reads the conv output once and emits tiny
per-tile per-channel partial sums; the (B, tiles, 2, C) -> (B, G) combine
and the folded-affine normalize stay in XLA where they fuse harmlessly.

The conv then compiles standalone at full MXU speed, the stats read is a
bandwidth-bound streaming pass, and normalize+SiLU fuse into the next
conv's prologue as before.

Used by models/layers.group_norm on TPU (auto), falling back to the pure
XLA two-pass for other backends, odd shapes, and under vmap/grad tracing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2img_turbo_tpu.ops.vma import sds as _sds


_TILE_BYTES_BUDGET = 2 * 1024 * 1024  # per-block VMEM footprint target


def _pick_tile(s: int, c: int, itemsize: int) -> int:
    """Largest divisor of s (multiple of 8) whose block fits the budget."""
    limit = max(8, _TILE_BYTES_BUDGET // max(1, c * itemsize))
    best = 0
    for ts in range(8, min(s, limit) + 1, 8):
        if s % ts == 0:
            best = ts
    return best


def _partial_stats_kernel(x_ref, out_ref):
    xf = x_ref[0].astype(jnp.float32)          # (Ts, C)
    s1 = jnp.sum(xf, axis=0)                   # (C,)
    s2 = jnp.sum(xf * xf, axis=0)              # (C,)
    out_ref[0, 0] = jnp.stack([s1, s2])        # (2, C)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                             "interpret"))
def group_norm_coeffs(x, scale, bias, num_groups: int, eps: float,
                      interpret: bool = False):
    """Per-(batch, channel) folded affine (a, b) such that
    GN(x)*scale+bias == x*a + b. x: (B, H, W, C) or (B, S, C).

    Stats are one-pass (sum / sum-of-squares accumulated in fp32 from
    per-tile pre-reductions); parity with the two-pass XLA path is pinned
    by tests/test_ops.py to ~1e-5 on realistic activation ranges.
    """
    b = x.shape[0]
    c = x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xr = x.reshape(b, s, c)
    # odd spatial sizes (e.g. 70x105 latents from x8-cropped inputs):
    # zero-pad the flattened spatial dim — zeros contribute nothing to
    # sum / sum-of-squares, and the combine divides by the REAL s below,
    # so the statistics are exact.
    sp = -(-s // 8) * 8
    if sp != s:
        xr = jnp.pad(xr, [(0, 0), (0, sp - s), (0, 0)])
    ts = _pick_tile(sp, c, xr.dtype.itemsize)
    if ts == 0:
        raise ValueError(f"no valid tile for S={sp}, C={c}")
    n_tiles = sp // ts

    partials = pl.pallas_call(
        _partial_stats_kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, ts, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((b, n_tiles, 2, c), jnp.float32, xr),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * sp * c, transcendentals=0,
            bytes_accessed=b * sp * c * xr.dtype.itemsize + b * n_tiles * 2 * c * 4),
        interpret=interpret,
    )(xr)

    sums = jnp.sum(partials, axis=1)           # (B, 2, C)
    cg = c // num_groups
    gsums = jnp.sum(sums.reshape(b, 2, num_groups, cg), axis=-1)  # (B,2,G)
    n = s * cg
    mean = gsums[:, 0] / n                                        # (B, G)
    var = jnp.maximum(gsums[:, 1] / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                                # (B, G)
    scale_g = scale.astype(jnp.float32).reshape(num_groups, cg)
    bias_g = bias.astype(jnp.float32).reshape(num_groups, cg)
    a = inv[..., None] * scale_g[None]                            # (B, G, cg)
    bterm = bias_g[None] - mean[..., None] * a
    return a.reshape(b, c), bterm.reshape(b, c)


def supported(x, num_groups: int) -> bool:
    """Static check: shapes this kernel handles (spatial size is
    unconstrained — the wrapper zero-pads it to a multiple of 8)."""
    if x.ndim < 3:
        return False
    c = x.shape[-1]
    if c % num_groups or c % 8:
        return False
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    return _pick_tile(-(-s // 8) * 8, c, jnp.dtype(x.dtype).itemsize) > 0

"""Fused LayerNorm+matmul Pallas kernels — the UNet transformer glue engine.

Round-2 profiling left 6-9 ms of the 512^2 e2e in the UNet transformer's
XLA dots (q/k/v/out projections, GEGLU, proj_in/out: reference hot path
/root/reference/src/model.py:14-54 via diffusers BasicTransformerBlock).
Those dots sit BETWEEN Pallas custom calls (the resnet conv engine ahead,
flash attention inside), so XLA schedules them against pinned row-major
layouts and cannot fuse across the custom-call boundaries. This module
moves every transformer matmul into Pallas so each one fuses its own
prologue (LayerNorm, fp32 statistics in-register over the row) and
epilogue (bias, residual add, GEGLU gating) and streams x/w exactly once:

- fused(x, (w,), (b,))                      plain matmul: proj_in/out
- fused(..., ln=(s,b))                      LN + matmul: cross-attn q
- fused(..., residual=r)                    epilogue add: to_out, FF out
- fused(x, (wq,wk,wv), ..., ln=...)         shared-LN 3-output self qkv
- fused(ctx, (wk,wv), ...)                  2-output cross kv
- fused(x, (wv,wg), ..., gate=True, ln=...) (xn@wv+bv)*gelu(xn@wg+bg)

Grid is (n_co, n_m): a weight block is fetched once per Co tile and stays
resident across row tiles (at the deep UNet levels weights are the
dominant bytes — the FF's 5120x1280 alone is 13MB). The contraction dim C
is never sliced, so each grid cell is a complete matmul (no cross-cell
accumulation); lane-sliced dims (Co tiles) are 128-aligned per Mosaic's
requirement, with whole-Co blocks used when Co % 128 != 0 (e.g. the
320-ch level's 960-wide qkv).

Backward: custom VJP recomputes through `jax.vjp` of the pure-XLA
reference composition — gradient parity with the non-fused path by
construction (same strategy as the conv engine's XLA-recompute VJPs,
models/layers.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2img_turbo_tpu.ops.vma import sds as _sds


def _env_mb(name: str, default_mb: float) -> int:
    return int(float(os.environ.get(name, default_mb)) * 2 ** 20)


# Budget defaults chosen by analogy with the conv engine's regime S
# (whole-image tiles + streamed weight blocks under a raised Mosaic
# limit); weight blocks stay bounded so they stream/overlap instead of
# one serial full-weight DMA. Round 3 shipped these without an on-chip
# run (the erfc regression); on-chip numbers are journaled per round via
# scripts/tpu_smoke.py + scripts/bench_fused_matmul.py from round 4 on.
_W_BLOCK = _env_mb("FM_WBLOCK_MB", 8)
_TOTAL = _env_mb("FM_TOTAL_MB", 96)
_VMEM_LIMIT = _env_mb("FM_VMEM_MB", 128)


def _ceil_to(n: int, k: int) -> int:
    return (n + k - 1) // k * k


# Mosaic's TPU lowering has no erf/erfc primitive (round-3 regression:
# jax.nn.gelu(approximate=False) lowers through erfc and the whole gate
# kernel fails to compile on the chip — BENCH_r03). This is XLA's own f32
# rational erf (openxla/xla xla/client/lib/math.cc ErfImpl32: degree-4/
# degree-6 rational in x^2, input clamped to ±erfinv(1-2^-23)), built from
# primitives Mosaic does lower (mul/add/div/clamp). Max |err| vs lax.erf
# is ~1 f32 ulp (tests/test_fused_matmul.py::test_erf_polynomial_parity
# pins ≤1e-6 abs on [-10, 10]).
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 2.3547966471313185e-5,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)
_ERF_CLAMP = 3.832506856900711
_INV_SQRT2 = 0.7071067811865476


def _erf_f32(x):
    x = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return x * p / q


def _exact_gelu(y):
    """torch-exact GELU (diffusers GEGLU uses F.gelu, approximate='none')
    in f32 via the Mosaic-lowerable erf above. Shared by the kernel body
    and the `_ref` VJP-recompute path so forward and backward agree
    bit-for-bit in how the gate is computed."""
    return 0.5 * y * (1.0 + _erf_f32(y * _INV_SQRT2))


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _plan(m: int, c: int, co: int, n_w: int, n_out: int, itemsize: int,
          has_ln: bool, has_res: bool):
    """-> (m_pad, tm, tco) or None. The VMEM model mirrors the kernel's
    buffers: x (double-buffered across row tiles), the fp32 LN temp, per-w
    double-buffered weight blocks, per-output fp32 accumulator + output
    double buffers, and the residual block."""
    if c % 8 or c * co == 0:
        return None
    if co % 128:
        tcos = [co] if co % 8 == 0 else []
    else:
        tcos = [128 * k for k in _divisors_desc(co // 128)]
    m_pad = _ceil_to(m, 16)
    # Row-tile preference: a single grid cell (tm == m_pad) serializes
    # every DMA (x in, weights in, outputs out) with the matmuls and the
    # gate epilogue — Mosaic only pipelines grid-blocked operands across
    # grid steps. Target >=4 row steps for long sequences so x/out blocks
    # stream double-buffered under the compute (b8 L0 geglu: 32768 rows in
    # one cell ran at ~40% of MXU peak; see docs/perf_journal.md r4).
    max_tm = m_pad if m_pad <= 512 else max(512, min(2048, m_pad // 4))
    tms = [t for t in _divisors_desc(m_pad) if t % 16 == 0]
    tms = [t for t in tms if t <= max_tm] + [t for t in tms if t > max_tm]
    for tco in tcos:
        wbytes = c * tco * itemsize
        if wbytes > _W_BLOCK:
            continue
        for tm in tms:
            total = 2 * tm * c * itemsize          # x, double-buffered
            if has_ln:
                total += tm * c * 4 + 2 * 2 * c * 4  # fp32 temp + scale/bias
            total += n_w * 2 * wbytes               # weight double buffers
            total += n_w * tm * tco * 4              # fp32 accumulators
            total += n_out * 2 * tm * tco * itemsize  # outputs
            total += n_w * 2 * 2 * tco * 4           # biases (fp32 view)
            if has_res:
                total += 2 * tm * tco * itemsize
            if total <= _TOTAL:
                return m_pad, tm, tco
    return None


def supported(m: int, c: int, co: int, n_w: int, itemsize: int = 2,
              has_ln: bool = False, has_res: bool = False,
              gate: bool = False) -> bool:
    n_out = 1 if (gate or n_w == 1) else n_w
    return _plan(m, c, co, n_w, n_out, itemsize, has_ln, has_res) is not None


def _ref(x, ws, bs, ln, residual, gate: bool, packed: bool, eps: float):
    """Pure-XLA reference composition (the VJP recompute path and the
    numerical contract for the kernels)."""
    if packed:
        # gate mode with one (C, 2*Co) weight: value half | gate half
        co = ws[0].shape[1] // 2
        ws = (ws[0][:, :co], ws[0][:, co:])
        bs = (bs[0][:co], bs[0][co:])
    if ln is not None:
        s, b = ln
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        xn = xn * s.astype(jnp.float32) + b.astype(jnp.float32)
        xh = xn.astype(x.dtype)
    else:
        xh = x
    ys = [jnp.dot(xh.astype(jnp.float32), w.astype(jnp.float32))
          + b.astype(jnp.float32) for w, b in zip(ws, bs)]
    if gate:
        ys = [ys[0] * _exact_gelu(ys[1])]
    outs = []
    for y in ys:
        y = y.astype(x.dtype)
        if residual is not None:
            y = y + residual
        outs.append(y)
    return tuple(outs)


def _kernel(n_w: int, gate: bool, has_ln: bool, has_res: bool, eps: float,
            out_dtype, *refs):
    """refs: x, [ln_s, ln_b], w*n_w, b*n_w, [res], out*n_out."""
    i = 0
    x_ref = refs[i]; i += 1
    if has_ln:
        ln_s, ln_b = refs[i], refs[i + 1]; i += 2
    w_refs = refs[i:i + n_w]; i += n_w
    b_refs = refs[i:i + n_w]; i += n_w
    res_ref = None
    if has_res:
        res_ref = refs[i]; i += 1
    out_refs = refs[i:]

    x = x_ref[...]
    if has_ln:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        xn = xn * ln_s[...].astype(jnp.float32) + ln_b[...].astype(
            jnp.float32)
        xh = xn.astype(x.dtype)
    else:
        xh = x
    ys = [jnp.dot(xh, w_ref[...], preferred_element_type=jnp.float32)
          + b_ref[...].astype(jnp.float32)
          for w_ref, b_ref in zip(w_refs, b_refs)]
    if gate:
        ys = [ys[0] * _exact_gelu(ys[1])]
    for out_ref, y in zip(out_refs, ys):
        yo = y.astype(out_dtype)
        if res_ref is not None:
            yo = yo + res_ref[...]
        out_ref[...] = yo


def _pallas(plan, eps, gate, packed, interpret, x, ws, bs, ln, residual):
    m, c = x.shape
    co = ws[0].shape[1] // (2 if packed else 1)
    n_w = 2 if gate else len(ws)
    n_out = 1 if (gate or n_w == 1) else n_w
    m_pad, tm, tco = plan
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))
    n_co = co // tco
    grid = (n_co, m_pad // tm)

    x_spec = pl.BlockSpec((tm, c), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, tco), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    # packed gate: the gate half of the (C, 2*Co) weight, viewed through a
    # shifted index map — no trace-time weight slicing/copies
    wg_spec = pl.BlockSpec((c, tco), lambda i, j: (0, n_co + i),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, tco), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((1, tco), lambda i, j: (0, n_co + i),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tco), lambda i, j: (j, i),
                          memory_space=pltpu.VMEM)
    ln_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    args = [x]
    in_specs = [x_spec]
    if ln is not None:
        args += [ln[0].reshape(1, c), ln[1].reshape(1, c)]
        in_specs += [ln_spec, ln_spec]
    if packed:
        wp = ws[0].astype(x.dtype)
        bp = bs[0].reshape(1, 2 * co).astype(jnp.float32)
        args += [wp, wp, bp, bp]
        in_specs += [w_spec, wg_spec, b_spec, bg_spec]
    else:
        args += [w.astype(x.dtype) for w in ws]
        in_specs += [w_spec] * n_w
        args += [b.reshape(1, co).astype(jnp.float32) for b in bs]
        in_specs += [b_spec] * n_w
    if residual is not None:
        args.append(residual)
        in_specs.append(o_spec)

    operands = (x,) + tuple(ws) + tuple(bs) \
        + (tuple(ln) if ln is not None else ()) \
        + ((residual,) if residual is not None else ())
    flops = 2 * m_pad * c * co * n_w
    outs = pl.pallas_call(
        functools.partial(_kernel, n_w, gate, ln is not None,
                          residual is not None, eps, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=[o_spec] * n_out,
        out_shape=[_sds((m_pad, co), x.dtype, *operands)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=m_pad * co if gate else 0,
            bytes_accessed=(m_pad * c + n_out * m_pad * co
                            + n_w * c * co) * x.dtype.itemsize),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*args)
    if m_pad != m:
        outs = [o[:m] for o in outs]
    return tuple(outs)


def _make_entry(gate: bool, packed: bool):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
    def entry(plan, eps, interpret, x, ws, bs, ln, residual):
        return _pallas(plan, eps, gate, packed, interpret, x, ws, bs, ln,
                       residual)

    def fwd(plan, eps, interpret, x, ws, bs, ln, residual):
        y = entry(plan, eps, interpret, x, ws, bs, ln, residual)
        return y, (x, ws, bs, ln, residual)

    def bwd(plan, eps, interpret, saved, g):
        x, ws, bs, ln, residual = saved
        _, vjp = jax.vjp(
            lambda x_, ws_, bs_, ln_, res_: _ref(x_, ws_, bs_, ln_, res_,
                                                 gate, packed, eps),
            x, ws, bs, ln, residual)
        return vjp(g)

    entry.defvjp(fwd, bwd)
    return entry


_ENTRY = {(g, p): _make_entry(g, p)
          for g in (False, True) for p in (False, True)}


def fused(x, ws, bs, *, ln=None, residual=None, gate: bool = False,
          eps: float = 1e-5, interpret: bool = False):
    """Fused [LN+]matmul[s] on (..., C) inputs; returns a tuple of
    (..., Co) outputs (length 1 unless multiple ws and not gate), or None
    when the shape/VMEM plan fails — the caller keeps its own XLA
    composition. ws: tuple of (C, Co) (all the same Co); bs: (Co,) each;
    ln: (scale, bias) over C; residual: (..., Co), single-output only.
    gate mode takes either two (C, Co) weights (value, gate) or ONE packed
    (C, 2*Co) weight/(2*Co,) bias — diffusers' GEGLU `proj` layout, viewed
    in-kernel through a shifted block index (no trace-time slicing)."""
    assert len(ws) == len(bs) and (not gate or len(ws) in (1, 2))
    assert residual is None or gate or len(ws) == 1
    packed = gate and len(ws) == 1
    lead = x.shape[:-1]
    c = x.shape[-1]
    co = ws[0].shape[1] // (2 if packed else 1)
    if packed and co % 128:
        return None  # the shifted gate-half block index needs lane tiles
    m = 1
    for d in lead:
        m *= d
    n_w = 2 if gate else len(ws)
    plan = _plan(m, c, co, n_w, 1 if (gate or n_w == 1) else n_w,
                 x.dtype.itemsize, ln is not None, residual is not None)
    if plan is None:
        return None
    x2 = x.reshape(m, c)
    res2 = residual.reshape(m, co) if residual is not None else None
    ln_t = (ln[0], ln[1]) if ln is not None else None
    outs = _ENTRY[(gate, packed)](plan, eps, interpret, x2, tuple(ws),
                                  tuple(bs), ln_t, res2)
    return tuple(o.reshape(*lead, co) for o in outs)

"""Core NHWC neural-net layers as pure functions over explicit param pytrees.

Numerics match the torch/diffusers building blocks the reference composes
(reference models come from `diffusers==0.25.1` / `transformers==4.35.2`, see
/root/reference/requirements.txt): cross-correlation convs, GroupNorm/LayerNorm
with matching eps, exact-erf GELU, 1/sqrt(head_dim) attention scaling with
fp32 softmax.

Design: every layer is `init_*(key, ...) -> params` plus an apply function
`fn(params, x, ...) -> y`. Params are plain nested dicts (JAX pytrees), so
LoRA / merging / sharding are tree transformations, and the whole model jits
into a single XLA program.

Layout rules (TPU-first):
- images/activations: NHWC (channels-last feeds the MXU's 128-lane dimension)
- conv kernels: HWIO
- linear kernels: (in, out)
- norms and softmax computed in float32 regardless of activation dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers (torch-default parity: kaiming_uniform(a=sqrt(5)) reduces to
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": _uniform(wkey, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["bias"] = _uniform(bkey, (out_dim,), bound, dtype)
    return p


def linear(p, x):
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def init_conv2d(key, in_ch: int, out_ch: int, kernel_size: int = 3,
                bias: bool = True, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": _uniform(
        wkey, (kernel_size, kernel_size, in_ch, out_ch), bound, dtype)}
    if bias:
        p["bias"] = _uniform(bkey, (out_ch,), bound, dtype)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC cross-correlation conv. `padding` is 'SAME', 'VALID', or explicit
    [(lo, hi), (lo, hi)] for the two spatial dims."""
    k = p["kernel"].astype(x.dtype)
    if isinstance(padding, str) and padding == "SAME" and stride == 1:
        kh = p["kernel"].shape[0]
        pad = kh // 2
        padding = [(pad, pad), (pad, pad)]
    elif isinstance(padding, str) and padding == "VALID":
        padding = [(0, 0), (0, 0)]
    y = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def init_group_norm(num_channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_channels,), dtype),
            "bias": jnp.zeros((num_channels,), dtype)}


FUSED_KERNELS = True
"""Route GroupNorm stats and the resnet-body GN+SiLU+conv through the
Pallas kernels on TPU (ops/groupnorm.py, ops/fused_conv.py).

Multi-device graphs keep the kernels when the program is shard_map'd over
the data axis (training/*.make_*_train_step_dp, serving.ServingEngine
mesh=...): each shard runs single-device kernels on its local batch, the
TPU-native analog of the reference's DDP scaling its cuDNN kernels
untouched (train_pix2pix_turbo.py:120-123). Only tensor-parallel pjit
graphs (model axis > 1) must disable them — Pallas custom calls are not
partitionable by XLA's SPMD pass; use `fused_kernels_scope(False)` so the
toggle is scoped, not a hidden process-global flip."""

FORCE_FUSED = False
"""Take the Pallas path even off-TPU — for CPU tests/dryruns that wrap the
graph in `pltpu.force_tpu_interpret_mode()` (interpret-mode kernels)."""


def set_fused_kernels(enabled: bool) -> None:
    global FUSED_KERNELS
    FUSED_KERNELS = bool(enabled)


import contextlib


@contextlib.contextmanager
def fused_kernels_scope(enabled: bool):
    """Scoped FUSED_KERNELS override (restores the previous value). NOTE:
    the flag is read at TRACE time — enter the scope before jit tracing,
    and use distinct function objects per setting (jit caches by fn)."""
    global FUSED_KERNELS
    prev = FUSED_KERNELS
    FUSED_KERNELS = bool(enabled)
    try:
        yield
    finally:
        FUSED_KERNELS = prev


@contextlib.contextmanager
def force_fused_scope():
    """Scoped FORCE_FUSED=True (CPU interpret-mode kernel testing)."""
    global FORCE_FUSED
    prev = FORCE_FUSED
    FORCE_FUSED = True
    try:
        yield
    finally:
        FORCE_FUSED = prev


def _pallas_tpu() -> bool:
    return FUSED_KERNELS and (jax.default_backend() == "tpu" or FORCE_FUSED)


def group_norm(p, x, num_groups: int, eps: float, x_stats=None):
    """GroupNorm over NHWC (stats over H, W and channels-within-group).

    On TPU the statistics come either from `x_stats` (partial sums chained
    from the producing Pallas kernel — free) or from a Pallas pre-reduction
    kernel (ops/groupnorm.py): giving the reduction an opaque compilation
    boundary stops XLA from fusing it into the producing conv, which
    round-1 profiling showed degrades the conv 118 -> 25 TFLOP/s
    ("convert_reduce_fusion" pathology, CLAUDE.md). The normalize itself
    stays in XLA where it fuses into the consumer.
    """
    if x.ndim == 4 and _pallas_tpu():
        from img2img_turbo_tpu.ops import groupnorm
        if x_stats is not None:
            return _make_gn_pallas(num_groups, eps, True)(
                x, p["scale"], p["bias"], x_stats)
        # c % 128: a stats custom call pins its operand to the default
        # row-major layout; an XLA conv producing that operand would then
        # emit a degraded schedule. 128-multiple channels only appear in
        # the Pallas-fused resnet neighborhoods, where producers are
        # layout-fixed Pallas kernels anyway.
        if x.shape[-1] % 128 == 0 and groupnorm.supported(x, num_groups):
            return _make_gn_pallas(num_groups, eps, False)(
                x, p["scale"], p["bias"])
    return _gn_xla(x, p["scale"], p["bias"], num_groups, eps)


def _gn_xla(x, scale, bias, num_groups: int, eps: float):
    """Pure-XLA GroupNorm (all backends; also the VJP reference).

    Statistics are fp32 (E[x], E[x^2] reductions); the normalization itself
    runs in the activation dtype so large bf16 activations are never
    materialized in fp32 (halves HBM traffic on the VAE decoder's 512^2
    tensors). Scale/shift are folded into one multiply-add per element.
    """
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, num_groups, c // num_groups)
    xf = xg.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 4))            # (b, g)
    var = jnp.mean(jnp.square(xf - mean[:, None, None, :, None]),
                   axis=(1, 2, 4))                 # two-pass: no cancellation
    inv = jax.lax.rsqrt(var + eps)                 # (b, g)
    # fold affine: y = x * (inv*scale) + (bias - mean*inv*scale)
    scale = scale.astype(jnp.float32).reshape(num_groups, c // num_groups)
    bias = bias.astype(jnp.float32).reshape(num_groups, c // num_groups)
    a = inv[..., None] * scale[None]               # (b, g, c/g)
    bterm = bias[None] - mean[..., None] * a       # (b, g, c/g)
    a = a.reshape(b, 1, 1, c).astype(x.dtype)
    bterm = bterm.reshape(b, 1, 1, c).astype(x.dtype)
    return x * a + bterm


@functools.lru_cache(maxsize=None)
def _make_gn_pallas(num_groups: int, eps: float, has_stats: bool = False):
    """custom_vjp GroupNorm: Pallas-stats (or chained-stats) forward,
    XLA-reference backward (exact gradients; zero cotangent for x_stats —
    see _make_fused_gsc)."""
    from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs
    from img2img_turbo_tpu.ops.fused_conv import combine_stats

    def impl(x, scale, bias, xs=None):
        if xs is not None:
            count = 1
            for d in x.shape[1:-1]:
                count *= d
            a, bt = combine_stats(xs, scale, bias, num_groups, eps, count)
        else:
            a, bt = group_norm_coeffs(x, scale, bias, num_groups, eps)
        b, c = x.shape[0], x.shape[-1]
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        return (x * a.reshape(shape).astype(x.dtype)
                + bt.reshape(shape).astype(x.dtype))

    @jax.custom_vjp
    def f(*args):
        return impl(*args)

    def fwd(*args):
        return impl(*args), args

    def bwd(res, g):
        x, scale, bias = res[:3]
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _gn_xla(x_, s_, b_, num_groups, eps),
            x, scale, bias)
        grads = vjp(g)
        if has_stats:
            return grads + (jnp.zeros_like(res[3]),)
        return grads

    f.defvjp(fwd, bwd)
    return f


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    """Exact (erf) GELU — torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {"gelu": gelu, "quick_gelu": quick_gelu, "silu": silu}


# ---------------------------------------------------------------------------
# Fused GN+SiLU+conv3x3 (the UNet/VAE resnet-body hot path)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_fused_gsc(num_groups: int, eps: float, has_eb: bool, has_res: bool,
                    has_stats_in: bool, emit_stats: bool,
                    has_skip: bool = False):
    """custom_vjp over
    (x, gn_scale, gn_bias, w, conv_bias[, eb][, res][, x_stats]
     [, skip_x, skip_w]):
    Pallas fused kernel forward, XLA-composition backward (the two agree to
    bf16 rounding; the backward recomputes forward state remat-style).

    x_stats, when given, are (B, n_tiles, 2, C) partial sums of x emitted
    by the producing kernel — GroupNorm statistics then cost one tiny XLA
    combine instead of a full read of x. Gradients stay exact: x_stats is
    a function of x, so the backward differentiates the plain composition
    w.r.t. x and returns a zero cotangent for the x_stats operand (and the
    emitted-stats output takes no cotangent — its only consumers likewise
    route their gradient through y)."""
    from img2img_turbo_tpu.ops import fused_conv
    from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs

    def unpack(args):
        x, scale, bias, w, cb = args[:5]
        i = 5
        eb = args[i] if has_eb else None
        i += int(has_eb)
        res = args[i] if has_res else None
        i += int(has_res)
        xs = args[i] if has_stats_in else None
        i += int(has_stats_in)
        sk = args[i:i + 2] if has_skip else (None, None)
        return x, scale, bias, w, cb, eb, res, xs, sk

    def pallas_impl(*args):
        x, scale, bias, w, cb, eb, res, xs, (skx, skw) = unpack(args)
        if xs is not None:
            a, bt = fused_conv.combine_stats(
                xs, scale, bias, num_groups, eps,
                count=x.shape[1] * x.shape[2])
        else:
            a, bt = group_norm_coeffs(x, scale, bias, num_groups, eps)
        y, stats = fused_conv.fused_gn_silu_conv3x3(
            x, w, cb, a=a, b=bt, extra_bias=eb, residual=res,
            skip_x=skx, skip_w=skw, emit_stats=emit_stats)
        return (y, stats) if emit_stats else y

    def xla_impl(*args):
        x, scale, bias, w, cb, eb, res, _, (skx, skw) = unpack(args)
        h = _gn_xla(x, scale, bias, num_groups, eps)
        y = conv2d({"kernel": w, "bias": cb}, silu(h))
        if eb is not None:
            y = y + eb[:, None, None, :].astype(y.dtype)
        if res is not None:
            y = y + res
        if skx is not None:
            y = y + jnp.dot(skx, skw.astype(skx.dtype),
                            preferred_element_type=skx.dtype)
        return y

    def pallas_bwd(saved, gy):
        """Analytic backward of xla_impl's composition with the heavy ops
        on the Pallas engine (VERDICT r2 item 6: the jax.vjp(xla_impl)
        backward interleaved XLA convs with the Pallas forwards — the
        layout-pinned-neighbor pathology the forward was built to avoid):

        - du = conv_T(gy, w): the SAME fused conv kernel on gy with the
          spatially-flipped, io-swapped weights — a pure Pallas conv.
        - dw: 9 shifted (BHW, C)^T @ (BHW, Co) MXU dots — plain XLA dots
          never enter the conv-rewrite path that degrades next to custom
          calls; only convs do.
        - GN/SiLU chain + reductions: fp32 XLA elementwise (fuses freely
          against custom-call neighbors).
        """
        x, scale, bias, w, cb, eb, res, xs, (skx, skw) = unpack(saved)
        b, h, wd, c = x.shape
        co = w.shape[-1]
        cg = c // num_groups
        f32 = jnp.float32

        # GN stats, two-pass fp32 (same formulation as _gn_xla)
        xf = x.astype(f32).reshape(b, h * wd, num_groups, cg)
        mean = jnp.mean(xf, axis=(1, 3))
        var = jnp.mean(jnp.square(xf - mean[:, None, :, None]),
                       axis=(1, 3))
        inv = jax.lax.rsqrt(var + eps)                      # (b, g)
        sg = scale.astype(f32).reshape(num_groups, cg)
        bg = bias.astype(f32).reshape(num_groups, cg)
        xhat = (xf - mean[:, None, :, None]) * inv[:, None, :, None]
        z = xhat * sg[None, None] + bg[None, None]
        sig = jax.nn.sigmoid(z)
        uprime = sig * (1.0 + z * (1.0 - sig))              # silu'

        # du = conv_T(gy, w) on the Pallas engine
        w_t = w[::-1, ::-1].swapaxes(2, 3)                  # (3,3,Co,C)
        du4, _ = fused_conv.fused_gn_silu_conv3x3(
            gy, w_t.astype(gy.dtype), jnp.zeros((c,), gy.dtype))
        du = du4.astype(f32).reshape(b, h * wd, num_groups, cg)
        dz = du * uprime

        # GN backward (dz -> dx, dscale, dbias)
        dxhat = dz * sg[None, None]
        m1 = jnp.mean(dxhat, axis=(1, 3))
        m2 = jnp.mean(dxhat * xhat, axis=(1, 3))
        dx = (inv[:, None, :, None]
              * (dxhat - m1[:, None, :, None]
                 - xhat * m2[:, None, :, None]))
        dx = dx.reshape(b, h, wd, c).astype(x.dtype)
        dscale = jnp.sum(dz * xhat, axis=(0, 1)).reshape(c).astype(
            scale.dtype)
        dbias = jnp.sum(dz, axis=(0, 1)).reshape(c).astype(bias.dtype)

        # dw: 9 shifted MXU dots against the recomputed activation
        u = (z * sig).astype(gy.dtype).reshape(b, h, wd, c)
        upad = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
        gy2 = gy.reshape(b * h * wd, co)
        taps = []
        for di in range(3):
            for dj in range(3):
                us = upad[:, di:di + h, dj:dj + wd, :].reshape(-1, c)
                taps.append(jax.lax.dot_general(
                    us, gy2, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32))
        dw = jnp.stack(taps).reshape(3, 3, c, co).astype(w.dtype)
        dcb = jnp.sum(gy2.astype(f32), axis=0).astype(cb.dtype)

        grads = [dx, dscale, dbias, dw, dcb]
        if has_eb:
            grads.append(jnp.sum(gy.astype(f32), axis=(1, 2)).astype(
                eb.dtype))
        if has_res:
            grads.append(gy.astype(res.dtype))
        if has_stats_in:
            grads.append(jnp.zeros_like(xs))
        if has_skip:
            csk = skx.shape[-1]
            grads.append(jnp.dot(gy, skw.T.astype(gy.dtype),
                                 preferred_element_type=gy.dtype
                                 ).astype(skx.dtype))
            grads.append(jax.lax.dot_general(
                skx.reshape(-1, csk), gy2, (((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(skw.dtype))
        return tuple(grads)

    @jax.custom_vjp
    def f(*args):
        return pallas_impl(*args)

    def fwd(*args):
        return pallas_impl(*args), args

    def bwd(saved, g):
        gy = g[0] if emit_stats else g
        import os
        if os.environ.get("FC_BWD", "pallas") == "pallas":
            return pallas_bwd(saved, gy)
        _, vjp = jax.vjp(xla_impl, *saved)
        grads = list(vjp(gy))
        if has_stats_in:
            idx = 5 + int(has_eb) + int(has_res)
            grads[idx] = jnp.zeros_like(saved[idx])
        return tuple(grads)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_fused_upconv(emit_stats: bool = False, has_skip: bool = False):
    from img2img_turbo_tpu.ops import fused_conv

    def xla_impl(*args):
        x, w, cb = args[:3]
        y = conv2d({"kernel": w, "bias": cb}, upsample_nearest_2x(x))
        if has_skip:
            skx, skw = args[3:5]
            y = y + jnp.dot(skx, skw.astype(skx.dtype),
                            preferred_element_type=skx.dtype)
        return y

    def impl(*args):
        x, w, cb = args[:3]
        skx, skw = args[3:5] if has_skip else (None, None)
        y, stats = fused_conv.upsample2x_conv3x3(
            x, w, cb, skip_x=skx, skip_w=skw, emit_stats=emit_stats)
        return (y, stats) if emit_stats else y

    @jax.custom_vjp
    def f(*args):
        return impl(*args)

    def fwd(*args):
        return impl(*args), args

    def bwd(saved, g):
        gy = g[0] if emit_stats else g
        _, vjp = jax.vjp(xla_impl, *saved)
        return vjp(gy)

    f.defvjp(fwd, bwd)
    return f


def upsample2x_conv(conv_p, x, emit_stats: bool = False, skip=None):
    """conv3x3(nearest_upsample_2x(x)) — diffusers Upsample2D hot path.

    On TPU this runs as a phase-decomposed Pallas kernel
    (ops/fused_conv.upsample2x_conv3x3): 2.25x fewer FLOPs than convolving
    the upsampled tensor, reads x at low resolution, and keeps the op out
    of XLA's conv fuser (whose schedule collapses when its input comes
    from a Pallas custom call). Elsewhere: the plain XLA composition.
    emit_stats=True returns (y, output partial sums) for GN chaining
    (stats None on the fallback path). `skip`, when given, is
    {"x": (B,2H,2W,Csk), "kernel": (1,1,Csk,Co), "gamma": scalar}: the
    VAE skip-decoder's zero-conv output is added in the kernel epilogue
    (gamma folded into the weights), replacing an XLA conv+add round trip.
    """
    kernel = conv_p["kernel"]
    if kernel.shape[0] == 3 and x.ndim == 4 and _pallas_tpu():
        from img2img_turbo_tpu.ops import fused_conv
        if fused_conv.upsample_supported(
                x.shape, kernel.shape[-1], x.dtype.itemsize,
                skip_c=0 if skip is None else skip["x"].shape[-1]):
            f = _make_fused_upconv(emit_stats, skip is not None)
            args = [x, kernel.astype(x.dtype),
                    conv_p["bias"].astype(x.dtype)]
            if skip is not None:
                ci, co_s = skip["kernel"].shape[2:]
                skw = (skip["kernel"].reshape(ci, co_s)
                       * jnp.asarray(skip["gamma"], skip["kernel"].dtype))
                args += [skip["x"].astype(x.dtype), skw]
            return f(*args)
    y = conv2d(conv_p, upsample_nearest_2x(x))
    if skip is not None:
        sx = skip["x"]
        y = y + conv2d({"kernel": skip["kernel"]},
                       sx * jnp.asarray(skip["gamma"], sx.dtype))
    return (y, None) if emit_stats else y


@functools.lru_cache(maxsize=None)
def _make_fused_downconv(pad_lo: int, emit_stats: bool):
    from img2img_turbo_tpu.ops import fused_conv

    def xla_impl(x, w, cb):
        return conv2d({"kernel": w, "bias": cb}, x, stride=2,
                      padding=[(pad_lo, 1), (pad_lo, 1)])

    def impl(x, w, cb):
        y, stats = fused_conv.downsample2x_conv3x3(
            x, w, cb, pad_lo=pad_lo, emit_stats=emit_stats)
        return (y, stats) if emit_stats else y

    @jax.custom_vjp
    def f(x, w, cb):
        return impl(x, w, cb)

    def fwd(x, w, cb):
        return impl(x, w, cb), (x, w, cb)

    def bwd(saved, g):
        gy = g[0] if emit_stats else g
        _, vjp = jax.vjp(xla_impl, *saved)
        return vjp(gy)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_fused_plainconv(emit_stats: bool):
    from img2img_turbo_tpu.ops import fused_conv

    def xla_impl(x, w, cb):
        return conv2d({"kernel": w, "bias": cb}, x)

    def impl(x, w, cb):
        y, stats = fused_conv.fused_gn_silu_conv3x3(
            x, w, cb, emit_stats=emit_stats)
        return (y, stats) if emit_stats else y

    @jax.custom_vjp
    def f(x, w, cb):
        return impl(x, w, cb)

    def fwd(x, w, cb):
        return impl(x, w, cb), (x, w, cb)

    def bwd(saved, g):
        gy = g[0] if emit_stats else g
        _, vjp = jax.vjp(xla_impl, *saved)
        return vjp(gy)

    f.defvjp(fwd, bwd)
    return f


def plain_conv3x3(conv_p, x, emit_stats: bool = False):
    """Stride-1 SAME conv3x3 without a norm prologue (conv_in / conv_out
    class). Pallas on TPU (with channel padding for tiny C/Co) so the op
    neither degrades nor gets degraded at Pallas boundaries; XLA elsewhere.
    """
    kernel = conv_p["kernel"]
    if kernel.shape[0] == 3 and x.ndim == 4 and _pallas_tpu():
        from img2img_turbo_tpu.ops import fused_conv
        if fused_conv.supported(x.shape, kernel.shape[-1],
                                x.dtype.itemsize):
            f = _make_fused_plainconv(emit_stats)
            return f(x, kernel.astype(x.dtype),
                     conv_p["bias"].astype(x.dtype))
    y = conv2d(conv_p, x)
    return (y, None) if emit_stats else y


def downsample2x_conv(conv_p, x, pad_lo: int, emit_stats: bool = False):
    """Stride-2 conv3x3 (VAE encoder pad_lo=0, UNet downsample pad_lo=1).

    Default: the strided XLA conv — the round-5 in-graph arbiter showed
    the stride-2 class does NOT suffer the Pallas-boundary schedule
    collapse that motivates the stride-1/up kernels, and XLA is 1.6-3x
    faster on it (journal 2026-08-19). FC_XLA_DOWN=0 re-enables the
    phase-decomposed Pallas kernel (ops/fused_conv.downsample2x_conv3x3),
    which also emits output stats for GN chaining.
    """
    kernel = conv_p["kernel"]
    import os
    if kernel.shape[0] == 3 and x.ndim == 4 and _pallas_tpu() \
            and os.environ.get("FC_XLA_DOWN", "1") != "1":
        # Default: the XLA strided conv. The in-graph arbiter (journal
        # 2026-08-19 chain_r5b) measured the Pallas down kernel LOSING
        # e2e — b8 306.7 -> 292.4 ms and b1 40.72 -> 40.69 ms with XLA
        # down — consistent with its isolated 0.31-0.61x (phase-rebuild
        # VPU cost), and the feared XLA-conv-at-Pallas-boundary schedule
        # collapse did NOT materialize for the stride-2 shape class.
        # FC_XLA_DOWN=0 re-enables the kernel for future A/Bs.
        from img2img_turbo_tpu.ops import fused_conv
        if fused_conv.downsample_supported(x.shape, kernel.shape[-1],
                                           x.dtype.itemsize):
            f = _make_fused_downconv(pad_lo, emit_stats)
            return f(x, kernel.astype(x.dtype),
                     conv_p["bias"].astype(x.dtype))
    y = conv2d(conv_p, x, stride=2, padding=[(pad_lo, 1), (pad_lo, 1)])
    return (y, None) if emit_stats else y


def gn_silu_conv(gn_p, conv_p, x, num_groups: int, eps: float,
                 extra_bias=None, residual=None, x_stats=None,
                 emit_stats: bool = False, skip=None):
    """conv3x3(silu(GroupNorm(x))) + bias [+ extra_bias(B,Co)] [+ residual].

    The resnet-body primitive for UNet/VAE blocks. On TPU, supported shapes
    run as ONE Pallas kernel (ops/fused_conv.py): x streams HBM->VMEM once,
    normalize+SiLU happen in-register, the conv runs as 9 shifted MXU
    matmuls — this sidesteps both the convert_reduce_fusion pathology and
    XLA's space-to-batch layout copies. Elsewhere (CPU tests, multi-device
    graphs) it is the plain XLA composition with identical semantics.

    Stats chaining: `x_stats` (from a previous call's emitted stats) makes
    this GroupNorm's statistics free; `emit_stats=True` returns (y, stats)
    for the next GN. Both are inert (stats=None) on the fallback path —
    callers must treat a None as "compute stats yourself".
    `skip` = {"x", "kernel" (1,1,Csk,Co), "gamma"}: epilogue zero-conv skip
    fusion, as in upsample2x_conv.
    """
    kernel = conv_p["kernel"]
    co = kernel.shape[-1]
    if kernel.shape[0] == 3 and x.ndim == 4 and _pallas_tpu():
        from img2img_turbo_tpu.ops import fused_conv
        if fused_conv.supported(
                x.shape, co, x.dtype.itemsize,
                skip_c=0 if skip is None else skip["x"].shape[-1]):
            f = _make_fused_gsc(num_groups, eps, extra_bias is not None,
                                residual is not None, x_stats is not None,
                                emit_stats, skip is not None)
            args = [x, gn_p["scale"], gn_p["bias"],
                    kernel.astype(x.dtype), conv_p["bias"].astype(x.dtype)]
            if extra_bias is not None:
                args.append(extra_bias)
            if residual is not None:
                args.append(residual.astype(x.dtype))
            if x_stats is not None:
                args.append(x_stats)
            if skip is not None:
                ci, co_s = skip["kernel"].shape[2:]
                skw = (skip["kernel"].reshape(ci, co_s)
                       * jnp.asarray(skip["gamma"], skip["kernel"].dtype))
                args += [skip["x"].astype(x.dtype), skw]
                if "bias" in skip:
                    # shortcut-conv bias rides the conv bias operand; the
                    # sum happens outside the custom_vjp so both biases
                    # still receive exact gradients
                    args[4] = args[4] + skip["bias"].astype(x.dtype)
            return f(*args)
    # fallback: keep the GN in XLA too — a Pallas stats kernel next to an
    # XLA conv pins the conv's output layout (row-major) and collapses its
    # schedule, so mixed neighborhoods must stay all-XLA
    h = _gn_xla(x, gn_p["scale"], gn_p["bias"], num_groups, eps)
    y = conv2d(conv_p, silu(h))
    if extra_bias is not None:
        y = y + extra_bias[:, None, None, :].astype(y.dtype)
    if residual is not None:
        y = y + residual
    if skip is not None:
        sx = skip["x"]
        sp = {"kernel": skip["kernel"]}
        if "bias" in skip:
            sp["bias"] = skip["bias"]
        y = y + conv2d(sp, sx * jnp.asarray(skip["gamma"], sx.dtype))
    return (y, None) if emit_stats else y


# ---------------------------------------------------------------------------
# Timestep embedding (diffusers get_timestep_embedding semantics)
# ---------------------------------------------------------------------------


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding.

    Matches diffusers.models.embeddings.get_timestep_embedding as configured
    by SD-Turbo's UNet (flip_sin_to_cos=True, downscale_freq_shift=0).
    timesteps: (B,) int/float array. Returns (B, dim) float32.
    """
    import numpy as np

    half = dim // 2
    # frequency table is a trace-time constant; compute it in float64 so the
    # large-t (t=999) sin/cos arguments keep full fp32 accuracy
    freqs = np.exp(
        -math.log(max_period) * np.arange(half, dtype=np.float64)
        / (half - freq_shift)).astype(np.float32)
    emb = freqs[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


# ---------------------------------------------------------------------------
# Attention (projection wrapper; the inner kernel lives in ops/attention.py)
# ---------------------------------------------------------------------------


def init_attention(key, query_dim: int, num_heads: int,
                   cross_dim: Optional[int] = None, out_bias: bool = True,
                   dtype=jnp.float32):
    """QKV+out projections, diffusers Attention layout (to_q/to_k/to_v/to_out).

    diffusers' to_q/to_k/to_v have no bias for SD UNet/VAE attention; to_out
    has bias.
    """
    kdim = query_dim if cross_dim is None else cross_dim
    keys = jax.random.split(key, 4)
    return {
        "to_q": init_linear(keys[0], query_dim, query_dim, bias=False, dtype=dtype),
        "to_k": init_linear(keys[1], kdim, query_dim, bias=False, dtype=dtype),
        "to_v": init_linear(keys[2], kdim, query_dim, bias=False, dtype=dtype),
        "to_out": init_linear(keys[3], query_dim, query_dim, bias=out_bias, dtype=dtype),
    }


def attention(p, x, context=None, *, num_heads: int, attn_fn=None):
    """Multi-head attention over token sequences.

    x: (B, Sq, D); context: (B, Skv, Dk) or None for self-attention.
    Projections stay in (B, S, D) layout; head splitting happens inside the
    kernel (ops.attention.multihead_attention) so no head transposes are
    materialized. attn_fn, if given, overrides with a (B, H, S, hd)-layout
    kernel (tests use this to pin numerics).
    """
    ctx = x if context is None else context
    q = linear(p["to_q"], x)
    k = linear(p["to_k"], ctx)
    v = linear(p["to_v"], ctx)

    if attn_fn is not None:
        b, sq, d = x.shape
        skv = ctx.shape[1]
        hd = d // num_heads
        qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
        o = attn_fn(qh, kh, vh).transpose(0, 2, 1, 3).reshape(b, sq, d)
    else:
        from img2img_turbo_tpu.ops.attention import multihead_attention
        o = multihead_attention(q, k, v, num_heads)
    return linear(p["to_out"], o)


# ---------------------------------------------------------------------------
# GEGLU feed-forward (diffusers FeedForward with geglu activation)
# ---------------------------------------------------------------------------


def init_geglu_ff(key, dim: int, mult: int = 4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        # diffusers names: ff.net.0.proj (GEGLU), ff.net.2 (Linear)
        "proj": init_linear(k1, dim, inner * 2, dtype=dtype),
        "out": init_linear(k2, inner, dim, dtype=dtype),
    }


def geglu_ff(p, x):
    h = linear(p["proj"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    return linear(p["out"], h * gelu(gate))


# ---------------------------------------------------------------------------
# Fused transformer glue (ops/fused_matmul.py) — Pallas LN+matmul kernels
# ---------------------------------------------------------------------------


def _fused_mm(x, ws, bs, ln=None, residual=None, gate=False, eps=1e-5,
              site=None):
    """Route to the Pallas matmul engine when it is on; None otherwise (the
    caller keeps the XLA composition). FM_DISABLE=1 turns just this engine
    off (A/B the transformer glue against XLA dots without touching the
    conv kernels) — read at trace time like FUSED_KERNELS.

    FM_SITES selects a per-call-site subset (comma list of
    qkv,q,kv,linear,geglu; default all) so the in-graph arbiter (VERDICT
    r4 item 4) can keep only the sites that beat XLA dots e2e."""
    import os
    if os.environ.get("FM_DISABLE") == "1" or not _pallas_tpu():
        return None
    sites = os.environ.get("FM_SITES", "all")
    if sites != "all" and site is not None \
            and site not in sites.split(","):
        return None
    from img2img_turbo_tpu.ops import fused_matmul as fm
    return fm.fused(x, tuple(ws), tuple(bs), ln=ln, residual=residual,
                    gate=gate, eps=eps)


def linear_fused(p, x, residual=None):
    """`linear` [+ residual] through the Pallas matmul engine on TPU —
    the transformer's proj_in/proj_out and FF output projections, whose
    XLA dots otherwise sit between layout-pinning Pallas custom calls."""
    b = p.get("bias")
    if b is None:
        b = jnp.zeros((p["kernel"].shape[1],), x.dtype)
    out = _fused_mm(x, (p["kernel"],), (b,), residual=residual,
                    site="linear")
    if out is not None:
        return out[0]
    y = linear(p, x)
    return y if residual is None else y + residual


def attention_block(p, p_norm, x, context=None, *, num_heads: int,
                    attn_fn=None, eps: float = 1e-5):
    """`x + attention(LN(x))` — the BasicTransformerBlock attention step.

    On TPU the LN+q/k/v projections run as one shared-prologue Pallas
    kernel (3-output for self-attention; LN-q + 2-output kv on the context
    for cross-attention) and the out-projection fuses the residual add, so
    no XLA dot remains between the Pallas conv/flash neighbors. Falls back
    to `layer_norm` + `attention` off-TPU or when a shape gate fails."""
    dq = p["to_q"]["kernel"].shape[1]
    z = jnp.zeros((dq,), x.dtype)
    ln = (p_norm["scale"], p_norm["bias"])
    q = k = v = None
    if context is None:
        outs = _fused_mm(x, (p["to_q"]["kernel"], p["to_k"]["kernel"],
                             p["to_v"]["kernel"]), (z, z, z), ln=ln, eps=eps,
                         site="qkv")
        if outs is not None:
            q, k, v = outs
    else:
        qo = _fused_mm(x, (p["to_q"]["kernel"],), (z,), ln=ln, eps=eps,
                       site="q")
        kvo = _fused_mm(context, (p["to_k"]["kernel"], p["to_v"]["kernel"]),
                        (z, z), site="kv")
        if qo is not None and kvo is not None:
            q, (k, v) = qo[0], kvo
    if q is None:
        return x + attention(p, layer_norm(p_norm, x, eps), context,
                             num_heads=num_heads, attn_fn=attn_fn)
    if attn_fn is not None:
        b, sq, d = q.shape
        skv = k.shape[1]
        hd = d // num_heads
        qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
        o = attn_fn(qh, kh, vh).transpose(0, 2, 1, 3).reshape(b, sq, d)
    else:
        from img2img_turbo_tpu.ops.attention import multihead_attention
        o = multihead_attention(q, k, v, num_heads)
    return linear_fused(p["to_out"], o, residual=x)


def geglu_ff_block(p, p_norm, x, eps: float = 1e-5):
    """`x + geglu_ff(LN(x))` — the BasicTransformerBlock FF step. On TPU
    stage 1 runs LN + both halves of the packed GEGLU `proj` weight in one
    gated Pallas kernel (the weight is viewed through shifted block
    indices, never sliced at trace time) and stage 2 fuses the residual."""
    u = _fused_mm(x, (p["proj"]["kernel"],), (p["proj"]["bias"],),
                  ln=(p_norm["scale"], p_norm["bias"]), gate=True, eps=eps,
                  site="geglu")
    if u is None:
        return x + geglu_ff(p, layer_norm(p_norm, x, eps))
    return linear_fused(p["out"], u[0], residual=x)


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def upsample_nearest_to(x, size):
    """Nearest-neighbor upsample to an exact (H, W) with torch
    `F.interpolate(mode="nearest")` index semantics — source index
    floor(i * in / out) — which differ from jax.image.resize's half-pixel
    centers on non-integer scale factors (diffusers Upsample2D passes
    output_size for odd skip shapes; unet_2d_condition.py forward_upsample_size
    path)."""
    th, tw = size
    b, h, w, c = x.shape
    rows = jnp.arange(th) * h // th
    cols = jnp.arange(tw) * w // tw
    return x[:, rows][:, :, cols]


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))

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


def group_norm(p, x, num_groups: int, eps: float):
    """GroupNorm over NHWC (stats over H, W and channels-within-group).

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
    scale = p["scale"].astype(jnp.float32).reshape(num_groups, c // num_groups)
    bias = p["bias"].astype(jnp.float32).reshape(num_groups, c // num_groups)
    a = inv[..., None] * scale[None]               # (b, g, c/g)
    bterm = bias[None] - mean[..., None] * a       # (b, g, c/g)
    a = a.reshape(b, 1, 1, c).astype(x.dtype)
    bterm = bterm.reshape(b, 1, 1, c).astype(x.dtype)
    return x * a + bterm


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

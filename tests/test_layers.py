"""Parity tests of core layers against torch.nn ground truth.

These pin the exact semantics the diffusers/transformers stacks rely on
(cross-correlation convs, GroupNorm/LayerNorm eps, erf-GELU, attention
scaling) without copying any reference code: torch.nn primitives ARE the
ground truth for the math.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from img2img_turbo_tpu.models import layers as L

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("stride,pad", [(1, "SAME"), (2, [(1, 1), (1, 1)]),
                                        (2, [(0, 1), (0, 1)])])
def test_conv2d_matches_torch(stride, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 12).astype(np.float32)  # HWIO
    b = rng.randn(12).astype(np.float32)

    y = L.conv2d({"kernel": jnp.array(w), "bias": jnp.array(b)},
                 jnp.array(x), stride=stride, padding=pad)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    if pad == "SAME":
        yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride, padding=1)
    else:
        (t, bm), (lft, r) = pad  # jax pads (lo, hi) per spatial dim
        xt = F.pad(xt, (lft, r, t, bm))
        yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride)
    np.testing.assert_allclose(_np(y), yt.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("eps", [1e-5, 1e-6])
def test_group_norm_matches_torch(eps):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)

    y = L.group_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                     jnp.array(x), num_groups=8, eps=eps)

    yt = F.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 8,
                      torch.from_numpy(scale), torch.from_numpy(bias), eps)
    np.testing.assert_allclose(_np(y), yt.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 7, 64).astype(np.float32)
    scale = rng.randn(64).astype(np.float32)
    bias = rng.randn(64).astype(np.float32)
    y = L.layer_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                     jnp.array(x), eps=1e-5)
    yt = F.layer_norm(torch.from_numpy(x), (64,), torch.from_numpy(scale),
                      torch.from_numpy(bias), 1e-5)
    np.testing.assert_allclose(_np(y), yt.numpy(), rtol=1e-4, atol=1e-5)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    np.testing.assert_allclose(_np(L.gelu(jnp.array(x))),
                               F.gelu(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_silu_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    np.testing.assert_allclose(_np(L.silu(jnp.array(x))),
                               F.silu(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_attention_matches_torch_sdpa():
    rng = np.random.RandomState(3)
    b, sq, skv, heads, d = 2, 10, 7, 4, 32
    x = rng.randn(b, sq, d).astype(np.float32)
    ctx = rng.randn(b, skv, 16).astype(np.float32)
    key = jax.random.PRNGKey(0)
    p = L.init_attention(key, d, heads, cross_dim=16)

    y = L.attention(p, jnp.array(x), jnp.array(ctx), num_heads=heads)

    # torch ground truth with the same weights
    def lin(pp, t):
        w = torch.from_numpy(_np(pp["kernel"]))
        out = t @ w
        if "bias" in pp:
            out = out + torch.from_numpy(_np(pp["bias"]))
        return out

    xt, ct = torch.from_numpy(x), torch.from_numpy(ctx)
    q = lin(p["to_q"], xt).reshape(b, sq, heads, -1).transpose(1, 2)
    k = lin(p["to_k"], ct).reshape(b, skv, heads, -1).transpose(1, 2)
    v = lin(p["to_v"], ct).reshape(b, skv, heads, -1).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, sq, d)
    yt = lin(p["to_out"], o)
    np.testing.assert_allclose(_np(y), yt.numpy(), rtol=1e-4, atol=1e-5)


def test_geglu_ff_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 16).astype(np.float32)
    p = L.init_geglu_ff(jax.random.PRNGKey(1), 16, mult=2)
    y = L.geglu_ff(p, jnp.array(x))

    xt = torch.from_numpy(x)
    h = xt @ torch.from_numpy(_np(p["proj"]["kernel"])) + torch.from_numpy(
        _np(p["proj"]["bias"]))
    a, gate = h.chunk(2, dim=-1)
    o = a * F.gelu(gate)
    yt = o @ torch.from_numpy(_np(p["out"]["kernel"])) + torch.from_numpy(
        _np(p["out"]["bias"]))
    np.testing.assert_allclose(_np(y), yt.numpy(), rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)
    t = np.array([0, 1, 999], dtype=np.int32)
    dim = 320
    emb = _np(L.timestep_embedding(jnp.array(t), dim))
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / half
    freqs = np.exp(exponent)[None] * t[:, None].astype(np.float64)
    expected = np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)
    # fp32 sin/cos of arguments up to ~999 rad: allow ~1e-4 absolute
    np.testing.assert_allclose(emb, expected.astype(np.float32),
                               rtol=1e-3, atol=2e-4)


def test_torch_default_init_bounds():
    p = L.init_conv2d(jax.random.PRNGKey(0), 8, 16, 3)
    bound = 1.0 / np.sqrt(8 * 9)
    assert np.abs(_np(p["kernel"])).max() <= bound
    assert np.abs(_np(p["bias"])).max() <= bound


def test_upsample_nearest_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    y = L.upsample_nearest_2x(jnp.array(x))
    yt = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       scale_factor=2, mode="nearest")
    np.testing.assert_allclose(_np(y), yt.numpy().transpose(0, 2, 3, 1))

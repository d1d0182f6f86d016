"""AutoencoderKL-equivalent VAE with first-class skip taps and skip fusion.

The reference monkey-patches the diffusers VAE: the encoder stores each
down-block *input* on `self.current_down_blocks`, and the decoder reads
`self.incoming_skip_acts` / `self.gamma` / `self.ignore_skip` attributes and
adds four "zero-conv" projections before its up-blocks
(reference: src/model.py:14-54, skip convs at src/pix2pix_turbo.py:40-43).

Here that dataflow is explicit and functional:
- `encode(params, cfg, x)` returns `(moments, skips)` — skips are the four
  down-block input activations, returned, not stashed on an object.
- `decode(params, cfg, z, skips, gamma)` takes the skips and the gamma blend
  factor as arguments (`gamma` is a traced scalar so the stochastic r-path
  jits into a single program).

Numerics follow diffusers' AutoencoderKL (SD 2.x VAE): GroupNorm(32, eps
1e-6), SiLU, asymmetric (0,1)x(0,1) padded stride-2 downsample convs,
nearest-2x upsampling, single-head mid-block attention with biased
projections, quant/post-quant 1x1 convs, DiagonalGaussian with logvar
clipped to [-30, 20].
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.configs import VAEConfig
from img2img_turbo_tpu.models import layers as L


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch: int, out_ch: int):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": L.init_group_norm(in_ch),
        "conv1": L.init_conv2d(k1, in_ch, out_ch, 3),
        "norm2": L.init_group_norm(out_ch),
        "conv2": L.init_conv2d(k2, out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = L.init_conv2d(k3, in_ch, out_ch, 1)
    return p


def _resnet(p, x, cfg: VAEConfig, x_stats=None, emit_stats: bool = False,
            epilogue_skip=None):
    """x_stats / emit_stats: GroupNorm partial-sum chaining between Pallas
    kernels (models/layers.gn_silu_conv) — GN1 consumes the producing
    kernel's stats, conv1 emits for GN2, conv2 optionally emits for the
    next consumer. epilogue_skip: a zero-conv skip fused into conv2's
    epilogue (the skip-decoder add that follows this block in the
    reference dataflow). All None/no-op on non-TPU paths."""
    h, s1 = L.gn_silu_conv(p["norm1"], p["conv1"], x,
                           cfg.norm_num_groups, cfg.norm_eps,
                           x_stats=x_stats, emit_stats=True)
    if "conv_shortcut" in p and epilogue_skip is None:
        # fold the 1x1 shortcut into conv2's epilogue matmul — an XLA 1x1
        # conv here would be layout-pinned by its Pallas neighbors
        residual = None
        skip = {"x": x, "kernel": p["conv_shortcut"]["kernel"],
                "bias": p["conv_shortcut"]["bias"], "gamma": 1.0}
    else:
        residual = (L.conv2d(p["conv_shortcut"], x)
                    if "conv_shortcut" in p else x)
        skip = epilogue_skip
    return L.gn_silu_conv(p["norm2"], p["conv2"], h,
                          cfg.norm_num_groups, cfg.norm_eps,
                          residual=residual, x_stats=s1,
                          emit_stats=emit_stats, skip=skip)


def _init_mid_attn(key, ch: int):
    keys = jax.random.split(key, 4)
    return {
        "norm": L.init_group_norm(ch),
        "to_q": L.init_linear(keys[0], ch, ch, bias=True),
        "to_k": L.init_linear(keys[1], ch, ch, bias=True),
        "to_v": L.init_linear(keys[2], ch, ch, bias=True),
        "to_out": L.init_linear(keys[3], ch, ch, bias=True),
    }


def _mid_attn(p, x, cfg: VAEConfig, x_stats=None):
    """Single-head spatial self-attention with residual (SD VAE attn_1).

    On TPU the biased q/k/v projections run as one 3-output Pallas matmul
    and to_out fuses the residual add (ops/fused_matmul.py) — between the
    Pallas GN-statted input and the flash kernel no XLA dot remains."""
    b, h, w, c = x.shape
    hidden = L.group_norm(p["norm"], x, cfg.norm_num_groups, cfg.norm_eps,
                          x_stats=x_stats)
    hidden = hidden.reshape(b, h * w, c)
    qkv = L._fused_mm(hidden, (p["to_q"]["kernel"], p["to_k"]["kernel"],
                               p["to_v"]["kernel"]),
                      (p["to_q"]["bias"], p["to_k"]["bias"],
                       p["to_v"]["bias"]))
    if qkv is not None:
        q, k, v = qkv
    else:
        q = L.linear(p["to_q"], hidden)
        k = L.linear(p["to_k"], hidden)
        v = L.linear(p["to_v"], hidden)
    # 64x64 latents give 4096 tokens here; the folded flash kernel avoids
    # the 4096^2 score materialization (routes to XLA on CPU)
    from img2img_turbo_tpu.ops.attention import multihead_attention
    o = multihead_attention(q, k, v, num_heads=1)
    return L.linear_fused(p["to_out"], o,
                          residual=x.reshape(b, h * w, c)).reshape(
        b, h, w, c)


def _init_mid(key, ch: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "res1": _init_resnet(k1, ch, ch),
        "attn": _init_mid_attn(k2, ch),
        "res2": _init_resnet(k3, ch, ch),
    }


def _mid(p, x, cfg: VAEConfig, x_stats=None, emit_stats: bool = False,
         epilogue_skip=None):
    x, s = _resnet(p["res1"], x, cfg, x_stats=x_stats, emit_stats=True)
    x = _mid_attn(p["attn"], x, cfg, x_stats=s)
    return _resnet(p["res2"], x, cfg, emit_stats=emit_stats,
                   epilogue_skip=epilogue_skip)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def init_encoder(key, cfg: VAEConfig):
    chans = cfg.block_out_channels
    keys = jax.random.split(key, cfg.num_levels + 4)
    down = []
    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        bkeys = jax.random.split(keys[i], cfg.layers_per_block + 1)
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(_init_resnet(bkeys[j], in_ch if j == 0 else out_ch,
                                        out_ch))
        block = {"resnets": resnets}
        if i < cfg.num_levels - 1:
            block["downsample"] = L.init_conv2d(bkeys[-1], out_ch, out_ch, 3)
        down.append(block)
        in_ch = out_ch
    return {
        "conv_in": L.init_conv2d(keys[-4], cfg.in_channels, chans[0], 3),
        "down": down,
        "mid": _init_mid(keys[-3], chans[-1]),
        "norm_out": L.init_group_norm(chans[-1]),
        "conv_out": L.init_conv2d(keys[-2], chans[-1],
                                  2 * cfg.latent_channels, 3),
    }


def encoder_forward(p, cfg: VAEConfig, x) -> Tuple[jax.Array, List[jax.Array]]:
    """Returns (moments (B,H/8,W/8,2*latent), skips[4]).

    skips[i] is the *input* activation of down-block i, matching the
    reference's `current_down_blocks` tap (src/model.py:17-22).
    """
    sample, stats = L.plain_conv3x3(p["conv_in"], x, emit_stats=True)
    skips = []
    for i, block in enumerate(p["down"]):
        skips.append(sample)
        has_down = "downsample" in block
        n_res = len(block["resnets"])
        for j, res in enumerate(block["resnets"]):
            # the downsample conv reads raw activations (no GN), so the
            # block's last resnet only emits stats when mid comes next
            emit = not (has_down and j == n_res - 1)
            out = _resnet(res, sample, cfg, x_stats=stats, emit_stats=emit)
            sample, stats = out if emit else (out, None)
        if has_down:
            sample, stats = L.downsample2x_conv(block["downsample"], sample,
                                                pad_lo=0, emit_stats=True)
    sample, stats = _mid(p["mid"], sample, cfg, x_stats=stats,
                         emit_stats=True)
    sample = L.gn_silu_conv(p["norm_out"], p["conv_out"], sample,
                            cfg.norm_num_groups, cfg.norm_eps,
                            x_stats=stats)
    return sample, skips


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: VAEConfig, with_skip_convs: bool = True,
                 skip_init: float = 1e-5):
    chans = list(reversed(cfg.block_out_channels))
    keys = jax.random.split(key, cfg.num_levels + 5)
    up = []
    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        bkeys = jax.random.split(keys[i], cfg.layers_per_block + 2)
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_init_resnet(bkeys[j], in_ch if j == 0 else out_ch,
                                        out_ch))
        block = {"resnets": resnets}
        if i < cfg.num_levels - 1:
            block["upsample"] = L.init_conv2d(bkeys[-1], out_ch, out_ch, 3)
        up.append(block)
        in_ch = out_ch
    p = {
        "conv_in": L.init_conv2d(keys[-5], cfg.latent_channels, chans[0], 3),
        "mid": _init_mid(keys[-4], chans[0]),
        "up": up,
        "norm_out": L.init_group_norm(chans[-1]),
        "conv_out": L.init_conv2d(keys[-3], chans[-1], cfg.out_channels, 3),
    }
    if with_skip_convs:
        # bias-free 1x1 zero-convs, constant-initialized (reference:
        # src/pix2pix_turbo.py:133-136 / src/cyclegan_turbo.py:95-98)
        p["skip_convs"] = [
            {"kernel": jnp.full((1, 1, ic, oc), skip_init, jnp.float32)}
            for ic, oc in cfg.skip_conv_channels
        ]
    return p


def decoder_forward(p, cfg: VAEConfig, z,
                    skips: Optional[List[jax.Array]] = None,
                    gamma=1.0):
    """Decode latents; if `skips` is given, fuse them through the zero-convs
    before each up-block (reference: src/model.py:36-44)."""
    rskips = skips[::-1] if skips is not None else None

    def mk_skip(i):
        # the reference adds conv1x1(skip*gamma) before up-block i
        # (src/model.py:36-44); here that zero-conv rides in the PRODUCING
        # kernel's epilogue (mid res2 for block 0, the upsample kernel for
        # blocks 1..3) so the add costs no extra HBM pass and GroupNorm
        # stat chaining survives across it
        if rskips is None:
            return None
        return {"x": rskips[i], "kernel": p["skip_convs"][i]["kernel"],
                "gamma": gamma}

    sample, stats = L.plain_conv3x3(p["conv_in"], z, emit_stats=True)
    sample, stats = _mid(p["mid"], sample, cfg, x_stats=stats,
                         emit_stats=True, epilogue_skip=mk_skip(0))
    for i, block in enumerate(p["up"]):
        has_up = "upsample" in block
        n_res = len(block["resnets"])
        for j, res in enumerate(block["resnets"]):
            emit = not (has_up and j == n_res - 1)
            out = _resnet(res, sample, cfg, x_stats=stats, emit_stats=emit)
            sample, stats = out if emit else (out, None)
        if has_up:
            sample, stats = L.upsample2x_conv(block["upsample"], sample,
                                              emit_stats=True,
                                              skip=mk_skip(i + 1))
    sample = L.gn_silu_conv(p["norm_out"], p["conv_out"], sample,
                            cfg.norm_num_groups, cfg.norm_eps,
                            x_stats=stats)
    return sample


# ---------------------------------------------------------------------------
# Full AutoencoderKL equivalent
# ---------------------------------------------------------------------------


def init_vae(key, cfg: VAEConfig, with_skip_convs: bool = True,
             skip_init: float = 1e-5):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder": init_encoder(k1, cfg),
        "decoder": init_decoder(k2, cfg, with_skip_convs, skip_init),
        "quant_conv": L.init_conv2d(k3, 2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1),
        "post_quant_conv": L.init_conv2d(k4, cfg.latent_channels,
                                         cfg.latent_channels, 1),
    }


def encode(params, cfg: VAEConfig, x, rng=None, sample_posterior: bool = True):
    """x (B,H,W,3) -> (latents (B,H/8,W/8,4) *unscaled*, skips).

    The reference always *samples* the posterior, even at inference
    (src/pix2pix_turbo.py:198: `.latent_dist.sample()`), so `rng` is required
    unless sample_posterior=False (then the mode/mean is returned).
    """
    moments, skips = encoder_forward(params["encoder"], cfg, x)
    moments = L.conv2d(params["quant_conv"], moments)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if not sample_posterior:
        return mean, skips
    logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
    std = jnp.exp(0.5 * logvar).astype(mean.dtype)
    noise = jax.random.normal(rng, mean.shape, mean.dtype)
    return mean + std * noise, skips


def decode(params, cfg: VAEConfig, z, skips=None, gamma=1.0):
    """Unscaled latents -> image in [-1, 1] range (unclamped; pipelines
    clamp, matching reference pix2pix_turbo.py:203)."""
    z = L.conv2d(params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], cfg, z, skips, gamma)

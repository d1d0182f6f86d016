"""UNet2DConditionModel-equivalent (SD 2.x / SD-Turbo topology), NHWC + JAX.

The reference's ~866M-param UNet comes from diffusers
(/root/reference/src/pix2pix_turbo.py:45, cyclegan_turbo.py:116); this is a
ground-up functional reimplementation. Topology (sd-turbo HF config):
4-channel latents, block_out_channels (320, 640, 1280, 1280), 2 layers per
block, cross-attention dim 1024, heads (5, 10, 20, 20) with head_dim 64,
linear transformer projections (SD 2.x `use_linear_projection=True`).

TwinConv (reference pix2pix_turbo.py:16-26) — the stochastic sketch path's
blend of frozen-pretrained and trainable input convs with a *runtime* blend
factor r — is expressed here as a param variant: when `params["conv_in"]`
holds {"pretrained", "current"}, the forward takes a traced scalar `r` and
computes stop_grad(conv_pre(x))*(1-r) + conv_cur(x)*r, so a single compiled
program serves every r.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from img2img_turbo_tpu.configs import UNetConfig
from img2img_turbo_tpu.models import layers as L


# ---------------------------------------------------------------------------
# ResNet block (with time embedding)
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch: int, out_ch: int, temb_dim: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": L.init_group_norm(in_ch),
        "conv1": L.init_conv2d(k1, in_ch, out_ch, 3),
        "time_emb_proj": L.init_linear(k2, temb_dim, out_ch),
        "norm2": L.init_group_norm(out_ch),
        "conv2": L.init_conv2d(k3, out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = L.init_conv2d(k4, in_ch, out_ch, 1)
    return p


def _resnet(p, x, temb, cfg: UNetConfig):
    h = L.group_norm(p["norm1"], x, cfg.norm_num_groups, cfg.norm_eps)
    h = L.conv2d(p["conv1"], L.silu(h))
    t = L.linear(p["time_emb_proj"], L.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = L.group_norm(p["norm2"], h, cfg.norm_num_groups, cfg.norm_eps)
    h = L.conv2d(p["conv2"], L.silu(h))
    if "conv_shortcut" in p:
        x = L.conv2d(p["conv_shortcut"], x)
    return x + h


# ---------------------------------------------------------------------------
# Transformer2D block (1 BasicTransformerBlock, linear proj in/out)
# ---------------------------------------------------------------------------


def _init_transformer(key, ch: int, num_heads: int, cross_dim: int):
    keys = jax.random.split(key, 7)
    return {
        "norm": L.init_group_norm(ch),
        "proj_in": L.init_linear(keys[0], ch, ch),
        "norm1": L.init_layer_norm(ch),
        "attn1": L.init_attention(keys[1], ch, num_heads),
        "norm2": L.init_layer_norm(ch),
        "attn2": L.init_attention(keys[2], ch, num_heads, cross_dim=cross_dim),
        "norm3": L.init_layer_norm(ch),
        "ff": L.init_geglu_ff(keys[3], ch),
        "proj_out": L.init_linear(keys[4], ch, ch),
    }


def _transformer(p, x, context, num_heads: int, cfg: UNetConfig, attn_fn):
    b, h, w, c = x.shape
    residual = x
    hidden = L.group_norm(p["norm"], x, cfg.norm_num_groups, cfg.attn_norm_eps)
    hidden = hidden.reshape(b, h * w, c)
    hidden = L.linear(p["proj_in"], hidden)
    # BasicTransformerBlock
    hidden = hidden + L.attention(
        p["attn1"], L.layer_norm(p["norm1"], hidden),
        num_heads=num_heads, attn_fn=attn_fn)
    hidden = hidden + L.attention(
        p["attn2"], L.layer_norm(p["norm2"], hidden), context,
        num_heads=num_heads, attn_fn=attn_fn)
    hidden = hidden + L.geglu_ff(p["ff"], L.layer_norm(p["norm3"], hidden))
    hidden = L.linear(p["proj_out"], hidden)
    return hidden.reshape(b, h, w, c) + residual


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_unet(key, cfg: UNetConfig):
    chans = cfg.block_out_channels
    temb_dim = cfg.time_embed_dim
    n = cfg.num_levels
    keys = jax.random.split(key, 2 * n + 6)

    down = []
    in_ch = chans[0]
    for i, out_ch in enumerate(chans):
        bkeys = jax.random.split(keys[i], 2 * cfg.layers_per_block + 1)
        resnets, attns = [], []
        for j in range(cfg.layers_per_block):
            resnets.append(_init_resnet(bkeys[2 * j],
                                        in_ch if j == 0 else out_ch,
                                        out_ch, temb_dim))
            if cfg.transformer_levels[i]:
                attns.append(_init_transformer(
                    bkeys[2 * j + 1], out_ch, cfg.attention_head_dim[i],
                    cfg.cross_attention_dim))
        block = {"resnets": resnets}
        if attns:
            block["attns"] = attns
        if i < n - 1:
            block["downsample"] = L.init_conv2d(bkeys[-1], out_ch, out_ch, 3)
        down.append(block)
        in_ch = out_ch

    mkeys = jax.random.split(keys[n], 3)
    mid = {
        "res1": _init_resnet(mkeys[0], chans[-1], chans[-1], temb_dim),
        "attn": _init_transformer(mkeys[1], chans[-1],
                                  cfg.attention_head_dim[-1],
                                  cfg.cross_attention_dim),
        "res2": _init_resnet(mkeys[2], chans[-1], chans[-1], temb_dim),
    }

    rev = list(reversed(chans))
    rev_heads = list(reversed(cfg.attention_head_dim))
    rev_tlevels = list(reversed(cfg.transformer_levels))
    up = []
    prev_out = chans[-1]
    for i in range(n):
        out_ch = rev[i]
        input_ch = rev[min(i + 1, n - 1)]
        bkeys = jax.random.split(keys[n + 1 + i],
                                 2 * (cfg.layers_per_block + 1) + 1)
        resnets, attns = [], []
        for j in range(cfg.layers_per_block + 1):
            res_skip = input_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            resnets.append(_init_resnet(bkeys[2 * j], res_in + res_skip,
                                        out_ch, temb_dim))
            if rev_tlevels[i]:
                attns.append(_init_transformer(
                    bkeys[2 * j + 1], out_ch, rev_heads[i],
                    cfg.cross_attention_dim))
        block = {"resnets": resnets}
        if attns:
            block["attns"] = attns
        if i < n - 1:
            block["upsample"] = L.init_conv2d(bkeys[-1], out_ch, out_ch, 3)
        up.append(block)
        prev_out = out_ch

    return {
        "conv_in": L.init_conv2d(keys[-4], cfg.in_channels, chans[0], 3),
        "time_mlp": {
            "lin1": L.init_linear(keys[-3], chans[0], temb_dim),
            "lin2": L.init_linear(keys[-2], temb_dim, temb_dim),
        },
        "down": down,
        "mid": mid,
        "up": up,
        "norm_out": L.init_group_norm(chans[0]),
        "conv_out": L.init_conv2d(keys[-1], chans[0], cfg.out_channels, 3),
    }


def make_twin_conv_in(params):
    """Wrap the UNet's conv_in into a TwinConv param pair (reference
    pix2pix_turbo.py:100-101): frozen pretrained copy + trainable copy."""
    conv = params["conv_in"]
    if "pretrained" in conv:
        return params
    new = dict(params)
    new["conv_in"] = {
        "pretrained": jax.tree_util.tree_map(jnp.copy, conv),
        "current": conv,
    }
    return new


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def unet_forward(params, cfg: UNetConfig, x, timesteps, context,
                 r: Optional[jax.Array] = None, attn_fn=None,
                 remat: bool = False):
    """x: (B, H, W, 4) latents; timesteps: (B,) int; context: (B, 77, 1024).

    r: TwinConv blend factor (required iff conv_in is a twin pair).
    remat: apply jax.checkpoint to each down/mid/up block (training).
    """
    # attn_fn=None routes through ops.attention.multihead_attention
    # (transpose-free folded flash kernel on TPU, XLA path elsewhere)
    temb = L.timestep_embedding(timesteps, cfg.block_out_channels[0],
                                cfg.flip_sin_to_cos, cfg.freq_shift)
    temb = L.linear(params["time_mlp"]["lin2"],
                    L.silu(L.linear(params["time_mlp"]["lin1"],
                                    temb.astype(x.dtype))))

    conv_in = params["conv_in"]
    if "pretrained" in conv_in:
        assert r is not None, "TwinConv requires the blend factor r"
        r = jnp.asarray(r, x.dtype)
        x1 = jax.lax.stop_gradient(L.conv2d(conv_in["pretrained"], x))
        x2 = L.conv2d(conv_in["current"], x)
        sample = x1 * (1.0 - r) + x2 * r
    else:
        sample = L.conv2d(conv_in, x)

    def run_down_block(block, sample, temb, context):
        outs = []
        attns = block.get("attns")
        for j, res in enumerate(block["resnets"]):
            sample = _resnet(res, sample, temb, cfg)
            if attns is not None:
                heads = attns[j]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
                sample = _transformer(attns[j], sample, context, heads, cfg,
                                      attn_fn)
            outs.append(sample)
        if "downsample" in block:
            sample = L.conv2d(block["downsample"], sample, stride=2,
                              padding=[(1, 1), (1, 1)])
            outs.append(sample)
        return sample, outs

    def run_up_block(block, sample, res_samples, temb, context,
                     upsample_size):
        attns = block.get("attns")
        for j, res in enumerate(block["resnets"]):
            skip = res_samples[-(j + 1)]
            sample = jnp.concatenate([sample, skip], axis=-1)
            sample = _resnet(res, sample, temb, cfg)
            if attns is not None:
                heads = attns[j]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
                sample = _transformer(attns[j], sample, context, heads, cfg,
                                      attn_fn)
        if "upsample" in block:
            b, h, w, c = sample.shape
            if upsample_size is not None and upsample_size != (2 * h, 2 * w):
                # odd skip sizes: upsample to the next level's exact size
                # (diffusers forward_upsample_size semantics — torch-nearest
                # interpolation to the stored residual's spatial dims)
                up = L.upsample_nearest_to(sample, upsample_size)
            else:
                up = L.upsample_nearest_2x(sample)
            sample = L.conv2d(block["upsample"], up)
        return sample

    def run_mid(mid, sample, temb, context):
        sample = _resnet(mid["res1"], sample, temb, cfg)
        heads = mid["attn"]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
        sample = _transformer(mid["attn"], sample, context, heads, cfg,
                              attn_fn)
        return _resnet(mid["res2"], sample, temb, cfg)

    if remat:
        run_down_block = jax.checkpoint(run_down_block)
        # upsample_size is a static shape tuple — keep it out of the traced
        # args by declaring it static to jax.checkpoint
        run_up_block = jax.checkpoint(run_up_block, static_argnums=(5,))
        run_mid = jax.checkpoint(run_mid)

    res_stack = [sample]
    for block in params["down"]:
        sample, outs = run_down_block(block, sample, temb, context)
        res_stack.extend(outs)

    sample = run_mid(params["mid"], sample, temb, context)

    for block in params["up"]:
        k = len(block["resnets"])
        res_samples, res_stack = res_stack[-k:], res_stack[:-k]
        upsample_size = (tuple(res_stack[-1].shape[1:3])
                         if res_stack else None)
        sample = run_up_block(block, sample, res_samples, temb, context,
                              upsample_size)

    sample = L.group_norm(params["norm_out"], sample, cfg.norm_num_groups,
                          cfg.norm_eps)
    sample = L.conv2d(params["conv_out"], L.silu(sample))
    return sample


def _head_dim(cfg: UNetConfig) -> int:
    """Per-head dim is constant across levels (64 for SD)."""
    return cfg.block_out_channels[0] // cfg.attention_head_dim[0]

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


def _concat_resnet(p, parts, part_stats, temb, cfg: UNetConfig,
                   emit_stats: bool = False):
    """_resnet over concat(parts, axis=-1) without materializing the concat
    when the parts can run the fused Pallas path separately.

    conv3x3 over a channel concat is exactly the sum of per-part convs with
    the weight slices, and GroupNorm statistics stay per-group, so as long
    as no group crosses a part boundary the normalization splits too. This
    rescues the UNet's 2560-ch up-block entries, whose concatenated weight
    block exceeds the kernel's VMEM budget as a single call
    (ops/fused_conv._W_BUDGET), and skips the concat's HBM round trip.
    """
    from img2img_turbo_tpu.ops import fused_conv
    from img2img_turbo_tpu.models.layers import _pallas_tpu

    c_total = sum(part.shape[-1] for part in parts)
    co = p["conv1"]["kernel"].shape[-1]
    gsize = c_total // cfg.norm_num_groups
    shape0 = parts[0].shape[:-1]
    splittable = (
        _pallas_tpu()
        and not fused_conv.supported(shape0 + (c_total,), co)
        and all(part.shape[-1] % gsize == 0 for part in parts)
        and all(fused_conv.supported(shape0 + (part.shape[-1],), co)
                for part in parts))
    if not splittable:
        x = jnp.concatenate(parts, axis=-1)
        return _resnet(p, x, temb, cfg, emit_stats=emit_stats)

    t = L.linear(p["time_emb_proj"], L.silu(temb))
    h = None
    s1 = None
    off = 0
    for idx, part in enumerate(parts):
        c_p = part.shape[-1]
        last = idx == len(parts) - 1
        gn_p = {"scale": p["norm1"]["scale"][off:off + c_p],
                "bias": p["norm1"]["bias"][off:off + c_p]}
        conv_p = {"kernel": p["conv1"]["kernel"][:, :, off:off + c_p, :],
                  "bias": (p["conv1"]["bias"] if idx == 0 else
                           jnp.zeros_like(p["conv1"]["bias"]))}
        out = L.gn_silu_conv(
            gn_p, conv_p, part, c_p // gsize, cfg.norm_eps,
            extra_bias=t if idx == 0 else None,
            residual=h, x_stats=part_stats[idx], emit_stats=last)
        h, s1 = out if last else (out, None)
        off += c_p
    # 1x1 shortcut over the concat = sum of per-part matmuls (XLA; small)
    sck = p["conv_shortcut"]["kernel"]
    off = 0
    shortcut = p["conv_shortcut"]["bias"].astype(h.dtype)
    for part in parts:
        c_p = part.shape[-1]
        wp = sck[0, 0, off:off + c_p, :].astype(part.dtype)
        shortcut = shortcut + jnp.dot(part, wp,
                                      preferred_element_type=part.dtype)
        off += c_p
    return L.gn_silu_conv(p["norm2"], p["conv2"], h,
                          cfg.norm_num_groups, cfg.norm_eps,
                          residual=shortcut, x_stats=s1,
                          emit_stats=emit_stats)


def _resnet(p, x, temb, cfg: UNetConfig, x_stats=None,
            emit_stats: bool = False):
    """GroupNorm partial-sum chaining as in models/vae.py:_resnet (inert
    off-TPU). conv1 emits for GN2; conv2 optionally emits for the next
    consumer (the following transformer's GN or resnet's GN1)."""
    t = L.linear(p["time_emb_proj"], L.silu(temb))
    h, s1 = L.gn_silu_conv(p["norm1"], p["conv1"], x,
                           cfg.norm_num_groups, cfg.norm_eps, extra_bias=t,
                           x_stats=x_stats, emit_stats=True)
    if "conv_shortcut" in p:
        # 1x1 shortcut folded into conv2's epilogue (see models/vae._resnet)
        residual = None
        skip = {"x": x, "kernel": p["conv_shortcut"]["kernel"],
                "bias": p["conv_shortcut"]["bias"], "gamma": 1.0}
    else:
        residual = x
        skip = None
    return L.gn_silu_conv(p["norm2"], p["conv2"], h,
                          cfg.norm_num_groups, cfg.norm_eps,
                          residual=residual, x_stats=s1,
                          emit_stats=emit_stats, skip=skip)


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


def _transformer(p, x, context, num_heads: int, cfg: UNetConfig, attn_fn,
                 x_stats=None):
    """Transformer2DModel, use_linear_projection=True (diffusers
    transformer_2d.py semantics). On TPU every matmul here runs as a
    Pallas kernel (ops/fused_matmul.py): proj_in, shared-LN qkv, out+
    residual, gated GEGLU, proj_out+residual — so the whole block, flash
    attention included, keeps a Pallas-to-Pallas neighborhood with no XLA
    dots against pinned layouts (the round-2 6-9 ms transformer glue)."""
    b, h, w, c = x.shape
    hidden = L.group_norm(p["norm"], x, cfg.norm_num_groups,
                          cfg.attn_norm_eps, x_stats=x_stats)
    hidden = hidden.reshape(b, h * w, c)
    hidden = L.linear_fused(p["proj_in"], hidden)
    # BasicTransformerBlock
    hidden = L.attention_block(p["attn1"], p["norm1"], hidden,
                               num_heads=num_heads, attn_fn=attn_fn)
    hidden = L.attention_block(p["attn2"], p["norm2"], hidden, context,
                               num_heads=num_heads, attn_fn=attn_fn)
    hidden = L.geglu_ff_block(p["ff"], p["norm3"], hidden)
    hidden = L.linear_fused(p["proj_out"], hidden,
                            residual=x.reshape(b, h * w, c))
    return hidden.reshape(b, h, w, c)


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
        x1 = jax.lax.stop_gradient(L.plain_conv3x3(conv_in["pretrained"], x))
        x2 = L.plain_conv3x3(conv_in["current"], x)
        sample = x1 * (1.0 - r) + x2 * r
    else:
        sample = L.plain_conv3x3(conv_in, x)

    def run_down_block(block, sample, temb, context):
        outs = []
        attns = block.get("attns")
        stats = None
        for j, res in enumerate(block["resnets"]):
            # chain: resnet conv2 -> transformer GN (or next resnet GN1 in
            # attention-free blocks); breaks at transformer residual adds
            # and downsample convs
            sample, stats = _resnet(res, sample, temb, cfg, x_stats=stats,
                                    emit_stats=True)
            if attns is not None:
                heads = attns[j]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
                sample = _transformer(attns[j], sample, context, heads, cfg,
                                      attn_fn, x_stats=stats)
                stats = None
            outs.append(sample)
        if "downsample" in block:
            sample = L.downsample2x_conv(block["downsample"], sample,
                                         pad_lo=1)
            outs.append(sample)
        return sample, outs

    def run_up_block(block, sample, res_samples, temb, context,
                     upsample_size):
        attns = block.get("attns")
        prev_stats = None
        for j, res in enumerate(block["resnets"]):
            skip = res_samples[-(j + 1)]
            # concat resnets run split per part when the fused kernel can't
            # take the full concat (2560-ch entries); otherwise they
            # materialize the concat as usual. conv1 -> conv2 chains inside;
            # conv2 -> transformer GN chains here.
            sample, stats = _concat_resnet(res, [sample, skip],
                                           [prev_stats, None], temb, cfg,
                                           emit_stats=True)
            prev_stats = None
            if attns is not None:
                heads = attns[j]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
                sample = _transformer(attns[j], sample, context, heads, cfg,
                                      attn_fn, x_stats=stats)
            else:
                prev_stats = stats
        if "upsample" in block:
            b, h, w, c = sample.shape
            if upsample_size is not None and upsample_size != (2 * h, 2 * w):
                # odd skip sizes: upsample to the next level's exact size
                # (diffusers forward_upsample_size semantics — torch-nearest
                # interpolation to the stored residual's spatial dims)
                sample = L.conv2d(block["upsample"],
                                  L.upsample_nearest_to(sample, upsample_size))
            else:
                sample = L.upsample2x_conv(block["upsample"], sample)
        return sample

    def run_mid(mid, sample, temb, context):
        sample, stats = _resnet(mid["res1"], sample, temb, cfg,
                                emit_stats=True)
        heads = mid["attn"]["attn1"]["to_q"]["kernel"].shape[0] // _head_dim(cfg)
        sample = _transformer(mid["attn"], sample, context, heads, cfg,
                              attn_fn, x_stats=stats)
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

    sample = L.gn_silu_conv(params["norm_out"], params["conv_out"], sample,
                            cfg.norm_num_groups, cfg.norm_eps)
    return sample


def _head_dim(cfg: UNetConfig) -> int:
    """Per-head dim is constant across levels (64 for SD)."""
    return cfg.block_out_channels[0] // cfg.attention_head_dim[0]

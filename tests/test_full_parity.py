"""FULL-MODEL torch-mirror goldens: the complete UNet2DConditionModel and
AutoencoderKL (with the reference's skip-tap/skip-conv surgery) forwards,
hand-written in torch from diffusers-0.25.1 semantics, vs this framework's
composed JAX models — weights shared through the production converters
(weights/torch_import.py) in BOTH directions.

Block-level parity (test_block_parity.py) proves each block; these tests
pin the COMPOSITION: skip-stack push/pop order, conv_in/downsample pushes,
mid placement, up-block concat order, `forward_upsample_size` odd-latent
targets, the t=999 time-embedding path into every resnet, the VAE skip
tap points (down-block inputs) and the decoder's gamma-scaled zero-conv
fusion points (reference src/model.py:14-54, src/pix2pix_turbo.py:40-44).
This is the strongest offline proxy for the LPIPS<=0.05 acceptance bar
(BASELINE.md) — a composition/wiring mistake that passes every block test
fails here.

Runs tiny-config at even AND odd latent sizes, plus the full 866M SD-Turbo
topology at 8x8 and odd 17x13 latents (the 512^2 / x8-cropped 840x560
serving configs' exact weight shapes, reduced spatial extent — spatial
size does not change wiring).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.weights import torch_import as ti

from test_block_parity import (t_resnet, t_transformer2d, t_vae_attn,
                               t_timestep_embedding)


def _sd_to_torch(sd):
    return {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
            sd.items()}


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)


def _close(jax_nhwc, torch_nchw, atol, rtol):
    got = np.asarray(jax_nhwc, np.float32)
    want = torch_nchw.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def _conv(sd, p, x, stride=1, padding=1):
    return F.conv2d(x, sd[p + ".weight"], sd.get(p + ".bias"),
                    stride=stride, padding=padding)


# ---------------------------------------------------------------------------
# torch mirrors (diffusers 0.25.1 forward semantics)
# ---------------------------------------------------------------------------


def t_unet_forward(sd, cfg, x, t, ctx):
    """UNet2DConditionModel.forward: conv_in push, per-resnet pushes,
    downsample pushes, mid, up-block pop+concat, odd-size upsample
    targets, norm/silu/conv_out."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    n = cfg.num_levels
    heads = cfg.attention_head_dim
    temb = t_timestep_embedding(t, cfg.block_out_channels[0])
    emb = F.linear(temb, sd["time_embedding.linear_1.weight"],
                   sd["time_embedding.linear_1.bias"])
    emb = F.linear(F.silu(emb), sd["time_embedding.linear_2.weight"],
                   sd["time_embedding.linear_2.bias"])

    # default_overall_up_factor = 2**num_upsamplers; odd latents switch the
    # upsamplers to explicit size targets taken from the next skip
    up_factor = 2 ** (n - 1)
    forward_upsample_size = any(d % up_factor != 0 for d in x.shape[-2:])

    h = _conv(sd, "conv_in", x)
    res_samples = [h]
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, temb=emb,
                         eps=eps, groups=g)
            if cfg.transformer_levels[i]:
                h = t_transformer2d(sd, f"down_blocks.{i}.attentions.{j}",
                                    h, heads[i], ctx, groups=g)
            res_samples.append(h)
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            h = _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h,
                      stride=2, padding=1)
            res_samples.append(h)

    h = t_resnet(sd, "mid_block.resnets.0", h, temb=emb, eps=eps, groups=g)
    h = t_transformer2d(sd, "mid_block.attentions.0", h, heads[-1], ctx,
                        groups=g)
    h = t_resnet(sd, "mid_block.resnets.1", h, temb=emb, eps=eps, groups=g)

    rev_heads = list(reversed(heads))
    rev_tlevels = list(reversed(cfg.transformer_levels))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            res = res_samples.pop()
            h = torch.cat([h, res], dim=1)
            h = t_resnet(sd, f"up_blocks.{i}.resnets.{j}", h, temb=emb,
                         eps=eps, groups=g)
            if rev_tlevels[i]:
                h = t_transformer2d(sd, f"up_blocks.{i}.attentions.{j}", h,
                                    rev_heads[i], ctx, groups=g)
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            if forward_upsample_size and res_samples:
                h = F.interpolate(h, size=res_samples[-1].shape[2:],
                                  mode="nearest")
            else:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.group_norm(h, g, sd["conv_norm_out.weight"],
                     sd["conv_norm_out.bias"], eps)
    return _conv(sd, "conv_out", F.silu(h))


def t_vae_encode_moments(sd, cfg, x):
    """AutoencoderKL.encode up to the quant_conv moments, with the
    reference's skip taps (inputs of each down block, src/model.py:14-27).
    Returns (moments, skips)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    h = _conv(sd, "encoder.conv_in", x)
    skips = []
    for i in range(cfg.num_levels):
        skips.append(h)
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h,
                         eps=eps, groups=g)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            h = F.pad(h, (0, 1, 0, 1))  # diffusers VAE asymmetric pad
            h = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      h, stride=2, padding=0)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h, eps=eps, groups=g)
    h = t_vae_attn(sd, "encoder.mid_block.attentions.0", h, groups=g)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h, eps=eps, groups=g)
    h = F.group_norm(h, g, sd["encoder.conv_norm_out.weight"],
                     sd["encoder.conv_norm_out.bias"], eps)
    h = _conv(sd, "encoder.conv_out", F.silu(h))
    return _conv(sd, "quant_conv", h, padding=0), skips


def t_vae_decode(sd, cfg, z, skips, gamma):
    """post_quant_conv -> Decoder with the reference's skip fusion: before
    up-block idx, add skip_conv_{idx+1}(skips[::-1][idx] * gamma)
    (src/model.py:30-46); 1x1 bias-free skip convs
    (src/pix2pix_turbo.py:40-43)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    h = _conv(sd, "post_quant_conv", z, padding=0)
    h = _conv(sd, "decoder.conv_in", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h, eps=eps, groups=g)
    h = t_vae_attn(sd, "decoder.mid_block.attentions.0", h, groups=g)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h, eps=eps, groups=g)
    rskips = skips[::-1]
    for i in range(cfg.num_levels):
        skip_in = F.conv2d(rskips[i] * gamma,
                           sd[f"decoder.skip_conv_{i + 1}.weight"])
        h = h + skip_in
        for j in range(cfg.layers_per_block + 1):
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h,
                         eps=eps, groups=g)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.group_norm(h, g, sd["decoder.conv_norm_out.weight"],
                     sd["decoder.conv_norm_out.bias"], eps)
    return _conv(sd, "decoder.conv_out", F.silu(h))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _tree_equal(a, b, path=""):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for p, leaf in la:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(lb[p]),
            err_msg=jax.tree_util.keystr(p))


class TestFullUNetParity:
    @pytest.mark.parametrize("latent_hw", [(8, 8), (17, 13)])
    def test_tiny_full_forward_t999(self, latent_hw):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        sd = _sd_to_torch(ti.export_unet_state_dict(params))
        # production-converter round trip: import(export(p)) == p
        back = ti.convert_unet_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        _tree_equal(params, back)

        h, w = latent_hw
        rng = np.random.RandomState(1)
        z = rng.randn(2, h, w, cfg.in_channels).astype(np.float32)
        ctx = rng.randn(2, 77, cfg.cross_attention_dim).astype(np.float32)
        t = np.full((2,), 999, np.int64)
        with torch.no_grad():
            want = t_unet_forward(sd, cfg, _nchw(z), torch.from_numpy(t),
                                  torch.from_numpy(ctx))
        got = unet_mod.unet_forward(back, cfg, jnp.asarray(z),
                                    jnp.asarray(t, jnp.int32),
                                    jnp.asarray(ctx))
        _close(got, want, atol=5e-4, rtol=5e-4)

    def test_full_topology_866m_t999(self):
        """The real SD-Turbo shapes (866M params): every channel width,
        head count, shortcut, and concat width of the serving config —
        at 8x8 and odd 17x13 latents."""
        cfg = configs.SD_TURBO_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        sd = _sd_to_torch(ti.export_unet_state_dict(params))
        back = ti.convert_unet_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        _tree_equal(params, back)
        del params

        rng = np.random.RandomState(2)
        for hw in [(8, 8), (17, 13)]:
            z = rng.randn(1, *hw, cfg.in_channels).astype(np.float32)
            ctx = (rng.randn(1, 77, cfg.cross_attention_dim)
                   .astype(np.float32) * 0.2)
            t = np.full((1,), 999, np.int64)
            with torch.no_grad():
                want = t_unet_forward(sd, cfg, _nchw(z),
                                      torch.from_numpy(t),
                                      torch.from_numpy(ctx))
            got = unet_mod.unet_forward(back, cfg, jnp.asarray(z),
                                        jnp.asarray(t, jnp.int32),
                                        jnp.asarray(ctx))
            _close(got, want, atol=2e-3, rtol=2e-3)


class TestFullVAEParity:
    @pytest.mark.parametrize("hw", [(32, 32), (56, 40)])
    def test_tiny_encode_decode_with_skips(self, hw):
        cfg = configs.TINY_VAE
        params = vae_mod.init_vae(jax.random.PRNGKey(3), cfg,
                                  skip_init=0.05)
        sd = _sd_to_torch(ti.export_vae_state_dict(params))
        back = ti.convert_vae_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        _tree_equal(params, back)

        h, w = hw
        rng = np.random.RandomState(4)
        x = rng.randn(2, h, w, 3).astype(np.float32)
        with torch.no_grad():
            want_m, t_skips = t_vae_encode_moments(sd, cfg, _nchw(x))
        got_mean, got_skips = vae_mod.encode(back, cfg, jnp.asarray(x),
                                             sample_posterior=False)
        want_mean = want_m[:, :cfg.latent_channels]
        _close(got_mean, want_mean, atol=5e-4, rtol=5e-4)
        assert len(got_skips) == len(t_skips)
        for gs, ts in zip(got_skips, t_skips):
            _close(gs, ts, atol=5e-4, rtol=5e-4)

        gamma = 0.7
        with torch.no_grad():
            want_img = t_vae_decode(sd, cfg, want_mean, t_skips, gamma)
        got_img = vae_mod.decode(back, cfg, got_mean, got_skips,
                                 gamma=gamma)
        _close(got_img, want_img, atol=2e-3, rtol=2e-3)

    def test_full_topology_vae(self):
        """Full SD VAE widths (128..512ch) with skip fusion, even + odd
        spatial."""
        cfg = configs.SD_TURBO_VAE
        params = vae_mod.init_vae(jax.random.PRNGKey(5), cfg,
                                  skip_init=0.05)
        sd = _sd_to_torch(ti.export_vae_state_dict(params))
        back = ti.convert_vae_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        _tree_equal(params, back)
        del params

        rng = np.random.RandomState(6)
        for hw in [(64, 64), (72, 56)]:
            x = rng.randn(1, *hw, 3).astype(np.float32)
            with torch.no_grad():
                want_m, t_skips = t_vae_encode_moments(sd, cfg, _nchw(x))
            got_mean, got_skips = vae_mod.encode(
                back, cfg, jnp.asarray(x), sample_posterior=False)
            _close(got_mean, want_m[:, :cfg.latent_channels], atol=2e-3,
                   rtol=2e-3)
            with torch.no_grad():
                want_img = t_vae_decode(sd, cfg, want_m[:, :4], t_skips,
                                        0.5)
            got_img = vae_mod.decode(back, cfg, got_mean, got_skips,
                                     gamma=0.5)
            _close(got_img, want_img, atol=5e-3, rtol=5e-3)

"""Block-level torch-golden parity: diffusers-0.25.1 block semantics
hand-written in torch (from the library the reference pins in
requirements.txt) vs this framework's JAX blocks, sharing weights through
the production converters. Covers the composition choices reading alone
can't pin: silu-before-conv order, temb injection point, GEGLU split order,
linear proj_in/proj_out, VAE single-head attention residual, asymmetric
downsample padding, nearest-upsample index semantics (incl. odd
`forward_upsample_size` targets), the t=999 timestep embedding, and the
torch-interpolate resizes used by the losses.

Reference call sites: src/model.py:14-54 composes diffusers blocks;
src/train_pix2pix_turbo.py:183 (bilinear 224); vision_aided disc bicubic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import layers as L
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.ops import image as image_mod
from img2img_turbo_tpu.weights import torch_import as ti

GROUPS = 8  # tiny-config GroupNorm groups


def _t(arr):
    return torch.from_numpy(np.asarray(arr, np.float32))


def _rand_sd(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return {k: torch.from_numpy(
        (rng.randn(*s) * 0.2).astype(np.float32)) for k, s in shapes.items()}


def _nhwc(x_torch):
    return jnp.asarray(x_torch.permute(0, 2, 3, 1).numpy())


def _close(jax_nhwc, torch_nchw, atol=2e-5, rtol=2e-5):
    got = np.asarray(jax_nhwc)
    want = torch_nchw.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# torch reference blocks (diffusers 0.25.1 semantics, written from the
# library source the reference pins — NOT from this repo's JAX code)
# ---------------------------------------------------------------------------


def t_resnet(sd, p, x, temb=None, eps=1e-5, groups=GROUPS):
    """diffusers ResnetBlock2D: norm1 -> silu -> conv1 [+ time_emb_proj of
    silu(temb)] -> norm2 -> silu -> conv2; shortcut; /output_scale_factor=1."""
    h = F.group_norm(x, groups, sd[p + ".norm1.weight"],
                     sd[p + ".norm1.bias"], eps)
    h = F.silu(h)
    h = F.conv2d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"],
                 padding=1)
    if temb is not None and p + ".time_emb_proj.weight" in sd:
        t = F.linear(F.silu(temb), sd[p + ".time_emb_proj.weight"],
                     sd[p + ".time_emb_proj.bias"])
        h = h + t[:, :, None, None]
    h = F.group_norm(h, groups, sd[p + ".norm2.weight"],
                     sd[p + ".norm2.bias"], eps)
    h = F.silu(h)
    h = F.conv2d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"],
                 padding=1)
    if p + ".conv_shortcut.weight" in sd:
        x = F.conv2d(x, sd[p + ".conv_shortcut.weight"],
                     sd[p + ".conv_shortcut.bias"])
    return x + h


def t_attention(sd, p, x, heads, context=None):
    """diffusers Attention + AttnProcessor: per-head scaled dot product,
    softmax over keys; to_q/k/v without bias, to_out.0 with bias."""
    ctx = x if context is None else context
    q = F.linear(x, sd[p + ".to_q.weight"])
    k = F.linear(ctx, sd[p + ".to_k.weight"])
    v = F.linear(ctx, sd[p + ".to_v.weight"])
    b, sq, d = q.shape
    hd = d // heads
    q = q.view(b, sq, heads, hd).transpose(1, 2)
    k = k.view(b, -1, heads, hd).transpose(1, 2)
    v = v.view(b, -1, heads, hd).transpose(1, 2)
    attn = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(b, sq, d)
    return F.linear(o, sd[p + ".to_out.0.weight"], sd[p + ".to_out.0.bias"])


def t_transformer2d(sd, p, x, heads, context, groups=GROUPS):
    """diffusers Transformer2DModel with use_linear_projection=True wrapping
    one BasicTransformerBlock: GroupNorm(eps 1e-6) -> flatten -> proj_in
    Linear -> [LN,attn1][LN,attn2(ctx)][LN,GEGLU-FF] each residual ->
    proj_out Linear -> reshape + residual."""
    b, c, h, w = x.shape
    res = x
    hid = F.group_norm(x, groups, sd[p + ".norm.weight"],
                       sd[p + ".norm.bias"], 1e-6)
    hid = hid.permute(0, 2, 3, 1).reshape(b, h * w, c)
    hid = F.linear(hid, sd[p + ".proj_in.weight"], sd[p + ".proj_in.bias"])
    tb = p + ".transformer_blocks.0"
    ln = lambda q, n: F.layer_norm(q, (c,), sd[f"{tb}.{n}.weight"],
                                   sd[f"{tb}.{n}.bias"], 1e-5)
    hid = hid + t_attention(sd, tb + ".attn1", ln(hid, "norm1"), heads)
    hid = hid + t_attention(sd, tb + ".attn2", ln(hid, "norm2"), heads,
                            context)
    # FeedForward(geglu): proj to 2*inner, chunk -> hidden * gelu(gate)
    ff = F.linear(ln(hid, "norm3"), sd[f"{tb}.ff.net.0.proj.weight"],
                  sd[f"{tb}.ff.net.0.proj.bias"])
    hidden, gate = ff.chunk(2, dim=-1)
    ff = hidden * F.gelu(gate)
    hid = hid + F.linear(ff, sd[f"{tb}.ff.net.2.weight"],
                         sd[f"{tb}.ff.net.2.bias"])
    hid = F.linear(hid, sd[p + ".proj_out.weight"], sd[p + ".proj_out.bias"])
    return hid.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


def t_vae_attn(sd, p, x, groups=GROUPS):
    """diffusers VAE mid Attention: single head over spatial tokens, qkv
    with bias, residual_connection=True, rescale_output_factor=1."""
    b, c, h, w = x.shape
    hid = F.group_norm(x, groups, sd[p + ".group_norm.weight"],
                       sd[p + ".group_norm.bias"], 1e-6)
    hid = hid.view(b, c, h * w).transpose(1, 2)
    q = F.linear(hid, sd[p + ".to_q.weight"], sd[p + ".to_q.bias"])
    k = F.linear(hid, sd[p + ".to_k.weight"], sd[p + ".to_k.bias"])
    v = F.linear(hid, sd[p + ".to_v.weight"], sd[p + ".to_v.bias"])
    attn = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
    o = attn @ v
    o = F.linear(o, sd[p + ".to_out.0.weight"], sd[p + ".to_out.0.bias"])
    return o.transpose(1, 2).view(b, c, h, w) + x


def t_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0): exp(-ln(1e4) * i / half), cat([cos, sin])."""
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float64) / half)
    emb = t.double()[:, None] * freqs[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1).float()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class TestUNetBlocks:
    @pytest.mark.parametrize("hw", [(8, 8), (7, 5)])
    def test_resnet_with_temb_and_shortcut(self, hw):
        cin, cout, tdim = 16, 24, 32
        sd = _rand_sd({
            "r.norm1.weight": (cin,), "r.norm1.bias": (cin,),
            "r.conv1.weight": (cout, cin, 3, 3), "r.conv1.bias": (cout,),
            "r.time_emb_proj.weight": (cout, tdim),
            "r.time_emb_proj.bias": (cout,),
            "r.norm2.weight": (cout,), "r.norm2.bias": (cout,),
            "r.conv2.weight": (cout, cout, 3, 3), "r.conv2.bias": (cout,),
            "r.conv_shortcut.weight": (cout, cin, 1, 1),
            "r.conv_shortcut.bias": (cout,),
        })
        x = torch.from_numpy(np.random.RandomState(1)
                             .randn(2, cin, *hw).astype(np.float32))
        temb = torch.from_numpy(np.random.RandomState(2)
                                .randn(2, tdim).astype(np.float32))
        want = t_resnet(sd, "r", x, temb, eps=1e-5)

        p = ti._resnet_from_sd({k: v.numpy() for k, v in sd.items()}, "r",
                               temb=True)
        cfg = configs.UNetConfig(norm_num_groups=GROUPS)
        got = unet_mod._resnet(p, _nhwc(x), jnp.asarray(temb.numpy()), cfg)
        _close(got, want)

    @pytest.mark.parametrize("hw", [(8, 8), (7, 5)])
    def test_transformer2d_block(self, hw):
        c, heads, cross = 16, 2, 12
        inner = c * 4
        sd = _rand_sd({
            "t.norm.weight": (c,), "t.norm.bias": (c,),
            "t.proj_in.weight": (c, c), "t.proj_in.bias": (c,),
            "t.transformer_blocks.0.norm1.weight": (c,),
            "t.transformer_blocks.0.norm1.bias": (c,),
            "t.transformer_blocks.0.attn1.to_q.weight": (c, c),
            "t.transformer_blocks.0.attn1.to_k.weight": (c, c),
            "t.transformer_blocks.0.attn1.to_v.weight": (c, c),
            "t.transformer_blocks.0.attn1.to_out.0.weight": (c, c),
            "t.transformer_blocks.0.attn1.to_out.0.bias": (c,),
            "t.transformer_blocks.0.norm2.weight": (c,),
            "t.transformer_blocks.0.norm2.bias": (c,),
            "t.transformer_blocks.0.attn2.to_q.weight": (c, c),
            "t.transformer_blocks.0.attn2.to_k.weight": (c, cross),
            "t.transformer_blocks.0.attn2.to_v.weight": (c, cross),
            "t.transformer_blocks.0.attn2.to_out.0.weight": (c, c),
            "t.transformer_blocks.0.attn2.to_out.0.bias": (c,),
            "t.transformer_blocks.0.norm3.weight": (c,),
            "t.transformer_blocks.0.norm3.bias": (c,),
            "t.transformer_blocks.0.ff.net.0.proj.weight": (inner * 2, c),
            "t.transformer_blocks.0.ff.net.0.proj.bias": (inner * 2,),
            "t.transformer_blocks.0.ff.net.2.weight": (c, inner),
            "t.transformer_blocks.0.ff.net.2.bias": (c,),
            "t.proj_out.weight": (c, c), "t.proj_out.bias": (c,),
        })
        x = torch.from_numpy(np.random.RandomState(3)
                             .randn(2, c, *hw).astype(np.float32))
        ctx = torch.from_numpy(np.random.RandomState(4)
                               .randn(2, 7, cross).astype(np.float32))
        want = t_transformer2d(sd, "t", x, heads, ctx)

        p = ti._transformer_from_sd({k: v.numpy() for k, v in sd.items()},
                                    "t")
        cfg = configs.UNetConfig(norm_num_groups=GROUPS)
        got = unet_mod._transformer(p, _nhwc(x), jnp.asarray(ctx.numpy()),
                                    heads, cfg, attn_fn=None)
        _close(got, want, atol=5e-5, rtol=5e-5)

    def test_timestep_embedding_t999_and_mlp(self):
        dim, tdim = 32, 128
        t = torch.tensor([999, 0, 500])
        want_emb = t_timestep_embedding(t, dim)
        # fp32 sin/cos at t=999 carries ~1e-5 abs error vs the f64 mirror
        # (diffusers itself computes in fp32)
        got_emb = L.timestep_embedding(jnp.asarray(t.numpy()), dim)
        np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(),
                                   atol=3e-5, rtol=0)
        sd = _rand_sd({
            "time_embedding.linear_1.weight": (tdim, dim),
            "time_embedding.linear_1.bias": (tdim,),
            "time_embedding.linear_2.weight": (tdim, tdim),
            "time_embedding.linear_2.bias": (tdim,),
        })
        want = F.linear(F.silu(F.linear(
            want_emb, sd["time_embedding.linear_1.weight"],
            sd["time_embedding.linear_1.bias"])),
            sd["time_embedding.linear_2.weight"],
            sd["time_embedding.linear_2.bias"])
        mlp = {"lin1": ti._lin({k: v.numpy() for k, v in sd.items()},
                               "time_embedding.linear_1"),
               "lin2": ti._lin({k: v.numpy() for k, v in sd.items()},
                               "time_embedding.linear_2")}
        got = L.linear(mlp["lin2"], L.silu(L.linear(mlp["lin1"], got_emb)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=1e-4, rtol=0)

    def test_unet_downsample_padding(self):
        """diffusers UNet Downsample2D: conv stride 2, padding=1 — on odd
        inputs out = ceil(h/2)."""
        c = 8
        w = torch.from_numpy(np.random.RandomState(5)
                             .randn(c, c, 3, 3).astype(np.float32) * 0.2)
        b = torch.zeros(c)
        x = torch.from_numpy(np.random.RandomState(6)
                             .randn(1, c, 7, 5).astype(np.float32))
        want = F.conv2d(x, w, b, stride=2, padding=1)
        p = {"kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
             "bias": jnp.asarray(b.numpy())}
        got = L.conv2d(p, _nhwc(x), stride=2, padding=[(1, 1), (1, 1)])
        _close(got, want)

    @pytest.mark.parametrize("target", [None, (13, 9), (15, 11)])
    def test_upsample_semantics(self, target):
        """diffusers Upsample2D: F.interpolate nearest (2x, or to
        output_size for odd skips) then 3x3 conv."""
        c = 8
        x = torch.from_numpy(np.random.RandomState(7)
                             .randn(1, c, 7, 5).astype(np.float32))
        if target is None:
            up_t = F.interpolate(x, scale_factor=2.0, mode="nearest")
            up_j = L.upsample_nearest_2x(_nhwc(x))
        else:
            up_t = F.interpolate(x, size=target, mode="nearest")
            up_j = L.upsample_nearest_to(_nhwc(x), target)
        _close(up_j, up_t)


class TestVAEBlocks:
    def test_vae_resnet_no_temb(self):
        cin = 16
        sd = _rand_sd({
            "r.norm1.weight": (cin,), "r.norm1.bias": (cin,),
            "r.conv1.weight": (cin, cin, 3, 3), "r.conv1.bias": (cin,),
            "r.norm2.weight": (cin,), "r.norm2.bias": (cin,),
            "r.conv2.weight": (cin, cin, 3, 3), "r.conv2.bias": (cin,),
        })
        x = torch.from_numpy(np.random.RandomState(8)
                             .randn(2, cin, 9, 7).astype(np.float32))
        want = t_resnet(sd, "r", x, None, eps=1e-6)
        p = ti._resnet_from_sd({k: v.numpy() for k, v in sd.items()}, "r",
                               temb=False)
        cfg = configs.VAEConfig(norm_num_groups=GROUPS)
        got = vae_mod._resnet(p, _nhwc(x), cfg)
        _close(got, want)

    def test_vae_mid_attention(self):
        c = 16
        sd = _rand_sd({
            "a.group_norm.weight": (c,), "a.group_norm.bias": (c,),
            "a.to_q.weight": (c, c), "a.to_q.bias": (c,),
            "a.to_k.weight": (c, c), "a.to_k.bias": (c,),
            "a.to_v.weight": (c, c), "a.to_v.bias": (c,),
            "a.to_out.0.weight": (c, c), "a.to_out.0.bias": (c,),
        })
        x = torch.from_numpy(np.random.RandomState(9)
                             .randn(1, c, 7, 5).astype(np.float32))
        want = t_vae_attn(sd, "a", x)
        npsd = {k: v.numpy() for k, v in sd.items()}
        p = {
            "norm": ti._norm(npsd, "a.group_norm"),
            "to_q": ti._lin(npsd, "a.to_q"),
            "to_k": ti._lin(npsd, "a.to_k"),
            "to_v": ti._lin(npsd, "a.to_v"),
            "to_out": ti._lin(npsd, "a.to_out.0"),
        }
        cfg = configs.VAEConfig(norm_num_groups=GROUPS)
        got = vae_mod._mid_attn(p, _nhwc(x), cfg)
        _close(got, want, atol=5e-5, rtol=5e-5)

    def test_vae_downsample_asymmetric_pad(self):
        """diffusers VAE Downsample2D: F.pad (0,1,0,1) then conv stride 2
        pad 0 — on odd inputs out = ceil(h/2), indexing differs from the
        UNet's symmetric pad."""
        c = 8
        w = torch.from_numpy(np.random.RandomState(10)
                             .randn(c, c, 3, 3).astype(np.float32) * 0.2)
        b = torch.zeros(c)
        x = torch.from_numpy(np.random.RandomState(11)
                             .randn(1, c, 9, 7).astype(np.float32))
        want = F.conv2d(F.pad(x, (0, 1, 0, 1)), w, b, stride=2)
        p = {"kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
             "bias": jnp.asarray(b.numpy())}
        got = L.conv2d(p, _nhwc(x), stride=2, padding=[(0, 1), (0, 1)])
        _close(got, want)


class TestTorchResize:
    @pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
    @pytest.mark.parametrize("shape", [(64, 64, 28, 28), (31, 17, 224, 224),
                                       (100, 60, 224, 224)])
    def test_resize_torch_matches_interpolate(self, mode, shape):
        h, w, th, tw = shape
        x = torch.from_numpy(np.random.RandomState(12)
                             .randn(2, 3, h, w).astype(np.float32))
        want = F.interpolate(x, size=(th, tw), mode=mode,
                             align_corners=False)
        got = image_mod.resize_torch(_nhwc(x), th, tw, mode)
        _close(got, want, atol=1e-4, rtol=1e-4)

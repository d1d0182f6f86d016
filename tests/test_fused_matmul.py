"""Parity tests for the Pallas transformer-glue matmul engine
(ops/fused_matmul.py) — interpret-mode kernels vs the pure-XLA reference
composition, plus layer- and model-level equivalence of the fused
dispatch (models/layers.py linear_fused / attention_block /
geglu_ff_block) against the default XLA path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import layers as L
from img2img_turbo_tpu.models import unet as unet_mod
from img2img_turbo_tpu.ops import fused_matmul as fm


def _t(rng, *s, dt=jnp.float32):
    return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.5, dt)


def _check(outs, refs, lead, co, atol):
    assert outs is not None, "plan failed — gate/picker regression"
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(
            np.float32(o.reshape(-1, co)), np.float32(r), atol=atol)


class TestErfPolynomial:
    """The in-kernel Mosaic-lowerable erf (XLA's f32 rational, replacing
    the erfc-based jax.nn.gelu that failed TPU lowering in round 3)."""

    def test_erf_polynomial_parity(self):
        x = jnp.asarray(np.linspace(-10.0, 10.0, 40001), jnp.float32)
        got = np.asarray(fm._erf_f32(x))
        want = np.asarray(jax.lax.erf(x))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_exact_gelu_parity(self):
        x = jnp.asarray(np.linspace(-12.0, 12.0, 8001), jnp.float32)
        got = np.asarray(fm._exact_gelu(x))
        want = np.asarray(jax.nn.gelu(x, approximate=False))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_exact_gelu_grad_parity(self):
        x = jnp.asarray(np.linspace(-6.0, 6.0, 2001), jnp.float32)
        got = np.asarray(jax.vmap(jax.grad(fm._exact_gelu))(x))
        want = np.asarray(jax.vmap(jax.grad(
            lambda v: jax.nn.gelu(v, approximate=False)))(x))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestKernelParity:
    """Each kernel variant vs _ref, interpret mode."""

    def test_plain_matmul(self):
        rng = np.random.RandomState(0)
        x, w, b = _t(rng, 2, 77, 320), _t(rng, 320, 960), _t(rng, 960)
        out = fm.fused(x, (w,), (b,), interpret=True)
        ref = fm._ref(x.reshape(-1, 320), (w,), (b,), None, None,
                      False, False, 1e-5)
        _check(out, ref, x.shape[:2], 960, 1e-4)

    def test_ln_matmul_residual(self):
        rng = np.random.RandomState(1)
        x = _t(rng, 2, 77, 320)
        w, b = _t(rng, 320, 640), _t(rng, 640)
        s, sb = _t(rng, 320), _t(rng, 320)
        res = _t(rng, 2, 77, 640)
        out = fm.fused(x, (w,), (b,), ln=(s, sb), residual=res,
                       interpret=True)
        ref = fm._ref(x.reshape(-1, 320), (w,), (b,), (s, sb),
                      res.reshape(-1, 640), False, False, 1e-5)
        _check(out, ref, x.shape[:2], 640, 1e-4)

    def test_shared_ln_qkv(self):
        rng = np.random.RandomState(2)
        x = _t(rng, 1, 256, 640)
        ws = tuple(_t(rng, 640, 640) for _ in range(3))
        z = jnp.zeros(640)
        s, sb = _t(rng, 640), _t(rng, 640)
        out = fm.fused(x, ws, (z, z, z), ln=(s, sb), interpret=True)
        ref = fm._ref(x.reshape(-1, 640), ws, (z, z, z), (s, sb), None,
                      False, False, 1e-5)
        assert len(out) == 3
        _check(out, ref, x.shape[:2], 640, 1e-4)

    def test_kv_two_output(self):
        rng = np.random.RandomState(3)
        ctx = _t(rng, 2, 77, 1024)
        ws = (_t(rng, 1024, 320), _t(rng, 1024, 320))
        z = jnp.zeros(320)
        out = fm.fused(ctx, ws, (z, z), interpret=True)
        ref = fm._ref(ctx.reshape(-1, 1024), ws, (z, z), None, None,
                      False, False, 1e-5)
        assert len(out) == 2
        _check(out, ref, ctx.shape[:2], 320, 1e-4)

    def test_geglu_packed(self):
        rng = np.random.RandomState(4)
        x = _t(rng, 2, 77, 320)
        wp, bp = _t(rng, 320, 2560), _t(rng, 2560)
        s, sb = _t(rng, 320), _t(rng, 320)
        out = fm.fused(x, (wp,), (bp,), ln=(s, sb), gate=True,
                       interpret=True)
        ref = fm._ref(x.reshape(-1, 320), (wp,), (bp,), (s, sb), None,
                      True, True, 1e-5)
        _check(out, ref, x.shape[:2], 1280, 1e-3)

    def test_geglu_two_weights(self):
        rng = np.random.RandomState(5)
        x = _t(rng, 1, 64, 256)
        ws = (_t(rng, 256, 512), _t(rng, 256, 512))
        bs = (_t(rng, 512), _t(rng, 512))
        out = fm.fused(x, ws, bs, gate=True, interpret=True)
        ref = fm._ref(x.reshape(-1, 256), ws, bs, None, None, True,
                      False, 1e-5)
        _check(out, ref, x.shape[:2], 512, 1e-3)

    def test_bf16_co_sliced(self):
        """Big M + Co sliced into 128-lane tiles, bf16 io."""
        rng = np.random.RandomState(6)
        x = _t(rng, 1, 1024, 640, dt=jnp.bfloat16)
        w = _t(rng, 640, 5120, dt=jnp.bfloat16)
        b = _t(rng, 5120, dt=jnp.bfloat16)
        out = fm.fused(x, (w,), (b,), interpret=True)
        assert out is not None
        ref = fm._ref(x.reshape(-1, 640), (w,), (b,), None, None,
                      False, False, 1e-5)
        # one-bf16-ulp accumulation-order noise on |y| ~ sqrt(640)*0.25
        np.testing.assert_allclose(np.float32(out[0].reshape(-1, 5120)),
                                   np.float32(ref[0]), atol=0.7)

    def test_odd_rows_padded(self):
        """77-token context rows pad to 80 and slice back exactly."""
        rng = np.random.RandomState(7)
        x, w, b = _t(rng, 1, 77, 256), _t(rng, 256, 256), _t(rng, 256)
        out = fm.fused(x, (w,), (b,), interpret=True)
        assert out[0].shape == (1, 77, 256)
        ref = fm._ref(x.reshape(-1, 256), (w,), (b,), None, None,
                      False, False, 1e-5)
        _check(out, ref, x.shape[:2], 256, 1e-4)

    def test_gradients_match_reference(self):
        """custom VJP (XLA-recompute backward) == grads of _ref."""
        rng = np.random.RandomState(8)
        x, w, b = _t(rng, 1, 64, 320), _t(rng, 320, 640), _t(rng, 640)
        s, sb = _t(rng, 320), _t(rng, 320)
        res = _t(rng, 1, 64, 640)

        def f_fused(x_, w_, b_, s_, sb_, r_):
            return fm.fused(x_, (w_,), (b_,), ln=(s_, sb_), residual=r_,
                            interpret=True)[0].sum()

        def f_ref(x_, w_, b_, s_, sb_, r_):
            return fm._ref(x_.reshape(-1, 320), (w_,), (b_,), (s_, sb_),
                           r_.reshape(-1, 640), False, False,
                           1e-5)[0].sum()

        gf = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4, 5))(
            x, w, b, s, sb, res)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(
            x, w, b, s, sb, res)
        for a, r in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-3)

    def test_gate_gradients(self):
        rng = np.random.RandomState(9)
        x = _t(rng, 1, 32, 256)
        wp, bp = _t(rng, 256, 1024), _t(rng, 1024)

        def f_fused(x_, w_, b_):
            return fm.fused(x_, (w_,), (b_,), gate=True,
                            interpret=True)[0].sum()

        def f_ref(x_, w_, b_):
            return fm._ref(x_.reshape(-1, 256), (w_,), (b_,), None, None,
                           True, True, 1e-5)[0].sum()

        gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, wp, bp)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, wp, bp)
        for a, r in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-3)

    def test_unsupported_returns_none(self):
        rng = np.random.RandomState(10)
        x = _t(rng, 1, 8, 12)  # C % 8 != 0
        w, b = _t(rng, 12, 24), _t(rng, 24)
        assert fm.fused(x, (w,), (b,), interpret=True) is None


class TestLayerDispatch:
    """Fused layer helpers == default XLA path (force_fused interpret)."""

    def _fused_eval(self, fn):
        with L.force_fused_scope():
            with pltpu.force_tpu_interpret_mode():
                return np.asarray(fn())

    def test_linear_fused(self):
        rng = np.random.RandomState(0)
        p = {"kernel": _t(rng, 320, 320), "bias": _t(rng, 320)}
        x = _t(rng, 1, 64, 320)
        res = _t(rng, 1, 64, 320)
        ref = np.asarray(L.linear(p, x) + res)
        out = self._fused_eval(lambda: L.linear_fused(p, x, residual=res))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_attention_block_self_and_cross(self):
        rng = np.random.RandomState(1)
        key = jax.random.PRNGKey(0)
        x = _t(rng, 1, 64, 256)
        ctx = _t(rng, 1, 77, 512)
        for cross in (False, True):
            p = L.init_attention(key, 256, 4,
                                 cross_dim=512 if cross else None)
            pn = L.init_layer_norm(256)
            pn = {"scale": _t(rng, 256) + 1.0, "bias": _t(rng, 256)}
            c = ctx if cross else None
            ref = np.asarray(x + L.attention(
                p, L.layer_norm(pn, x), c, num_heads=4))
            out = self._fused_eval(lambda: L.attention_block(
                p, pn, x, c, num_heads=4))
            np.testing.assert_allclose(out, ref, atol=2e-4, err_msg=str(cross))

    def test_geglu_ff_block(self):
        rng = np.random.RandomState(2)
        p = L.init_geglu_ff(jax.random.PRNGKey(1), 256)
        pn = {"scale": _t(rng, 256) + 1.0, "bias": _t(rng, 256)}
        x = _t(rng, 1, 64, 256)
        ref = np.asarray(x + L.geglu_ff(p, L.layer_norm(pn, x)))
        out = self._fused_eval(lambda: L.geglu_ff_block(p, pn, x))
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_tiny_vae_roundtrip_parity(self):
        """VAE mid-attention through the fused qkv/out kernels equals the
        default path (models/vae.py:_mid_attn dispatch)."""
        from img2img_turbo_tpu.models import vae as vae_mod
        cfg = configs.TINY_VAE
        p = vae_mod.init_vae(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(4)
        x = _t(rng, 1, 32, 32, 3)

        def run():
            z, skips = vae_mod.encode(p, cfg, x, sample_posterior=False)
            return np.asarray(vae_mod.decode(p, cfg, z, skips, gamma=1.0))

        ref = run()
        out = self._fused_eval(run)
        np.testing.assert_allclose(out, ref, atol=5e-4)

    def test_tiny_unet_forward_parity(self):
        """The full tiny UNet through the fused transformer glue equals
        the default path — composition-level pin for the wiring in
        models/unet.py:_transformer."""
        cfg = configs.TINY_UNET
        p = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(3)
        z = _t(rng, 1, 16, 16, cfg.in_channels)
        t = jnp.asarray([999], jnp.int32)
        ctx = _t(rng, 1, 77, cfg.cross_attention_dim)
        ref = np.asarray(unet_mod.unet_forward(p, cfg, z, t, ctx))
        out = self._fused_eval(
            lambda: unet_mod.unet_forward(p, cfg, z, t, ctx))
        np.testing.assert_allclose(out, ref, atol=5e-4)

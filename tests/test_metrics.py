"""Metric tests: FID math, InceptionV3 structure, DINO-struct behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.metrics import dino_struct, fid
from img2img_turbo_tpu.metrics import inception as inc
from img2img_turbo_tpu.models import dino as dino_mod


class TestFrechet:
    def test_identical_stats_zero(self):
        rng = np.random.RandomState(0)
        f = rng.randn(64, 16)
        assert abs(fid.fid_from_feats(f, f)) < 1e-6

    def test_shifted_gaussians_analytic(self):
        # FID between N(0, I) and N(m, I) == ||m||^2 (asymptotically)
        rng = np.random.RandomState(1)
        a = rng.randn(20000, 4)
        b = rng.randn(20000, 4) + np.array([1.0, 0, 0, 0])
        got = fid.fid_from_feats(a, b)
        assert abs(got - 1.0) < 0.1

    def test_symmetry(self):
        rng = np.random.RandomState(2)
        a, b = rng.randn(256, 8), rng.randn(256, 8) * 1.5 + 0.3
        d1 = fid.fid_from_feats(a, b)
        d2 = fid.fid_from_feats(b, a)
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        assert d1 > 0


class TestInception:
    def test_feature_shape_and_finite(self):
        params = inc.init_inception(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(1, 299, 299, 3).astype(np.float32))
        f = inc.inception_features(params, x)
        assert f.shape == (1, 2048)
        assert np.isfinite(np.asarray(f)).all()

    def test_param_count_matches_torchvision(self):
        # torchvision inception_v3 feature trunk (conv+bn, no fc/aux):
        # ~21.8M conv weights + bn affines
        params = inc.init_inception(jax.random.PRNGKey(0))
        n = sum(x.size for x in jax.tree_util.tree_leaves(params)
                if hasattr(x, "size"))
        assert 21e6 < n < 24e6, n

    def test_clean_resize(self):
        img = np.random.RandomState(0).randint(
            0, 255, (64, 48, 3), np.uint8)
        out = fid.clean_resize_299(img)
        assert out.shape == (299, 299, 3)
        # float-mode bicubic may overshoot slightly (clean-fid does not
        # clip); bound by the filter's worst-case ringing
        assert -0.2 <= out.min() and out.max() <= 1.2
        # no uint8 re-quantization: values must not all be k/255 multiples
        frac = np.abs(out * 255.0 - np.round(out * 255.0))
        assert frac.max() > 1e-3


class TestDinoStruct:
    @pytest.fixture(scope="class")
    def dino(self):
        cfg = dino_mod.TINY_DINO
        params = dino_mod.init_dino(jax.random.PRNGKey(0), cfg)
        return params, cfg

    def test_identical_images_zero(self, dino):
        params, cfg = dino
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(1, 64, 64, 3).astype(np.float32))
        d = dino_struct.dino_struct_distance(params, cfg, x, x)
        assert float(d) < 1e-10

    def test_different_images_positive(self, dino):
        params, cfg = dino
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        y = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        d = dino_struct.dino_struct_distance(params, cfg, x, y)
        assert float(d) > 0

    def test_qkv_shapes(self, dino):
        params, cfg = dino
        x = jnp.zeros((1, 64, 64, 3))
        _, qkvs = dino_mod.dino_forward(params, cfg, x)
        assert len(qkvs) == cfg.num_layers
        t = (64 // cfg.patch_size) ** 2 + 1
        hd = cfg.hidden_size // cfg.num_heads
        assert qkvs[0]["k"].shape == (1, cfg.num_heads, t, hd)

    def test_structure_sensitivity_vs_recolor(self, dino):
        """A global color shift should perturb structure less than spatial
        scrambling — the property the metric exists for."""
        params, cfg = dino
        rng = np.random.RandomState(3)
        x = rng.rand(1, 64, 64, 3).astype(np.float32)
        recolor = np.clip(x * 0.7 + 0.2, 0, 1)
        scram = x.reshape(1, -1, 3)
        perm = rng.permutation(scram.shape[1])
        scrambled = scram[:, perm].reshape(1, 64, 64, 3)
        d_color = float(dino_struct.dino_struct_distance(
            params, cfg, jnp.asarray(x), jnp.asarray(recolor)))
        d_scram = float(dino_struct.dino_struct_distance(
            params, cfg, jnp.asarray(x), jnp.asarray(scrambled)))
        assert d_color < d_scram

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


class TestInceptionTorchGolden:
    """Layer-for-layer torch-mirror golden for the FID InceptionV3
    (VERDICT r2 item 7): a functional torch forward written from
    pytorch-fid/clean-fid semantics (FIDInceptionA/C/E — every in-block
    avg pool count_include_pad=False; Mixed_7c pool branch MAX in the
    fid_variant), fed the SAME torchvision-layout state dict that
    `convert_inception_state_dict` ingests. Pins the converter's BN fold
    (eps=1e-3), every conv's stride/padding, block wiring, and both
    fid_variant pooling modes."""

    def _random_state_dict(self, seed=0):
        import torch

        rng = np.random.RandomState(seed)
        proto = inc.init_inception(jax.random.PRNGKey(0))
        sd = {}

        def walk(p, prefix):
            if "kernel" in p:
                kh, kw, cin, cout = p["kernel"].shape
                sd[prefix + ".conv.weight"] = (
                    rng.randn(cout, cin, kh, kw)
                    / np.sqrt(cin * kh * kw)).astype(np.float32)
                sd[prefix + ".bn.weight"] = (
                    0.5 + rng.rand(cout).astype(np.float32))
                sd[prefix + ".bn.bias"] = rng.randn(cout).astype(
                    np.float32) * 0.1
                sd[prefix + ".bn.running_mean"] = rng.randn(cout).astype(
                    np.float32) * 0.1
                sd[prefix + ".bn.running_var"] = (
                    0.5 + rng.rand(cout).astype(np.float32))
                return
            for k, v in p.items():
                walk(v, f"{prefix}.{k}" if prefix else k)

        walk(proto, "")
        return proto, sd, {k: torch.from_numpy(v) for k, v in sd.items()}

    def _torch_forward(self, proto, tsd, x, fid_variant):
        import torch
        import torch.nn.functional as F

        def bconv(p, prefix, x):
            (ph, _), (pw, _) = p["pad"]
            y = F.conv2d(x, tsd[prefix + ".conv.weight"], None,
                         stride=p["stride"], padding=(ph, pw))
            y = F.batch_norm(
                y, tsd[prefix + ".bn.running_mean"],
                tsd[prefix + ".bn.running_var"],
                tsd[prefix + ".bn.weight"], tsd[prefix + ".bn.bias"],
                training=False, eps=1e-3)
            return F.relu(y)

        def avg3(x):
            return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)

        def run_a(b, x):
            p = proto[b]
            b1 = bconv(p["branch1x1"], b + ".branch1x1", x)
            b5 = bconv(p["branch5x5_2"], b + ".branch5x5_2",
                       bconv(p["branch5x5_1"], b + ".branch5x5_1", x))
            bd = x
            for n in ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]:
                bd = bconv(p[n], f"{b}.{n}", bd)
            bp = bconv(p["branch_pool"], b + ".branch_pool", avg3(x))
            return torch.cat([b1, b5, bd, bp], 1)

        def run_b(b, x):
            p = proto[b]
            b3 = bconv(p["branch3x3"], b + ".branch3x3", x)
            bd = x
            for n in ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]:
                bd = bconv(p[n], f"{b}.{n}", bd)
            return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

        def run_c(b, x):
            p = proto[b]
            b1 = bconv(p["branch1x1"], b + ".branch1x1", x)
            b7 = x
            for n in ["branch7x7_1", "branch7x7_2", "branch7x7_3"]:
                b7 = bconv(p[n], f"{b}.{n}", b7)
            bd = x
            for n in ["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                      "branch7x7dbl_4", "branch7x7dbl_5"]:
                bd = bconv(p[n], f"{b}.{n}", bd)
            bp = bconv(p["branch_pool"], b + ".branch_pool", avg3(x))
            return torch.cat([b1, b7, bd, bp], 1)

        def run_d(b, x):
            p = proto[b]
            b3 = bconv(p["branch3x3_2"], b + ".branch3x3_2",
                       bconv(p["branch3x3_1"], b + ".branch3x3_1", x))
            b7 = x
            for n in ["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                      "branch7x7x3_4"]:
                b7 = bconv(p[n], f"{b}.{n}", b7)
            return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

        def run_e(b, x, pool):
            p = proto[b]
            b1 = bconv(p["branch1x1"], b + ".branch1x1", x)
            b3 = bconv(p["branch3x3_1"], b + ".branch3x3_1", x)
            b3 = torch.cat(
                [bconv(p["branch3x3_2a"], b + ".branch3x3_2a", b3),
                 bconv(p["branch3x3_2b"], b + ".branch3x3_2b", b3)], 1)
            bd = bconv(p["branch3x3dbl_2"], b + ".branch3x3dbl_2",
                       bconv(p["branch3x3dbl_1"], b + ".branch3x3dbl_1", x))
            bd = torch.cat(
                [bconv(p["branch3x3dbl_3a"], b + ".branch3x3dbl_3a", bd),
                 bconv(p["branch3x3dbl_3b"], b + ".branch3x3dbl_3b", bd)], 1)
            pooled = (F.max_pool2d(x, 3, 1, 1) if pool == "max"
                      else avg3(x))
            bp = bconv(p["branch_pool"], b + ".branch_pool", pooled)
            return torch.cat([b1, b3, bd, bp], 1)

        x = x * 2.0 - 1.0
        for n in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"]:
            x = bconv(proto[n], n, x)
        x = F.max_pool2d(x, 3, 2)
        for n in ["Conv2d_3b_1x1", "Conv2d_4a_3x3"]:
            x = bconv(proto[n], n, x)
        x = F.max_pool2d(x, 3, 2)
        for n in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
            x = run_a(n, x)
        x = run_b("Mixed_6a", x)
        for n in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
            x = run_c(n, x)
        x = run_d("Mixed_7a", x)
        x = run_e("Mixed_7b", x, "avg")
        x = run_e("Mixed_7c", x, "max" if fid_variant else "avg")
        return x.mean(dim=(2, 3))

    @pytest.mark.parametrize("fid_variant", [True, False])
    def test_full_forward_parity(self, fid_variant):
        import torch

        proto, sd, tsd = self._random_state_dict()
        params = inc.convert_inception_state_dict(sd)
        # non-square, stem-survivable sizes instead of 299x299: spatial
        # extent changes no wiring and keeps the CPU run fast. The fid
        # variant needs Mixed_7c at >=2x2 (115x107 -> 2x2) so its
        # max-vs-avg pool quirk is numerically live; 1x1 would make the
        # two pools coincide.
        hw = (115, 107) if fid_variant else (83, 75)
        x = np.random.RandomState(1).rand(2, *hw, 3).astype(np.float32)
        got = np.asarray(inc.inception_features(
            params, jnp.asarray(x), fid_variant=fid_variant))
        with torch.no_grad():
            want = self._torch_forward(
                proto, tsd, torch.from_numpy(x).permute(0, 3, 1, 2),
                fid_variant).numpy()
        assert got.shape == want.shape == (2, 2048)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        # the two variants must actually differ (the quirks are live)
        if fid_variant:
            other = np.asarray(inc.inception_features(
                params, jnp.asarray(x), fid_variant=False))
            assert np.abs(got - other).max() > 1e-4


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

    def test_preprocess_short_side_aspect_preserving(self, dino):
        """Reference parity (dino_struct.py:171-175):
        torchvision.transforms.Resize(224) with an int size resizes the
        SHORT side to 224 and preserves aspect ratio (bilinear) — NOT a
        square squash. Non-square inputs must stay non-square, match
        torchvision's int() output-size rule, and still run through the
        ViT (patch conv floors, pos-embed interpolates)."""
        from PIL import Image
        params, cfg = dino
        loss = dino_struct.DinoStructureLoss(params=params, cfg=cfg)
        rng = np.random.RandomState(7)
        # landscape 500x300 -> short side (h=300) to 224, w = int(224*500/300)
        img = Image.fromarray(
            rng.randint(0, 255, (300, 500, 3), np.uint8))
        t = loss.preprocess(img, size=224)
        assert t.shape == (1, 224, int(224 * 500 / 300), 3)
        # portrait 300x500 -> w=224, h = int(224*500/300)
        img_p = Image.fromarray(
            rng.randint(0, 255, (500, 300, 3), np.uint8))
        t_p = loss.preprocess(img_p, size=224)
        assert t_p.shape == (1, int(224 * 500 / 300), 224, 3)
        assert float(t.max()) <= 1.0 and float(t.min()) >= 0.0
        # the ViT must accept the non-square grid (floor-divided patches)
        d = dino_struct.dino_struct_distance(params, cfg, t, t)
        assert float(d) < 1e-10

    def test_preprocess_torchvision_pixel_parity(self, dino):
        """Exact pixels vs torchvision.transforms.Resize(224) when
        torchvision is available (not on this box — kept for parity CI)."""
        torchvision = pytest.importorskip("torchvision")
        from PIL import Image
        params, cfg = dino
        loss = dino_struct.DinoStructureLoss(params=params, cfg=cfg)
        img = Image.fromarray(np.random.RandomState(7)
                              .randint(0, 255, (300, 500, 3), np.uint8))
        t = loss.preprocess(img, size=224)
        ref = torchvision.transforms.Resize(224)(img)
        np.testing.assert_allclose(
            np.asarray(t)[0], np.asarray(ref, np.float32) / 255.0,
            rtol=0, atol=1e-6)

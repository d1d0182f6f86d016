"""End-to-end pipeline tests on tiny configs: deterministic + stochastic
pix2pix paths, CycleGAN direction routing, checkpoint round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs, lora as lora_mod
from img2img_turbo_tpu.pipelines import cyclegan as cg
from img2img_turbo_tpu.pipelines import pix2pix as p2p


def tiny_cfgs():
    return p2p.GeneratorConfigs(unet=configs.TINY_UNET,
                                vae=configs.TINY_VAE, text=configs.TINY_TEXT)


def randomize_lora_b(lora, key, std=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(lora["modules"])
    keys = jax.random.split(key, len(leaves))
    new = []
    for i, (x) in enumerate(leaves):
        # b factors are 2-D with first dim == rank
        if x.ndim == 2 and x.shape[0] == lora["rank"]:
            new.append(jax.random.normal(keys[i], x.shape) * std)
        else:
            new.append(x)
    return dict(lora, modules=jax.tree_util.tree_unflatten(treedef, new))


@pytest.fixture(scope="module")
def pipe():
    p = p2p.Pix2PixTurbo.from_random(jax.random.PRNGKey(0), cfgs=tiny_cfgs())
    p.lora["unet"] = randomize_lora_b(p.lora["unet"], jax.random.PRNGKey(1))
    p.lora["vae"] = randomize_lora_b(p.lora["vae"], jax.random.PRNGKey(2))
    return p


class TestPix2PixDeterministic:
    def test_output_shape_range_determinism(self, pipe):
        pipe.merge()
        c_t = jnp.ones((1, 64, 64, 3)) * 0.5
        ctx = jnp.zeros((1, 77, pipe.cfgs.unet.cross_attention_dim))
        rng = jax.random.PRNGKey(42)
        out1 = pipe(c_t, caption_enc=ctx, rng=rng)
        out2 = pipe(c_t, caption_enc=ctx, rng=rng)
        assert out1.shape == (1, 64, 64, 3)
        assert float(out1.min()) >= -1.0 and float(out1.max()) <= 1.0
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_caption_affects_output(self, pipe):
        pipe.merge()
        c_t = jnp.ones((1, 64, 64, 3)) * 0.5
        rng = jax.random.PRNGKey(0)
        d = pipe.cfgs.unet.cross_attention_dim
        o1 = pipe(c_t, caption_enc=jnp.zeros((1, 77, d)), rng=rng)
        o2 = pipe(c_t, caption_enc=jnp.ones((1, 77, d)), rng=rng)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


class TestPix2PixStochastic:
    def test_r_interpolates_and_noise_matters(self, pipe):
        from img2img_turbo_tpu.models import unet as unet_mod
        pipe.base["unet"] = unet_mod.make_twin_conv_in(pipe.base["unet"])
        c_t = jnp.ones((1, 64, 64, 3)) * 0.5
        d = pipe.cfgs.unet.cross_attention_dim
        ctx = jnp.zeros((1, 77, d))
        rng = jax.random.PRNGKey(0)
        nkey = jax.random.PRNGKey(7)
        noise = jax.random.normal(nkey, (1, 8, 8, 4))

        out_r1 = pipe(c_t, caption_enc=ctx, rng=rng, deterministic=False,
                      r=1.0, noise_map=noise)
        out_r05 = pipe(c_t, caption_enc=ctx, rng=rng, deterministic=False,
                       r=0.5, noise_map=noise)
        assert out_r1.shape == (1, 64, 64, 3)
        assert np.abs(np.asarray(out_r1) - np.asarray(out_r05)).max() > 1e-4

        # at r=1 the noise map has zero weight -> same output for any noise
        noise2 = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 4))
        out_r1b = pipe(c_t, caption_enc=ctx, rng=rng, deterministic=False,
                       r=1.0, noise_map=noise2)
        np.testing.assert_allclose(np.asarray(out_r1), np.asarray(out_r1b),
                                   atol=1e-5)
        # at r<1 it must matter
        out_r05b = pipe(c_t, caption_enc=ctx, rng=rng, deterministic=False,
                        r=0.5, noise_map=noise2)
        assert np.abs(np.asarray(out_r05) - np.asarray(out_r05b)).max() > 1e-4

    def test_single_compiled_program_serves_all_r(self, pipe):
        from img2img_turbo_tpu.models import unet as unet_mod
        pipe.base["unet"] = unet_mod.make_twin_conv_in(pipe.base["unet"])
        c_t = jnp.ones((1, 64, 64, 3)) * 0.5
        ctx = jnp.zeros((1, 77, pipe.cfgs.unet.cross_attention_dim))
        noise = jnp.zeros((1, 8, 8, 4))
        pipe(c_t, caption_enc=ctx, deterministic=False, r=0.4,
             noise_map=noise)
        misses_before = pipe._sto._cache_size()
        pipe(c_t, caption_enc=ctx, deterministic=False, r=0.9,
             noise_map=noise)
        assert pipe._sto._cache_size() == misses_before


class TestCheckpointRoundTrip:
    def test_reference_pkl_schema_roundtrip(self, pipe, tmp_path):
        import torch
        path = str(tmp_path / "ckpt.pkl")
        pipe.save_model(path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert set(ckpt) == {"unet_lora_target_modules",
                             "vae_lora_target_modules", "rank_unet",
                             "rank_vae", "state_dict_unet", "state_dict_vae"}
        assert all("lora" in k or "conv_in" in k
                   for k in ckpt["state_dict_unet"])
        assert all("lora" in k or "skip" in k for k in ckpt["state_dict_vae"])
        # reference-loadable key layout: UNet adapter "default", VAE adapter
        # "vae_skip", peft-wrapped skip convs (pix2pix_turbo.py:117-129)
        for k in ckpt["state_dict_unet"]:
            if ".lora_" in k:
                assert ".lora_A.default.weight" in k \
                    or ".lora_B.default.weight" in k, k
        for k in ckpt["state_dict_vae"]:
            if ".lora_" in k:
                assert ".lora_A.vae_skip.weight" in k \
                    or ".lora_B.vae_skip.weight" in k, k
        for i in range(4):
            assert f"decoder.skip_conv_{i + 1}.base_layer.weight" \
                in ckpt["state_dict_vae"]

    def test_vae_sd_strict_loads_into_peft_wrapped_reference(
            self, pipe, tmp_path):
        """Simulate the reference loader (overlay onto state_dict then
        strict load, pix2pix_turbo.py:121-125) with real torch + peft."""
        import torch
        from img2img_turbo_tpu.weights import torch_import as ti
        from tests.test_weights import _peft_vae_skeleton
        path = str(tmp_path / "ckpt.pkl")
        pipe.save_model(path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        plain = ti.export_vae_state_dict(pipe.base["vae"])
        model = _peft_vae_skeleton(plain, rank=ckpt["rank_vae"])
        sd = model.state_dict()
        for k, v in ckpt["state_dict_vae"].items():
            assert k in sd, f"key {k} unknown to the wrapped reference VAE"
            sd[k] = v
        model.load_state_dict(sd, strict=True)

        # reload LoRA from the pkl and verify merged kernels match
        sd_np = {k: v.numpy() for k, v in ckpt["state_dict_unet"].items()}
        lora2 = lora_mod.lora_from_torch_state_dict(
            sd_np, rank=ckpt["rank_unet"])
        m1 = lora_mod.merge_lora(pipe.base["unet"], pipe.lora["unet"],
                                 model="unet")
        m2 = lora_mod.merge_lora(pipe.base["unet"], lora2, model="unet")
        k1 = m1["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        k2 = m2["mid"]["attn"]["attn1"]["to_q"]["kernel"]
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=1e-5, atol=1e-6)


class TestCycleGAN:
    @pytest.fixture(scope="class")
    def cpipe(self):
        pipe = cg.CycleGANTurbo.from_random(
            jax.random.PRNGKey(0), cfgs=tiny_cfgs(), lora_rank_unet=4)
        # merge adapters for serving
        unet_merged = lora_mod.merge_multi(
            pipe.base["unet"], list(pipe.loras["unet"].values()),
            model="unet")
        pipe.params = {
            "unet": unet_merged,
            "vae_a2b": lora_mod.merge_lora(pipe.base["vae_a2b"],
                                           pipe.loras["vae_a2b"], model="vae"),
            "vae_b2a": lora_mod.merge_lora(pipe.base["vae_b2a"],
                                           pipe.loras["vae_b2a"], model="vae"),
        }
        return pipe

    def test_both_directions(self, cpipe):
        x = jnp.ones((1, 64, 64, 3)) * 0.2
        ctx = jnp.zeros((1, 77, cpipe.cfgs.unet.cross_attention_dim))
        ya = cpipe(x, direction="a2b", caption_enc=ctx)
        yb = cpipe(x, direction="b2a", caption_enc=ctx)
        assert ya.shape == x.shape and yb.shape == x.shape
        assert float(ya.min()) >= -1.0 and float(ya.max()) <= 1.0

    def test_directions_differ_when_vaes_differ(self, cpipe):
        # perturb vae_b2a so routing is observable
        import jax.tree_util as jtu
        params = dict(cpipe.params)
        params["vae_b2a"] = jtu.tree_map(lambda x: x * 1.05,
                                         params["vae_b2a"])
        x = jnp.ones((1, 64, 64, 3)) * 0.2
        ctx = jnp.zeros((1, 77, cpipe.cfgs.unet.cross_attention_dim))
        rng = jax.random.PRNGKey(3)
        ya = cg.forward_with_params(params, cpipe.cfgs, cpipe.alphas_cumprod,
                                    x, ctx, rng, "a2b")
        yb = cg.forward_with_params(params, cpipe.cfgs, cpipe.alphas_cumprod,
                                    x, ctx, rng, "b2a")
        assert np.abs(np.asarray(ya) - np.asarray(yb)).max() > 1e-5

    def test_adapter_partition_covers_disjoint_modules(self, cpipe):
        mods = [set(l["modules"]) for l in cpipe.loras["unet"].values()]
        assert mods[0] and mods[1] and mods[2]
        assert not (mods[0] & mods[1]) and not (mods[0] & mods[2]) \
            and not (mods[1] & mods[2])

    def test_named_models_table(self):
        assert cg.NAMED_MODELS["day_to_night"][1] == "driving in the night"
        assert cg.NAMED_MODELS["night_to_day"][2] == "b2a"


class TestAcceptParityHarness:
    """The LPIPS acceptance CLI (cli/accept_parity.py) plumbing — so the
    day sd-turbo weights + a reference pkl are available, the real
    acceptance run is one already-verified command (BASELINE.md LPIPS
    ≤0.05 vs /root/reference/README.md:111-126)."""

    def _run(self, extra):
        import cli.accept_parity as ap
        args = ap.build_parser().parse_args(["--tiny_random"] + extra)
        return ap.main(args)

    def test_deterministic_plumbing(self, capsys):
        import json
        res = self._run([])
        assert set(res) >= {"lpips", "threshold", "pass", "mode",
                            "plumbing_only"}
        assert res["plumbing_only"] is True
        assert res["mode"] == "deterministic"
        assert np.isfinite(res["lpips"])
        line = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(line)["threshold"] == 0.05

    def test_stochastic_plumbing(self):
        res = self._run(["--stochastic", "--gamma", "0.4"])
        assert res["mode"] == "stochastic"
        assert np.isfinite(res["lpips"])

    def test_real_mode_requires_all_flags(self):
        import cli.accept_parity as ap
        args = ap.build_parser().parse_args(
            ["--sd_turbo_path", "/nonexistent"])
        with pytest.raises(SystemExit):
            ap.main(args)

"""Training-step tests: the 4-pass paired step updates the right params,
losses are finite, and the step runs data-parallel over an 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs, lora as lora_mod
from img2img_turbo_tpu.models import clip_text, clip_vit, discriminator
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.models import vgg_lpips
from img2img_turbo_tpu.parallel import mesh as mesh_mod
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
from img2img_turbo_tpu.training import losses as losses_mod
from img2img_turbo_tpu.training import optim, paired


RES = 32  # micro 2-level UNet/VAE: one downsample each


@pytest.fixture(scope="module")
def setup():
    cfgs = GeneratorConfigs(unet=configs.MICRO_UNET, vae=configs.MICRO_VAE,
                            text=configs.TINY_TEXT)
    clip_cfg = clip_vit.TINY_CLIP_VIT
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    unet_p = unet_mod.init_unet(ks[0], cfgs.unet)
    vae_p = vae_mod.init_vae(ks[1], cfgs.vae, skip_init=1e-5)
    unet_lora = lora_mod.init_lora(
        ks[2], unet_p, lora_mod.LoRASpec(4, lora_mod.PIX2PIX_UNET_TARGETS),
        "unet")
    vae_lora = lora_mod.init_lora(
        ks[3], vae_p, lora_mod.LoRASpec(4, lora_mod.PIX2PIX_VAE_TARGETS),
        "vae")
    gen, frozen, meta = paired.split_trainable(unet_p, vae_p, unet_lora,
                                               vae_lora)
    disc_full = discriminator.init_discriminator(ks[4], clip_cfg)
    aux_frozen = {
        "text": clip_text.init_clip_text(ks[5], cfgs.text),
        "lpips": vgg_lpips.init_vgg_lpips(ks[6]),
        "clip": clip_vit.init_clip(ks[7], clip_cfg),
        "disc_backbone": disc_full["backbone"],
    }
    loss_cfg = losses_mod.PairedLossConfig()
    sched = optim.make_lr_schedule("constant", 5e-4, 0, 100)
    gen_tx = optim.make_adamw(sched, max_grad_norm=1.0)
    disc_tx = optim.make_adamw(sched, max_grad_norm=1.0)
    state = {
        "gen": gen, "gen_opt": gen_tx.init(gen),
        "disc": disc_full["heads"], "disc_sn": disc_full["sn"],
        "disc_opt": disc_tx.init(disc_full["heads"]),
        "step": jnp.zeros((), jnp.int32),
    }
    step = paired.make_paired_train_step(cfgs, clip_cfg, loss_cfg, meta,
                                         gen_tx, disc_tx, remat=True)
    return dict(cfgs=cfgs, clip_cfg=clip_cfg, state=state, frozen=frozen,
                aux_frozen=aux_frozen, step=jax.jit(step), meta=meta)


def make_batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "conditioning_pixel_values": jnp.asarray(
            rng.rand(b, RES, RES, 3).astype(np.float32)),
        "output_pixel_values": jnp.asarray(
            (rng.rand(b, RES, RES, 3) * 2 - 1).astype(np.float32)),
        "input_ids": jnp.asarray(
            rng.randint(0, 999, (b, 77)).astype(np.int32)),
    }


class TestPairedStep:
    def test_losses_finite_and_params_update(self, setup):
        s = setup
        state1, metrics = s["step"](s["state"], s["frozen"], s["aux_frozen"],
                                    make_batch(), jax.random.PRNGKey(0))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert set(metrics) == {"loss_l2", "loss_lpips", "loss_clipsim",
                                "loss_gan_g", "loss_d_real", "loss_d_fake"}
        # trainable gen params changed
        before = s["state"]["gen"]["conv_in"]["kernel"]
        after = state1["gen"]["conv_in"]["kernel"]
        assert np.abs(np.asarray(after - before)).max() > 0
        # lora B factors received gradient (were zero, must move)
        name = next(iter(state1["gen"]["unet_lora"]))
        b_after = state1["gen"]["unet_lora"][name]["b"]
        assert np.abs(np.asarray(b_after)).max() > 0
        # disc heads changed
        d_before = s["state"]["disc"]["spatial"][0]["conv2"]["kernel"]
        d_after = state1["disc"]["spatial"][0]["conv2"]["kernel"]
        assert np.abs(np.asarray(d_after - d_before)).max() > 0
        # spectral-norm power-iteration state advanced (3 disc forwards)
        u_before = s["state"]["disc_sn"]["spatial"][0]["conv1"]
        u_after = state1["disc_sn"]["spatial"][0]["conv1"]
        assert np.abs(np.asarray(u_after - u_before)).max() > 0
        np.testing.assert_allclose(
            float(jnp.linalg.norm(u_after)), 1.0, rtol=1e-5)
        # frozen base untouched by construction (not in state)
        assert int(state1["step"]) == 1

    def test_second_step_runs(self, setup):
        s = setup
        state1, _ = s["step"](s["state"], s["frozen"], s["aux_frozen"],
                              make_batch(seed=1), jax.random.PRNGKey(1))
        state2, metrics = s["step"](state1, s["frozen"], s["aux_frozen"],
                                    make_batch(seed=2), jax.random.PRNGKey(2))
        assert int(state2["step"]) == 2
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestDataParallel:
    def test_step_over_8_device_mesh(self, setup):
        s = setup
        mesh = mesh_mod.make_mesh()  # 8 CPU devices on the data axis
        assert mesh.shape["data"] == 8
        batch = make_batch(b=8, seed=3)
        sharded = mesh_mod.shard_batch(batch, mesh)
        state = mesh_mod.replicate(s["state"], mesh)
        frozen = mesh_mod.replicate(s["frozen"], mesh)
        aux = mesh_mod.replicate(s["aux_frozen"], mesh)
        state1, metrics = s["step"](state, frozen, aux, sharded,
                                    jax.random.PRNGKey(0))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        # dp batch sharding preserved on inputs; params stay replicated
        kern = state1["gen"]["conv_in"]["kernel"]
        assert kern.sharding.is_fully_replicated

    def test_dp_matches_single_device(self, setup):
        """DP over 8 devices must give the same update as one device (same
        global batch) — the psum/mean is exact, not approximate."""
        s = setup
        batch = make_batch(b=8, seed=4)
        _, m_single = s["step"](s["state"], s["frozen"], s["aux_frozen"],
                                batch, jax.random.PRNGKey(5))
        mesh = mesh_mod.make_mesh()
        sharded = mesh_mod.shard_batch(batch, mesh)
        state = mesh_mod.replicate(s["state"], mesh)
        frozen = mesh_mod.replicate(s["frozen"], mesh)
        aux = mesh_mod.replicate(s["aux_frozen"], mesh)
        _, m_dp = s["step"](state, frozen, aux, sharded,
                            jax.random.PRNGKey(5))
        for k in m_single:
            np.testing.assert_allclose(float(m_single[k]), float(m_dp[k]),
                                       rtol=2e-4, atol=1e-5)


class TestShardMapDP:
    """`mesh.dp_shard_map` DP: per-shard single-device programs (the path
    that keeps the Pallas kernel engine engaged on multi-device meshes)."""

    def _make_step(self, setup, axis_name, remat=True):
        s = setup
        sched = optim.make_lr_schedule("constant", 5e-4, 0, 100)
        gen_tx = optim.make_adamw(sched, max_grad_norm=1.0)
        disc_tx = optim.make_adamw(sched, max_grad_norm=1.0)
        return paired.make_paired_train_step(
            s["cfgs"], s["clip_cfg"], losses_mod.PairedLossConfig(),
            s["meta"], gen_tx, disc_tx, remat=remat, axis_name=axis_name)

    def test_exact_vs_single_device(self, setup):
        """8 shards each fed the SAME micro-batch with the SAME rng: pmean
        averages identical grads, so every pass's update — and the final
        state — must match the single-device step on that micro-batch. This
        pins the spec layout, the pmean placement (before each optimizer
        update), and state replication exactly."""
        s = setup
        batch = make_batch(b=2, seed=7)
        tiled = jax.tree_util.tree_map(
            lambda x: jnp.tile(x, (8,) + (1,) * (x.ndim - 1)), batch)
        mesh = mesh_mod.make_mesh()
        dp_fn = jax.jit(mesh_mod.dp_shard_map(
            self._make_step(s, mesh_mod.DATA_AXIS), mesh, rng_argnums=()))
        st_dp, m_dp = dp_fn(s["state"], s["frozen"], s["aux_frozen"], tiled,
                            jax.random.PRNGKey(9))
        st_1, m_1 = jax.jit(self._make_step(s, None))(
            s["state"], s["frozen"], s["aux_frozen"], batch,
            jax.random.PRNGKey(9))
        for k in m_1:
            np.testing.assert_allclose(float(m_1[k]), float(m_dp[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        flat_dp = jax.tree_util.tree_leaves_with_path(st_dp["gen"])
        flat_1 = dict(jax.tree_util.tree_leaves_with_path(st_1["gen"]))
        lr = 5e-4
        for path, leaf in flat_dp:
            # tolerance: the two programs compile separately (shard_map
            # body vs plain jit) and XLA may reassociate reductions. On
            # elements whose TRUE gradient is zero at step 1 (anything
            # gated by a zero-init LoRA 'b'), Adam turns that fp noise
            # into an update of arbitrary sign bounded by lr — so single
            # elements may differ by up to 2*lr legitimately. A real
            # spec/pmean mistake perturbs a large fraction of elements,
            # so bound the mismatch FRACTION tightly and the absolute
            # difference by the update scale.
            a, r = np.asarray(leaf), np.asarray(flat_1[path])
            bad = ~np.isclose(a, r, rtol=1e-3, atol=1e-5)
            name = jax.tree_util.keystr(path)
            assert bad.mean() < 0.01, (
                f"{name}: {bad.sum()}/{bad.size} elements off")
            assert np.abs(a - r).max() < 2.1 * lr, (
                f"{name}: max diff {np.abs(a - r).max()} above update scale")
        assert st_dp["gen"]["conv_in"]["kernel"].sharding.is_fully_replicated

    def test_distinct_shards_update_and_replicate(self, setup):
        """Real DP shape: distinct per-shard data + folded rngs; state must
        come back replicated (shard_map's varying-axes analysis verifies
        the pmean discipline) with finite global metrics."""
        s = setup
        mesh = mesh_mod.make_mesh()
        dp_fn = jax.jit(mesh_mod.dp_shard_map(
            self._make_step(s, mesh_mod.DATA_AXIS), mesh))
        state1, metrics = dp_fn(s["state"], s["frozen"], s["aux_frozen"],
                                make_batch(b=8, seed=8),
                                jax.random.PRNGKey(3))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        assert int(state1["step"]) == 1
        kern = state1["gen"]["conv_in"]["kernel"]
        assert kern.sharding.is_fully_replicated

    def test_kernels_stay_engaged_in_shard_map(self, setup):
        """The point of dp_shard_map: FUSED_KERNELS stays ON across a
        multi-device mesh, and a Pallas kernel traces/lowers PER SHARD
        inside the shard_map'd program with the correct vma threading
        (ops/vma.py — a missing vma on any pallas out_shape fails right
        here, at trace time under check_vma). VERDICT r2 item 2.

        Trace/lower only, no multi-shard execution: interpret-mode pallas
        calls carry ORDERED io-callback effects, and 8 shards x 1 host
        core deadlocks on the ordering rendezvous (a shard waiting its
        turn holds the only thread). Kernel execution semantics are pinned
        single-device by tests/test_fused_conv.py and the TPU flows; real
        multi-chip runs have no callbacks."""
        from img2img_turbo_tpu.models import layers as L
        from img2img_turbo_tpu.ops import fused_conv as fc

        mesh = mesh_mod.make_mesh()
        assert L.FUSED_KERNELS  # make_mesh must not flip the global
        b, hw, c, co = 8, 16, 128, 128
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(b, hw, hw, c).astype(np.float32) * 0.5)
        w = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.05)
        cb = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)

        def fwd(xs):
            y, _ = fc.fused_gn_silu_conv3x3(xs, w, cb)
            return y

        dp_fwd = mesh_mod.dp_shard_map_fn(fwd, mesh, batch_argnums=(0,))
        # tracing runs shard_map's varying-axes analysis over the
        # pallas_call: a vma-less out_shape raises right here
        jaxpr = str(jax.make_jaxpr(dp_fwd)(x))
        assert "shard_map" in jaxpr and "pallas_call" in jaxpr


class TestLossComponents:
    def test_lpips_zero_for_identical_inputs(self):
        p = vgg_lpips.init_vgg_lpips(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                        .astype(np.float32) * 2 - 1)
        d = vgg_lpips.lpips(p, x, x)
        assert float(jnp.abs(d).max()) < 1e-6

    def test_lpips_positive_and_monotone_ish(self):
        p = vgg_lpips.init_vgg_lpips(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        d_small = float(vgg_lpips.lpips(p, x, x + 0.01).mean())
        d_big = float(vgg_lpips.lpips(p, x, -x).mean())
        assert 0 < d_small < d_big

    def test_clip_similarity_range(self):
        cfg = clip_vit.TINY_CLIP_VIT
        p = clip_vit.init_clip(jax.random.PRNGKey(0), cfg)
        img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        ids = jnp.asarray(np.random.RandomState(0)
                          .randint(0, 999, (2, 77)), jnp.int32)
        sim = clip_vit.clip_similarity(p, cfg, img, ids)
        assert sim.shape == (2,)
        assert (np.abs(np.asarray(sim)) <= 100.0 + 1e-3).all()

    def test_disc_losses_signs(self):
        cfg = clip_vit.TINY_CLIP_VIT
        d = discriminator.init_discriminator(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 64, 64, 3))
        for kwargs in ({"for_G": True}, {"for_real": True},
                       {"for_real": False}):
            val = discriminator.disc_loss(d, cfg, x, **kwargs)
            assert np.isfinite(float(val)) and float(val) > 0

    def test_spectral_norm_unit_sigma(self):
        """After power iteration converges, the normalized weight's true
        spectral norm (largest singular value) must be ~1 (torch
        spectral_norm semantics)."""
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 2.0)
        u = jnp.asarray(rng.randn(16).astype(np.float32))
        u = u / jnp.linalg.norm(u)
        for _ in range(50):
            u, _ = discriminator._power_iter(w, u)
        w_sn, sigma = discriminator.spectral_normalize(w, u)
        true_sigma = float(np.linalg.svd(
            np.asarray(w).reshape(-1, 16), compute_uv=False)[0])
        np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-4)
        np.testing.assert_allclose(
            np.linalg.svd(np.asarray(w_sn).reshape(-1, 16),
                          compute_uv=False)[0], 1.0, rtol=1e-4)

    def test_disc_head_structure_matches_vision_aided(self):
        """MultiLevelDViT parity: 2 spatial conv heads + 1 linear head on
        the projected embedding; logits shapes (B,g',g',1)x2 + (B,1)."""
        cfg = clip_vit.TINY_CLIP_VIT
        d = discriminator.init_discriminator(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((2, 64, 64, 3))
        logits = discriminator.discriminator_logits(d, cfg, x)
        g = cfg.image_size // cfg.patch_size
        g2 = (g + 1) // 2  # stride-2 conv, pad 1
        assert len(logits) == 3
        assert logits[0].shape == (2, g2, g2, 1)
        assert logits[1].shape == (2, g2, g2, 1)
        assert logits[2].shape == (2, 1)
        # head channel width per vision_aided MultiLevelDViT
        assert d["heads"]["spatial"][0]["conv1"]["kernel"].shape[-1] == \
            discriminator.HEAD_CHANNELS
        assert d["heads"]["final"]["lin1"]["kernel"].shape == (
            cfg.projection_dim, discriminator.HEAD_CHANNELS)

    def test_disc_head_goldens_vit_b32(self):
        """Full-scale golden layer table for the trainable heads, pinned
        against vision_aided_loss's published source (the package is not
        installable here — zero egress — so the table below is transcribed
        from github.com/nupurkmr9/vision-aided-gan
        vision_aided_loss/cv_discriminator.py `MultiLevelDViT.__init__`:
        level-1 spatial decoders of
          spectral_norm(Conv2d(in_ch1=768, out_ch=256, k=3, s=2, p=1))
          -> LeakyReLU(0.2) -> spectral_norm(Conv2d(256, num_classes=1, k=1))
        plus a final
          spectral_norm(Linear(in_ch2=512, 256)) -> LeakyReLU(0.2)
          -> spectral_norm(Linear(256, 1));
        CLIP taps per its cvmodel `forward` hooks at blocks n//3 and 2n//3
        of the ViT-B/32 tower). A silent head-shape drift fails here."""
        cfg = clip_vit.CLIP_VIT_B32
        shapes = jax.eval_shape(
            lambda k: discriminator.init_discriminator(k, cfg),
            jax.random.PRNGKey(0))
        heads = shapes["heads"]
        assert len(heads["spatial"]) == 2
        for lvl in heads["spatial"]:
            assert lvl["conv1"]["kernel"].shape == (3, 3, 768, 256)
            assert lvl["conv1"]["bias"].shape == (256,)
            assert lvl["conv2"]["kernel"].shape == (1, 1, 256, 1)
            assert lvl["conv2"]["bias"].shape == (1,)
        assert heads["final"]["lin1"]["kernel"].shape == (512, 256)
        assert heads["final"]["lin1"]["bias"].shape == (256,)
        assert heads["final"]["lin2"]["kernel"].shape == (256, 1)
        assert heads["final"]["lin2"]["bias"].shape == (1,)
        n_params = sum(int(np.prod(l.shape)) for l in
                       jax.tree_util.tree_leaves(heads))
        # 2*(3*3*768*256 + 256 + 256*1 + 1) + (512*256 + 256) + (256*1 + 1)
        assert n_params == 3_671_555, n_params
        # tap placement: blocks 4 and 8 of the 12-layer tower
        assert discriminator.tap_indices(cfg) == (4, 8)
        # sn `u` vectors: one per spectrally-normalized module, sized by
        # the torch weight-matrix leading dim (out features)
        assert shapes["sn"]["spatial"][0]["conv1"].shape == (256,)
        assert shapes["sn"]["spatial"][0]["conv2"].shape == (1,)
        assert shapes["sn"]["final"]["lin1"].shape == (256,)
        assert shapes["sn"]["final"]["lin2"].shape == (1,)

    def test_disc_backbone_gets_no_grads(self):
        cfg = clip_vit.TINY_CLIP_VIT
        d = discriminator.init_discriminator(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 64, 64, 3)) * 0.1

        def loss(params):
            return discriminator.disc_loss(params, cfg, x, for_real=True)

        g = jax.grad(loss)(d)
        backbone_norm = sum(float(jnp.abs(x).sum())
                            for x in jax.tree_util.tree_leaves(g["backbone"]))
        heads_norm = sum(float(jnp.abs(x).sum())
                         for x in jax.tree_util.tree_leaves(g["heads"]))
        assert backbone_norm == 0.0
        assert heads_norm > 0.0


class TestGradAccumulation:
    def test_helper_matches_big_batch_exactly(self):
        """rng-free loss: scanned micro-batch grads == big-batch grads."""
        from img2img_turbo_tpu.training import accum
        rng = np.random.RandomState(0)
        w = {"w": jnp.asarray(rng.randn(6, 3).astype(np.float32))}
        data = {"x": jnp.asarray(rng.randn(8, 6).astype(np.float32)),
                "y": jnp.asarray(rng.randn(8, 3).astype(np.float32))}

        def loss(params, mb, key):
            pred = mb["x"] @ params["w"]
            return jnp.mean((pred - mb["y"]) ** 2), {"l": jnp.mean(pred)}

        (_, _), g_big = jax.value_and_grad(loss, has_aux=True)(
            w, data, jax.random.PRNGKey(0))
        for k in (2, 4, 8):
            (lm, aux), g_acc = accum.accumulated_value_and_grad(
                loss, w, data, jax.random.PRNGKey(0), k)
            assert aux["l"].shape == (k,)
            np.testing.assert_allclose(np.asarray(g_acc["w"]),
                                       np.asarray(g_big["w"]),
                                       rtol=1e-5, atol=1e-7)

    def test_paired_recon_grads_match_big_batch(self, setup):
        """The real pass-1 loss (VAE+UNet+LPIPS[+CLIP-sim]) under scan
        accumulation reproduces the big-batch gradient. The VAE posterior is
        pinned to its mean (logvar forced to the -30 clip) so the per-micro
        rng fold is inert."""
        from img2img_turbo_tpu import scheduler
        from img2img_turbo_tpu.pipelines.pix2pix import generate_deterministic
        from img2img_turbo_tpu.training import accum, losses as losses_mod
        s = setup
        frozen = jax.tree_util.tree_map(lambda x: x, s["frozen"])
        frozen["vae"] = dict(frozen["vae"])
        qc = dict(frozen["vae"]["quant_conv"])
        z = s["cfgs"].vae.latent_channels
        kern = np.asarray(qc["kernel"]).copy()
        kern[..., z:] = 0.0
        bias = np.asarray(qc["bias"]).copy()
        bias[z:] = -40.0  # logvar clips to -30 -> std ~ 3e-7
        qc["kernel"], qc["bias"] = jnp.asarray(kern), jnp.asarray(bias)
        frozen["vae"]["quant_conv"] = qc

        alphas = scheduler.make_alphas_cumprod()
        loss_cfg = losses_mod.PairedLossConfig()
        batch = make_batch(b=4, seed=7)
        data = {"c_t": batch["conditioning_pixel_values"],
                "x_tgt": batch["output_pixel_values"]}

        def recon(gen, mb, key):
            params = paired.build_gen_params(gen, frozen, s["meta"])
            pred = generate_deterministic(params, s["cfgs"], alphas,
                                          mb["c_t"], jnp.zeros(
                                              (mb["c_t"].shape[0], 77,
                                               s["cfgs"].unet
                                               .cross_attention_dim)),
                                          key)
            l2 = loss_cfg.lambda_l2 * losses_mod.l2_loss(pred, mb["x_tgt"])
            lp = loss_cfg.lambda_lpips * losses_mod.lpips_loss(
                s["aux_frozen"]["lpips"], pred, mb["x_tgt"])
            return l2 + lp, {"l2": l2}

        (loss_big, _), g_big = jax.jit(
            jax.value_and_grad(recon, has_aux=True))(
            s["state"]["gen"], data, jax.random.PRNGKey(3))
        (loss_acc, _), g_acc = jax.jit(
            lambda p, d, r: accum.accumulated_value_and_grad(
                recon, p, d, r, 2))(
            s["state"]["gen"], data, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(loss_acc), float(loss_big),
                                   rtol=1e-5)
        flat_big = jax.tree_util.tree_leaves(g_big)
        flat_acc = jax.tree_util.tree_leaves(g_acc)
        for a, b in zip(flat_acc, flat_big):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_paired_step_with_accum_runs_and_matches_metrics(self, setup):
        """Full 4-pass step with accum_steps=2: finite losses, params move,
        pass-1 metrics match the accum_steps=1 step (same pinned posterior,
        identical batch)."""
        s = setup
        frozen = jax.tree_util.tree_map(lambda x: x, s["frozen"])
        frozen["vae"] = dict(frozen["vae"])
        qc = dict(frozen["vae"]["quant_conv"])
        z = s["cfgs"].vae.latent_channels
        kern = np.asarray(qc["kernel"]).copy()
        kern[..., z:] = 0.0
        bias = np.asarray(qc["bias"]).copy()
        bias[z:] = -40.0
        qc["kernel"], qc["bias"] = jnp.asarray(kern), jnp.asarray(bias)
        frozen["vae"]["quant_conv"] = qc

        from img2img_turbo_tpu.training import optim
        loss_cfg = losses_mod.PairedLossConfig()
        sched = optim.make_lr_schedule("constant", 5e-4, 0, 100)
        gen_tx = optim.make_adamw(sched, max_grad_norm=1.0)
        disc_tx = optim.make_adamw(sched, max_grad_norm=1.0)
        step1 = jax.jit(paired.make_paired_train_step(
            s["cfgs"], s["clip_cfg"], loss_cfg, s["meta"], gen_tx, disc_tx,
            remat=True, accum_steps=1))
        step2 = jax.jit(paired.make_paired_train_step(
            s["cfgs"], s["clip_cfg"], loss_cfg, s["meta"], gen_tx, disc_tx,
            remat=True, accum_steps=2))
        batch = make_batch(b=4, seed=9)
        st1, m1 = step1(s["state"], frozen, s["aux_frozen"], batch,
                        jax.random.PRNGKey(11))
        st2, m2 = step2(s["state"], frozen, s["aux_frozen"], batch,
                        jax.random.PRNGKey(11))
        for k in m2:
            assert np.isfinite(float(m2[k])), k
        # pass-1 losses are batch means of the SAME forward -> must agree
        for k in ("loss_l2", "loss_lpips", "loss_clipsim"):
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=5e-4, atol=1e-6)
        assert int(st2["step"]) == 1

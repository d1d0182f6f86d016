"""CycleGAN (unpaired) training-step test on tiny configs: 6 objectives,
finite losses, correct trainable partition, dual discriminator updates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs, lora as lora_mod
from img2img_turbo_tpu.models import clip_vit, discriminator, vgg_lpips
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.pipelines.cyclegan import cyclegan_unet_adapters
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
from img2img_turbo_tpu.training import losses as losses_mod
from img2img_turbo_tpu.training import optim, unpaired

RES = 32  # micro 2-level UNet/VAE: one downsample each


@pytest.fixture(scope="module")
def setup():
    cfgs = GeneratorConfigs(unet=configs.MICRO_UNET, vae=configs.MICRO_VAE,
                            text=configs.TINY_TEXT)
    clip_cfg = clip_vit.TINY_CLIP_VIT
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    unet_p = unet_mod.init_unet(ks[0], cfgs.unet)
    vae_a2b = vae_mod.init_vae(ks[1], cfgs.vae)
    vae_b2a = jax.tree_util.tree_map(jnp.copy, vae_a2b)
    adapters = cyclegan_unet_adapters(unet_p, 4, ks[2])
    vae_spec = lora_mod.LoRASpec(4, lora_mod.CYCLEGAN_VAE_TARGETS)
    la = lora_mod.init_lora(ks[3], vae_a2b, vae_spec, "vae")
    lb = lora_mod.init_lora(ks[3], vae_b2a, vae_spec, "vae")
    gen, frozen, meta = unpaired.split_trainable(unet_p, vae_a2b, vae_b2a,
                                                 adapters, la, lb)
    d_full = discriminator.init_discriminator(ks[4], clip_cfg)
    d_full_b = discriminator.init_discriminator(
        ks[5], clip_cfg, backbone=d_full["backbone"])
    disc = {"a": d_full["heads"], "b": d_full_b["heads"]}
    disc_sn = {"a": d_full["sn"], "b": d_full_b["sn"]}
    aux = {"lpips": vgg_lpips.init_vgg_lpips(ks[6]),
           "disc_backbone": d_full["backbone"]}
    sched = optim.make_lr_schedule("constant", 1e-4, 0, 10)
    gen_tx = optim.make_adamw(sched, max_grad_norm=10.0)
    disc_tx = optim.make_adamw(sched, max_grad_norm=10.0)
    state = {"gen": gen, "gen_opt": gen_tx.init(gen), "disc": disc,
             "disc_sn": disc_sn, "disc_opt": disc_tx.init(disc),
             "step": jnp.zeros((), jnp.int32)}
    step = jax.jit(unpaired.make_unpaired_train_step(
        cfgs, clip_cfg, losses_mod.UnpairedLossConfig(), meta, gen_tx,
        disc_tx, remat=False))
    return dict(cfgs=cfgs, state=state, frozen=frozen, aux=aux, step=step,
                meta=meta, adapters=adapters)


def make_batch(cfgs, b=1, seed=0):
    rng = np.random.RandomState(seed)
    d = cfgs.unet.cross_attention_dim
    return {
        "pixel_values_src": jnp.asarray(
            (rng.rand(b, RES, RES, 3) * 2 - 1).astype(np.float32)),
        "pixel_values_tgt": jnp.asarray(
            (rng.rand(b, RES, RES, 3) * 2 - 1).astype(np.float32)),
        "emb_a2b": jnp.asarray(rng.randn(b, 77, d).astype(np.float32) * .1),
        "emb_b2a": jnp.asarray(rng.randn(b, 77, d).astype(np.float32) * .1),
    }


def test_step_updates_and_metrics(setup):
    s = setup
    state1, metrics = s["step"](s["state"], s["frozen"], s["aux"],
                                make_batch(s["cfgs"]), jax.random.PRNGKey(0))
    assert set(metrics) == {"cycle_a", "cycle_b", "gan_a", "gan_b", "idt_a",
                            "idt_b", "disc_fake", "disc_real"}
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # all three unet adapters moved (their Bs were zero)
    for name, mods in state1["gen"]["unet_lora"].items():
        total = sum(float(jnp.abs(m["b"]).sum()) for m in mods.values())
        assert total > 0, f"adapter {name} got no gradient"
    # both VAEs' loras moved
    for vkey in ("vae_a2b_lora", "vae_b2a_lora"):
        total = sum(float(jnp.abs(m["b"]).sum())
                    for m in state1["gen"][vkey].values())
        assert total > 0, vkey
    # both discriminators moved
    for dkey in ("a", "b"):
        delta = jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - y).max()),
            s["state"]["disc"][dkey], state1["disc"][dkey])
        assert max(jax.tree_util.tree_leaves(delta)) > 0, dkey
    assert int(state1["step"]) == 1


def test_adapter_targets_cover_reference_partition(setup):
    names = set()
    for adapter in setup["adapters"].values():
        names |= set(adapter["modules"])
    # conv_in is trained fully (not lora) but IS in the encoder adapter per
    # the reference grep (cyclegan_turbo.py:57-58)
    assert "conv_in" in names
    assert any("up_blocks" in n for n in names)
    assert any("down_blocks" in n for n in names)
    assert "mid_block.resnets.0.conv1" in names


def test_step_with_grad_accumulation(setup):
    """6-objective step with accum_steps=2 (lax.scan micro-batches): finite
    losses, params move, step counter advances."""
    s = setup
    step2 = jax.jit(unpaired.make_unpaired_train_step(
        s["cfgs"], clip_vit.TINY_CLIP_VIT, losses_mod.UnpairedLossConfig(),
        s["meta"], optim.make_adamw(optim.make_lr_schedule(
            "constant", 1e-4, 0, 10), max_grad_norm=10.0),
        optim.make_adamw(optim.make_lr_schedule(
            "constant", 1e-4, 0, 10), max_grad_norm=10.0),
        remat=False, accum_steps=2))
    state1, metrics = step2(s["state"], s["frozen"], s["aux"],
                            make_batch(s["cfgs"], b=2, seed=5),
                            jax.random.PRNGKey(5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    before = s["state"]["gen"]["conv_in"]["kernel"]
    after = state1["gen"]["conv_in"]["kernel"]
    assert np.abs(np.asarray(after - before)).max() > 0
    assert int(state1["step"]) == 1

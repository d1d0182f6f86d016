"""Golden-output regression tests.

Without pretrained weights on this machine, absolute parity to the PyTorch
reference can't be asserted; instead these goldens pin THIS framework's
numerics: fixed seed + tiny config -> exact recorded outputs. Any future
refactor that unintentionally changes model math (layer order, eps, scaling,
layout) breaks these. Regenerate deliberately with:
    python tests/test_goldens.py --regen
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "tiny_outputs.npz")
TOL = dict(rtol=2e-4, atol=2e-5)


def _compute_outputs():
    from img2img_turbo_tpu import configs, scheduler
    from img2img_turbo_tpu.models import clip_text, unet as unet_mod
    from img2img_turbo_tpu.models import vae as vae_mod
    from img2img_turbo_tpu.pipelines.pix2pix import (GeneratorConfigs,
                                                     generate_deterministic)

    cfgs = GeneratorConfigs(unet=configs.TINY_UNET, vae=configs.TINY_VAE,
                            text=configs.TINY_TEXT)
    ks = jax.random.split(jax.random.PRNGKey(1234), 4)
    unet_p = unet_mod.init_unet(ks[0], cfgs.unet)
    vae_p = vae_mod.init_vae(ks[1], cfgs.vae)
    text_p = clip_text.init_clip_text(ks[2], cfgs.text)
    alphas = scheduler.make_alphas_cumprod()

    rngs = np.random.RandomState(0)
    c_t = jnp.asarray(rngs.rand(1, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rngs.randint(0, 999, (1, 77)), jnp.int32)

    ctx = clip_text.clip_text_forward(text_p, cfgs.text, ids)
    z, skips = vae_mod.encode(vae_p, cfgs.vae, c_t, ks[3])
    t = jnp.full((1,), 999, jnp.int32)
    eps = unet_mod.unet_forward(unet_p, cfgs.unet,
                                z * cfgs.vae.scaling_factor, t, ctx)
    img = generate_deterministic({"unet": unet_p, "vae": vae_p}, cfgs,
                                 alphas, c_t, ctx, ks[3])
    return {
        "text_enc": np.asarray(ctx),
        "vae_latent": np.asarray(z),
        "vae_skip0": np.asarray(skips[0]),
        "unet_eps": np.asarray(eps),
        "full_output": np.asarray(img),
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH),
                    reason="goldens not generated")
def test_outputs_match_goldens():
    golden = np.load(GOLDEN_PATH)
    got = _compute_outputs()
    assert set(golden.files) == set(got)
    for k in golden.files:
        np.testing.assert_allclose(got[k], golden[k], err_msg=k, **TOL)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **_compute_outputs())
        print(f"wrote {GOLDEN_PATH}")

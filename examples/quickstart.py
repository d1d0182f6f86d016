"""Quickstart: the three ways to run one-step translation.

Run with random weights (no downloads needed) on any backend:
    python examples/quickstart.py
With real weights, replace from_random with
    Pix2PixTurbo.from_pretrained(sd_turbo_dir, "edge_to_image")
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import unet as unet_mod
from img2img_turbo_tpu.ops import canny, image as image_ops
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs, Pix2PixTurbo
from img2img_turbo_tpu.serving.engine import ServingEngine

# tiny configs so this runs in seconds anywhere; swap for GeneratorConfigs()
# + from_pretrained for the real model
cfgs = GeneratorConfigs(unet=configs.TINY_UNET, vae=configs.TINY_VAE,
                        text=configs.TINY_TEXT)
pipe = Pix2PixTurbo.from_random(jax.random.PRNGKey(0), cfgs=cfgs).merge()
ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim))

# 1. library API: edge map -> image
img_u8 = jnp.asarray(np.random.randint(0, 255, (1, 64, 64, 3), np.uint8))
c_t = canny.canny_3ch_unit(img_u8)
out = pipe(c_t, caption_enc=ctx)
print("1. pipeline:", out.shape, "in [-1,1]")

# 2. stochastic sketch path (runtime r, seeded noise)
pipe.base["unet"] = unet_mod.make_twin_conv_in(pipe.base["unet"])
noise = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
out = pipe(c_t, caption_enc=ctx, deterministic=False, r=0.4,
           noise_map=noise)
print("2. stochastic:", out.shape)

# 3. serving engine: one compiled uint8 -> uint8 program
engine = ServingEngine(pipe.params, cfgs, mode="edge_to_image",
                       dtype=jnp.float32, donate_input=False)
out_u8 = engine(img_u8, ctx)
print("3. serving:", out_u8.shape, out_u8.dtype)

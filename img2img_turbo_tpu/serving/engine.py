"""Serving engine: the uint8-in/uint8-out compiled path.

The whole serving pipeline — uint8 decode -> (optional on-device canny) ->
normalize -> VAE encode -> UNet(t=999) -> denoise -> skip-fused decode ->
uint8 — is ONE jitted XLA program per (batch, H, W) bucket, with prompt
embeddings precomputed and cached (BASELINE.json north star; the reference
crosses host<->device repeatedly: cv2 canny on host, ToTensor, .cuda(),
.cpu(), ToPILImage — inference_paired.py:42-75).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import scheduler
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.ops import canny as canny_mod, image as image_mod
from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs


def _serve_edge(params, cfgs: GeneratorConfigs, alphas, image_u8,
                caption_enc, rng, low: float, high: float):
    """uint8 RGB -> canny control -> one-step generator -> uint8 RGB."""
    c_t = canny_mod.canny_3ch_unit(image_u8, low, high)
    c_t = c_t.astype(caption_enc.dtype)
    s = cfgs.vae.scaling_factor
    z, skips = vae_mod.encode(params["vae"], cfgs.vae, c_t, rng)
    z = z * s
    t = jnp.full((c_t.shape[0],), scheduler.ONE_STEP_T, jnp.int32)
    eps = unet_mod.unet_forward(params["unet"], cfgs.unet, z, t, caption_enc)
    x0 = scheduler.ddpm_x0_step(eps, z, t, alphas)
    img = vae_mod.decode(params["vae"], cfgs.vae, x0 / s, skips, gamma=1.0)
    return image_mod.signed_to_uint8(img)


def _serve_image(params, cfgs: GeneratorConfigs, alphas, image_u8,
                 caption_enc, rng):
    """uint8 RGB -> [-1,1] -> generator -> uint8 (CycleGAN-style input)."""
    c_t = image_mod.uint8_to_signed(image_u8).astype(caption_enc.dtype)
    s = cfgs.vae.scaling_factor
    z, skips = vae_mod.encode(params["vae"], cfgs.vae, c_t, rng)
    z = z * s
    t = jnp.full((c_t.shape[0],), scheduler.ONE_STEP_T, jnp.int32)
    eps = unet_mod.unet_forward(params["unet"], cfgs.unet, z, t, caption_enc)
    x0 = scheduler.ddpm_x0_step(eps, z, t, alphas)
    img = vae_mod.decode(params["vae"], cfgs.vae, x0 / s, skips, gamma=1.0)
    return image_mod.signed_to_uint8(img)


def _serve_sketch(base, lora, cfgs: GeneratorConfigs, alphas, image_u8,
                  caption_enc, rng, r):
    """uint8 sketch -> threshold < 0.5 -> stochastic generator -> uint8
    (reference inference_paired.py:55-63 + pix2pix_turbo.py:204-218).
    r is a traced scalar; rng drives both the noise map and the posterior."""
    from img2img_turbo_tpu.pipelines.pix2pix import generate_stochastic

    unit = image_mod.uint8_to_unit(image_u8)
    c_t = (unit < 0.5).astype(caption_enc.dtype)
    nkey, vkey = jax.random.split(rng)
    b, h, w, _ = image_u8.shape
    noise = jax.random.normal(nkey, (b, h // 8, w // 8, 4),
                              caption_enc.dtype)
    img = generate_stochastic(base, lora, cfgs, alphas, c_t, caption_enc,
                              vkey, r, noise)
    return image_mod.signed_to_uint8(img)


class ServingEngine:
    """Compiled one-step translation server.

    mode:
    - "edge_to_image": on-device canny preprocessing (deterministic)
    - "image": direct [-1,1] input (CycleGAN-style, deterministic)
    - "sketch": stochastic path — pass base/lora (factored) instead of
      merged params; __call__ takes a traced r (sketch guidance).
    """

    def __init__(self, params: Dict = None,
                 cfgs: Optional[GeneratorConfigs] = None,
                 mode: str = "edge_to_image", dtype=jnp.bfloat16,
                 canny_low: float = 100.0, canny_high: float = 200.0,
                 donate_input: bool = True, base: Dict = None,
                 lora: Dict = None, mesh=None):
        """mesh: a parallel.mesh data mesh for batch serving over multiple
        chips — the pipeline is shard_map'd over the data axis so each
        shard runs the full single-device program (Pallas kernels
        included) on its local batch slice; the batch size must divide the
        data-axis size. Params are replicated (866M bf16 fits one v5e)."""
        self.cfgs = cfgs or GeneratorConfigs()
        self.mode = mode
        self.dtype = dtype
        alphas = scheduler.make_alphas_cumprod()

        def dp_wrap(fn, batch_argnums, rng_argnums):
            if mesh is None:
                return fn
            from img2img_turbo_tpu.parallel import mesh as mesh_mod
            if mesh.shape[mesh_mod.DATA_AXIS] == 1:
                return fn
            return mesh_mod.dp_shard_map_fn(
                fn, mesh, batch_argnums=batch_argnums,
                rng_argnums=rng_argnums)

        def cast(tree):
            # lora trees carry python scalars (rank/alpha) — leave those
            return jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                tree)

        if mode == "edge_to_image":
            self.params = cast(params)

            def edge_fn(params, image_u8, caption_enc, rng):
                return _serve_edge(params, self.cfgs, alphas, image_u8,
                                   caption_enc, rng, canny_low, canny_high)

            self._fn = jax.jit(dp_wrap(edge_fn, (1, 2), (3,)),
                               donate_argnums=(1,) if donate_input else ())
        elif mode == "image":
            self.params = cast(params)

            def image_fn(params, image_u8, caption_enc, rng):
                return _serve_image(params, self.cfgs, alphas, image_u8,
                                    caption_enc, rng)

            self._fn = jax.jit(dp_wrap(image_fn, (1, 2), (3,)),
                               donate_argnums=(1,) if donate_input else ())
        elif mode == "sketch":
            assert base is not None and lora is not None, (
                "sketch mode needs factored base+lora (runtime r scaling)")
            self.base = cast(base)
            self.lora = cast(lora)

            def sketch_fn(base_p, lora_p, image_u8, caption_enc, rng, r):
                return _serve_sketch(base_p, lora_p, self.cfgs, alphas,
                                     image_u8, caption_enc, rng, r)

            self._sketch_fn = jax.jit(
                dp_wrap(sketch_fn, (2, 3), (4,)),
                donate_argnums=(2,) if donate_input else ())
        else:
            raise ValueError(f"unknown serving mode {mode!r}")

    def __call__(self, image_u8, caption_enc, rng=None, r: float = 0.4):
        """image_u8: (B, H, W, 3) uint8 on host or device. Returns uint8
        (B, H, W, 3) on device. r only applies in sketch mode."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if caption_enc.shape[0] != image_u8.shape[0]:
            caption_enc = jnp.broadcast_to(
                caption_enc, (image_u8.shape[0],) + caption_enc.shape[1:])
        if self.mode == "sketch":
            return self._sketch_fn(self.base, self.lora,
                                   jnp.asarray(image_u8),
                                   caption_enc.astype(self.dtype),
                                   rng, jnp.asarray(r, jnp.float32))
        return self._fn(self.params, jnp.asarray(image_u8),
                        caption_enc.astype(self.dtype), rng)

    def warmup(self, batch: int, height: int, width: int, caption_enc):
        dummy = jnp.zeros((batch, height, width, 3), jnp.uint8)
        self(dummy, caption_enc).block_until_ready()
        return self


# default shape buckets for arbitrary-size inputs (gradio canvases etc.);
# one compiled program per bucket instead of one per size
SIZE_BUCKETS = (256, 384, 512, 768, 1024)


def bucket_size(n: int, buckets=SIZE_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


class BucketedEngine:
    """Wraps ServingEngine for arbitrary input sizes: pads the image to the
    nearest (H, W) bucket (edge padding), runs the bucketed program, crops
    the output back. Bounds compile count for interactive use where every
    canvas resize would otherwise trigger a ~30 s recompile."""

    def __init__(self, engine: ServingEngine):
        self.engine = engine

    def __call__(self, image_u8, caption_enc, rng=None):
        import numpy as np
        arr = np.asarray(image_u8)
        b, h, w, c = arr.shape
        bh, bw = bucket_size(h), bucket_size(w)
        if (bh, bw) != (h, w):
            arr = np.pad(arr, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)),
                         mode="edge")
        out = self.engine(jnp.asarray(arr), caption_enc, rng)
        return out[:, :h, :w]

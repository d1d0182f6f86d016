"""Benchmark: one-step 512x512 translation on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: p50 end-to-end latency of the uint8-in/uint8-out serving
path (on-device canny -> pix2pix-turbo generator -> uint8) at 512x512,
batch 1, bf16 — the BASELINE.md north-star config. vs_baseline is the
speedup over the reference's published 0.11 s on an NVIDIA A100
(README.md:17; target <=0.05 s on one v5e chip).

Weights are random/zeros (pretrained safetensors are not on this machine);
latency is weight-content-independent. Extra fields report batched
throughput (batch 8) for the serving config.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_A100_S = 0.11


def main():
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
    from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
    from img2img_turbo_tpu.serving.engine import ServingEngine

    cfgs = GeneratorConfigs()
    dtype = jnp.bfloat16
    unet_shapes = jax.eval_shape(
        lambda k: unet_mod.init_unet(k, cfgs.unet), jax.random.PRNGKey(0))
    vae_shapes = jax.eval_shape(
        lambda k: vae_mod.init_vae(k, cfgs.vae), jax.random.PRNGKey(0))

    # content-free weights: small constants (avoid all-zero degenerate
    # matmuls being optimized away)
    def mk(shapes, c):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, c, dtype), shapes)

    params = {"unet": mk(unet_shapes, 0.001), "vae": mk(vae_shapes, 0.001)}
    engine = ServingEngine(params, cfgs, mode="edge_to_image", dtype=dtype,
                           donate_input=False)
    ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim), dtype)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 512, 512, 3)).astype(np.uint8)
    img_dev = jnp.asarray(img)

    # warmup/compile
    engine(img_dev, ctx).block_until_ready()

    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        out = engine(img_dev, ctx)
        out.block_until_ready()
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    p90 = float(np.percentile(lat, 90))

    # batched throughput (batch 8)
    b = 8
    imgs8 = jnp.asarray(rng.randint(0, 255, (b, 512, 512, 3))
                        .astype(np.uint8))
    engine(imgs8, ctx).block_until_ready()
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = engine(imgs8, ctx)
    out.block_until_ready()
    throughput = b * iters / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "pix2pix_turbo_512_e2e_p50_latency",
        "value": round(p50, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_A100_S / p50, 3),
        "p90_s": round(p90, 5),
        "throughput_b8_img_per_s": round(throughput, 2),
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
    }))


if __name__ == "__main__":
    main()

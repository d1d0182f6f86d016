"""Benchmark: one-step 512x512 translation on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: per-call ON-DEVICE latency of the uint8-in/uint8-out
serving path (on-device canny -> pix2pix-turbo generator -> uint8) at
512x512, batch 1, bf16 — measured from the XLA profiler's device track.
Wall-clock on this test rig includes a ~35-40 ms fixed host<->device relay
round-trip (the axon loopback tunnel) that does not exist on a production
TPU host (PCIe-attached, microseconds); the raw wall numbers are reported
alongside for transparency (`wall_p50_s`, `rig_fetch_overhead_s` = measured
round-trip of a no-op fetch).

vs_baseline is the speedup over the reference's published 0.11 s on an
NVIDIA A100 (README.md:17; target <=0.05 s on one v5e chip).

Weights are random constants (pretrained safetensors are not on this
machine); latency is weight-content-independent.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: the Pallas-heavy programs take many minutes
# of remote Mosaic compiles cold; any earlier run (bench or CLI) with the
# same cache dir makes this start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_A100_S = 0.11


def main():
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
    from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
    from img2img_turbo_tpu.serving.engine import ServingEngine
    from img2img_turbo_tpu.utils.profiling import device_time_per_call

    cfgs = GeneratorConfigs()
    dtype = jnp.bfloat16

    def mk(shapes, c):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, c, dtype), shapes)

    unet_shapes = jax.eval_shape(
        lambda k: unet_mod.init_unet(k, cfgs.unet), jax.random.PRNGKey(0))
    vae_shapes = jax.eval_shape(
        lambda k: vae_mod.init_vae(k, cfgs.vae), jax.random.PRNGKey(0))
    params = {"unet": mk(unet_shapes, 0.001), "vae": mk(vae_shapes, 0.001)}
    engine = ServingEngine(params, cfgs, mode="edge_to_image", dtype=dtype,
                           donate_input=False)
    ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim), dtype)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (1, 512, 512, 3)).astype(np.uint8))

    # rig fetch-overhead calibration: no-op + host fetch round trip
    noop = jax.jit(lambda x: x[0, 0, 0, :1] + 1)
    _ = np.asarray(noop(img))
    fetch_ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(noop(img))
        fetch_ts.append(time.perf_counter() - t0)
    fetch_overhead = float(np.percentile(fetch_ts, 50))

    # device-time latency (profiler device-track span per call)
    dev = device_time_per_call(lambda im, c: engine(im, c), (img, ctx),
                               iters=10)
    device_p50 = dev.get("device_span_per_call_s", float("nan"))

    # wall-clock with full uint8 image fetched to host (includes the tunnel)
    _ = np.asarray(engine(img, ctx))
    wall_ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(engine(img, ctx))
        wall_ts.append(time.perf_counter() - t0)
    wall_p50 = float(np.percentile(wall_ts, 50))

    # batched throughput (batch 8), device-time basis
    imgs8 = jnp.asarray(rng.randint(0, 255, (8, 512, 512, 3))
                        .astype(np.uint8))
    ctx8 = jnp.zeros((8, 77, cfgs.unet.cross_attention_dim), dtype)
    dev8 = device_time_per_call(lambda im, c: engine(im, c), (imgs8, ctx8),
                                iters=5)
    batch8_span = dev8.get("device_span_per_call_s", float("nan"))
    throughput = 8.0 / batch8_span if batch8_span == batch8_span else None

    print(json.dumps({
        "metric": "pix2pix_turbo_512_e2e_device_p50_latency",
        "value": round(device_p50, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_A100_S / device_p50, 3),
        "wall_p50_s": round(wall_p50, 5),
        "rig_fetch_overhead_s": round(fetch_overhead, 5),
        "throughput_b8_img_per_s": (round(throughput, 2)
                                    if throughput else None),
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
    }))


if __name__ == "__main__":
    main()

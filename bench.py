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


def _train_step_device_time() -> float:
    """Device span of one paired-LoRA fine-tuning step at 512^2 b1 (the
    bench_suite config-5 graph: 4-pass step, remat, Pallas forwards with
    their XLA-conv custom-VJP backwards)."""
    from img2img_turbo_tpu import lora as lora_mod
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
    from img2img_turbo_tpu.models import clip_text, clip_vit, discriminator
    from img2img_turbo_tpu.models import vgg_lpips
    from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
    from img2img_turbo_tpu.training import losses as losses_mod
    from img2img_turbo_tpu.training import optim, paired
    from img2img_turbo_tpu.utils.profiling import device_time_per_call

    cfgs = GeneratorConfigs()
    dt = jnp.bfloat16

    def mk(shapes, c=0.001):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, c, dt), shapes)

    unet_p = mk(jax.eval_shape(lambda k: unet_mod.init_unet(k, cfgs.unet),
                               jax.random.PRNGKey(0)))
    vae_p = mk(jax.eval_shape(lambda k: vae_mod.init_vae(k, cfgs.vae),
                              jax.random.PRNGKey(0)))
    spec_u = lora_mod.LoRASpec(8, lora_mod.PIX2PIX_UNET_TARGETS)
    spec_v = lora_mod.LoRASpec(4, lora_mod.PIX2PIX_VAE_TARGETS)
    gen, frozen, meta = paired.split_trainable(
        dict(unet_p), jax.tree_util.tree_map(lambda x: x, vae_p),
        lora_mod.init_lora(jax.random.PRNGKey(4), unet_p, spec_u, "unet"),
        lora_mod.init_lora(jax.random.PRNGKey(5), vae_p, spec_v, "vae"))
    clip_cfg = clip_vit.CLIP_VIT_B32
    d_full = discriminator.init_discriminator(jax.random.PRNGKey(6),
                                              clip_cfg)
    aux = {
        "text": mk(jax.eval_shape(
            lambda k: clip_text.init_clip_text(k, cfgs.text),
            jax.random.PRNGKey(0))),
        "lpips": mk(jax.eval_shape(vgg_lpips.init_vgg_lpips,
                                   jax.random.PRNGKey(0))),
        "clip": mk(jax.eval_shape(lambda k: clip_vit.init_clip(k, clip_cfg),
                                  jax.random.PRNGKey(0))),
        "disc_backbone": mk(jax.eval_shape(
            lambda k: clip_vit.init_vision_tower(k, clip_cfg),
            jax.random.PRNGKey(0))),
    }
    sched = optim.make_lr_schedule("constant", 5e-6, 0, 100)
    gen_tx = optim.make_adamw(sched)
    disc_tx = optim.make_adamw(sched)
    state = {"gen": gen, "gen_opt": gen_tx.init(gen),
             "disc": d_full["heads"], "disc_sn": d_full["sn"],
             "disc_opt": disc_tx.init(d_full["heads"]),
             "step": jnp.zeros((), jnp.int32)}
    step = jax.jit(paired.make_paired_train_step(
        cfgs, clip_cfg, losses_mod.PairedLossConfig(), meta, gen_tx,
        disc_tx, remat=True))
    batch = {
        "conditioning_pixel_values": jnp.zeros((1, 512, 512, 3), dt),
        "output_pixel_values": jnp.zeros((1, 512, 512, 3), dt),
        "input_ids": jnp.zeros((1, 77), jnp.int32),
    }
    st = device_time_per_call(
        lambda s_, b_: step(s_, frozen, aux, b_, jax.random.PRNGKey(0))[1],
        (state, batch), 3)
    return st["device_span_per_call_s"]


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

    # odd-size e2e: the reference's flagship bird.png serving shape after
    # its x8 crop (840x560) — pins the non-2^k-width kernel path
    # (VERDICT r2 item 3). Guarded: the primary metric must never die on
    # a secondary config.
    try:
        img_odd = jnp.asarray(rng.randint(0, 255, (1, 560, 840, 3))
                              .astype(np.uint8))
        dev_odd = device_time_per_call(lambda im, c: engine(im, c),
                                       (img_odd, ctx), iters=10)
        e2e_840x560 = round(dev_odd["device_span_per_call_s"], 5)
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"840x560 bench failed: {e!r}", file=sys.stderr)
        e2e_840x560 = None

    # paired LoRA fine-tuning step, 512^2 b1 (VERDICT r2 item 6: the
    # Pallas-fwd/XLA-bwd training graph, journaled every round)
    try:
        train_step_s = round(_train_step_device_time(), 5)
    except Exception as e:  # pragma: no cover - bench robustness
        print(f"train-step bench failed: {e!r}", file=sys.stderr)
        train_step_s = None

    print(json.dumps({
        "metric": "pix2pix_turbo_512_e2e_device_p50_latency",
        "value": round(device_p50, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_A100_S / device_p50, 3),
        "wall_p50_s": round(wall_p50, 5),
        "rig_fetch_overhead_s": round(fetch_overhead, 5),
        "throughput_b8_img_per_s": (round(throughput, 2)
                                    if throughput else None),
        "e2e_840x560_device_p50_s": e2e_840x560,
        "train_step_512_b1_device_s": train_step_s,
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
    }))


if __name__ == "__main__":
    main()

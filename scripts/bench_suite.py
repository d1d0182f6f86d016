"""Extended benchmark suite: the five BASELINE.json configs, one JSON line
each (bench.py remains the single-line driver entry point).

1. pix2pix edge_to_image 512x512 single image (bird.png content)
2. sketch_to_image_stochastic with gamma/seed variation (runtime-r path)
3. CycleGAN day<->night 512x512 both directions
4. batched serving throughput (batch 8 and 32)
5. pix2pix LoRA fine-tuning step throughput (fill50k-shaped batches)

Latencies are on-device (profiler device-track span; see bench.py for why
wall-clock on this rig is dominated by a fixed relay round trip). Weights
are random constants — timing is content-independent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from PIL import Image
    from img2img_turbo_tpu import configs, lora as lora_mod, scheduler
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
    from img2img_turbo_tpu.pipelines import cyclegan as cg
    from img2img_turbo_tpu.pipelines import pix2pix as p2p
    from img2img_turbo_tpu.serving.engine import ServingEngine
    from img2img_turbo_tpu.utils.profiling import device_time_per_call

    cfgs = p2p.GeneratorConfigs()
    dt = jnp.bfloat16

    def mk(shapes, c=0.001):
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, c, dt), shapes)

    unet_p = mk(jax.eval_shape(lambda k: unet_mod.init_unet(k, cfgs.unet),
                               jax.random.PRNGKey(0)))
    vae_p = mk(jax.eval_shape(lambda k: vae_mod.init_vae(k, cfgs.vae),
                              jax.random.PRNGKey(0)))
    params = {"unet": unet_p, "vae": vae_p}
    ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim), dt)
    alphas = scheduler.make_alphas_cumprod()

    bird = Image.open(
        "/root/reference/assets/examples/bird.png").convert("RGB")
    bird = bird.resize((512, 512), Image.LANCZOS)
    bird_u8 = jnp.asarray(np.asarray(bird, np.uint8))[None]

    # 1. edge_to_image single image --------------------------------------
    eng = ServingEngine(params, cfgs, mode="edge_to_image", dtype=dt,
                        donate_input=False)
    st = device_time_per_call(lambda im, c: eng(im, c), (bird_u8, ctx), 10)
    emit(config="edge_to_image_512_bird", device_p50_s=round(
        st["device_span_per_call_s"], 5), unit="s")

    # 2. stochastic sketch, gamma/seed sweep ------------------------------
    twin_unet = unet_mod.make_twin_conv_in(dict(unet_p))
    spec_u = lora_mod.LoRASpec(8, lora_mod.PIX2PIX_UNET_TARGETS)
    spec_v = lora_mod.LoRASpec(4, lora_mod.PIX2PIX_VAE_TARGETS)
    lora_u = lora_mod.init_lora(jax.random.PRNGKey(1), twin_unet, spec_u,
                                "unet")
    lora_v = lora_mod.init_lora(jax.random.PRNGKey(2), vae_p, spec_v, "vae")
    base = {"unet": twin_unet, "vae": vae_p}
    lora = {"unet": lora_u, "vae": lora_v}
    sketch = (jnp.zeros((1, 512, 512, 3), dt) + 1.0)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 4), dt)

    def sto(r):
        return p2p.generate_stochastic(base, lora, cfgs, alphas, sketch,
                                       ctx, jax.random.PRNGKey(0), r, noise)

    sto_j = jax.jit(sto)
    st = device_time_per_call(sto_j, (jnp.float32(0.4),), 6)
    # sweep distinct r/seeds through the SAME compiled program
    t0 = time.perf_counter()
    outs = [sto_j(jnp.float32(r)) for r in (0.1, 0.3, 0.5, 0.7, 0.9)]
    jax.block_until_ready(outs)
    emit(config="sketch_stochastic_512_runtime_r",
         device_p50_s=round(st["device_span_per_call_s"], 5), unit="s",
         r_sweep_programs=1)

    # 3. CycleGAN both directions -----------------------------------------
    cg_params = {"unet": unet_p, "vae_a2b": vae_p, "vae_b2a": vae_p}
    img = jnp.zeros((1, 512, 512, 3), dt)

    for direction in ("a2b", "b2a"):
        f = jax.jit(lambda x, e, d=direction: cg.forward_with_params(
            cg_params, cfgs, alphas, x, e, jax.random.PRNGKey(0), d))
        st = device_time_per_call(f, (img, ctx), 6)
        emit(config=f"cyclegan_512_{direction}", device_p50_s=round(
            st["device_span_per_call_s"], 5), unit="s")

    # 4. batched serving ----------------------------------------------------
    for b in (8, 32):
        imgs = jnp.zeros((b, 512, 512, 3), jnp.uint8)
        ctxb = jnp.zeros((b, 77, cfgs.unet.cross_attention_dim), dt)
        st = device_time_per_call(lambda im, c: eng(im, c), (imgs, ctxb), 4)
        span = st["device_span_per_call_s"]
        emit(config=f"batched_serving_b{b}",
             images_per_s=round(b / span, 2),
             device_s_per_batch=round(span, 4))

    # 5. fine-tuning step throughput (paired, 512^2, batch 1) --------------
    from img2img_turbo_tpu.models import clip_text, clip_vit, discriminator
    from img2img_turbo_tpu.models import vgg_lpips
    from img2img_turbo_tpu.training import losses as losses_mod
    from img2img_turbo_tpu.training import optim, paired

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
    emit(config="finetune_paired_512_b1_step",
         device_s_per_step=round(st["device_span_per_call_s"], 4),
         images_per_s=round(1.0 / st["device_span_per_call_s"], 3))


if __name__ == "__main__":
    main()

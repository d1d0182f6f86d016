"""Unpaired (CycleGAN-Turbo) training CLI — behavior parity with
`accelerate launch src/train_cyclegan_turbo.py`
(train_cyclegan_turbo.py:25-390) plus real RESUME.

Fixed caption embeddings are computed once on host and fed to every step
(the reference then deletes its text encoder, :140-144 — here it simply
never enters the compiled step)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(args):
    from img2img_turbo_tpu import lora as lora_mod
    from img2img_turbo_tpu.models import clip_text
    from img2img_turbo_tpu.parallel import mesh as mesh_mod
    from img2img_turbo_tpu.pipelines.cyclegan import cyclegan_unet_adapters
    from img2img_turbo_tpu.training import (checkpoint as ckpt_mod, data,
                                            losses as losses_mod, optim,
                                            runner, unpaired)

    np.random.seed(args.seed)
    key = jax.random.PRNGKey(args.seed)
    cfgs = runner.generator_configs(args)
    clip_cfg = runner.clip_config(args)

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    unet_p, vae_a2b, text_p, tok = runner.load_base_models(args, cfgs, k1)
    if tok is None:
        tok = runner.SmokeTokenizer(cfgs.text.vocab_size)
    vae_b2a = jax.tree_util.tree_map(jnp.copy, vae_a2b)
    unet_adapters = cyclegan_unet_adapters(unet_p, args.lora_rank_unet, k2)
    vae_spec = lora_mod.LoRASpec(args.lora_rank_vae,
                                 lora_mod.CYCLEGAN_VAE_TARGETS)
    vae_a2b_lora = lora_mod.init_lora(k3, vae_a2b, vae_spec, "vae")
    vae_b2a_lora = lora_mod.init_lora(k3, vae_b2a, vae_spec, "vae")
    gen, frozen, meta = unpaired.split_trainable(
        unet_p, vae_a2b, vae_b2a, unet_adapters, vae_a2b_lora, vae_b2a_lora)
    aux_frozen, disc_heads_a, disc_sn_a = runner.init_aux_models(
        args, k4, clip_cfg, with_clipsim=False)
    # two discriminators (A judges domain-B images, B judges domain-A)
    from img2img_turbo_tpu.models import discriminator as disc_mod
    disc_full_b = disc_mod.init_discriminator(
        k5, clip_cfg, backbone=aux_frozen["disc_backbone"])
    disc = {"a": disc_heads_a, "b": disc_full_b["heads"]}
    disc_sn = {"a": disc_sn_a, "b": disc_full_b["sn"]}

    # dataset + fixed embeddings ------------------------------------------
    dataset = data.UnpairedDataset(args.dataset_folder, "train",
                                   args.train_img_prep, tok)
    loader = data.data_loader(dataset, args.train_batch_size,
                              seed=args.seed)
    loader = data.accumulate_batches(loader,
                                     args.gradient_accumulation_steps)
    loader = data.prefetch(loader, depth=2)
    emb_a2b = clip_text.clip_text_forward(
        text_p, cfgs.text, jnp.asarray(dataset.input_ids_tgt,
                                       jnp.int32)[None])
    emb_b2a = clip_text.clip_text_forward(
        text_p, cfgs.text, jnp.asarray(dataset.input_ids_src,
                                       jnp.int32)[None])

    # optimizers + state ---------------------------------------------------
    total = args.max_train_steps or (args.max_train_epochs * max(
        1, len(dataset) // args.train_batch_size))
    sched = optim.make_lr_schedule(args.lr_scheduler, args.learning_rate,
                                   args.lr_warmup_steps, total,
                                   args.lr_num_cycles, args.lr_power)
    gen_tx = optim.make_adamw(sched, args.adam_beta1, args.adam_beta2,
                              args.adam_epsilon, args.adam_weight_decay,
                              args.max_grad_norm)
    disc_tx = optim.make_adamw(sched, args.adam_beta1, args.adam_beta2,
                               args.adam_epsilon, args.adam_weight_decay,
                               args.max_grad_norm)
    state = {"gen": gen, "gen_opt": gen_tx.init(gen), "disc": disc,
             "disc_sn": disc_sn, "disc_opt": disc_tx.init(disc),
             "step": jnp.zeros((), jnp.int32)}

    state_dir = os.path.join(args.output_dir, "state")
    start_step = 0
    if args.resume:
        latest = ckpt_mod.latest_step(state_dir)
        if latest is not None:
            state = ckpt_mod.restore_train_state(state_dir, state)
            start_step = int(latest)
            print(f"resumed from step {start_step}")

    mesh = mesh_mod.make_mesh(n_model=args.tensor_parallel)
    dp = (mesh.shape[mesh_mod.DATA_AXIS] > 1
          and mesh.shape[mesh_mod.MODEL_AXIS] == 1)
    if mesh.shape[mesh_mod.MODEL_AXIS] > 1:
        # tensor-parallel pjit graphs: XLA's SPMD pass cannot partition
        # Pallas custom calls — trace the pure-XLA layer paths
        from img2img_turbo_tpu.models import layers
        layers.set_fused_kernels(False)
    loss_cfg = losses_mod.UnpairedLossConfig(
        lambda_gan=args.lambda_gan, lambda_idt=args.lambda_idt,
        lambda_cycle=args.lambda_cycle,
        lambda_cycle_lpips=args.lambda_cycle_lpips,
        lambda_idt_lpips=args.lambda_idt_lpips,
        gan_loss_type=args.gan_loss_type)
    raw_step = unpaired.make_unpaired_train_step(
        cfgs, clip_cfg, loss_cfg, meta, gen_tx, disc_tx,
        remat=args.gradient_checkpointing or not args.tiny_model,
        accum_steps=args.gradient_accumulation_steps,
        axis_name=mesh_mod.DATA_AXIS if dp else None)
    # DP runs through shard_map so each shard traces the single-device
    # program (Pallas kernel engine included) on its local batch slice
    step_fn = jax.jit(
        mesh_mod.dp_shard_map(raw_step, mesh) if dp else raw_step,
        donate_argnums=(0,))

    state = mesh_mod.replicate(state, mesh)
    frozen = mesh_mod.replicate(frozen, mesh)
    aux_frozen = mesh_mod.replicate(aux_frozen, mesh)
    log = runner.make_tracker(args.report_to, args.tracker_project_name,
                              args.output_dir, vars(args))
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    adapter_targets = {k: v_spec_targets(v) for k, v in
                       unet_adapters.items()}

    # validation setup: cached reference FID stats + DINO
    # (reference train_cyclegan_turbo.py:89-125)
    import glob as globmod
    from img2img_turbo_tpu.metrics import inception as inc_mod
    from img2img_turbo_tpu.metrics.dino_struct import DinoStructureLoss
    from img2img_turbo_tpu.models import dino as dino_mod
    from img2img_turbo_tpu.pipelines.cyclegan import forward_with_params
    from img2img_turbo_tpu.training import eval_unpaired
    from img2img_turbo_tpu import scheduler as sched_mod

    test_a = sorted(sum((globmod.glob(os.path.join(
        args.dataset_folder, "test_A", e))
        for e in ("*.jpg", "*.jpeg", "*.png", "*.bmp")), []))
    test_b = sorted(sum((globmod.glob(os.path.join(
        args.dataset_folder, "test_B", e))
        for e in ("*.jpg", "*.jpeg", "*.png", "*.bmp")), []))
    eval_ctx = None
    if test_a and test_b:
        val_T = data.build_transform(args.val_img_prep)
        inc_p = runner.init_inception(args, jax.random.PRNGKey(7))
        dino = DinoStructureLoss(
            cfg=dino_mod.TINY_DINO if args.tiny_model else
            dino_mod.DINO_VITB8)
        ref_a2b = eval_unpaired.cache_reference_fid_stats(
            inc_p, test_b, val_T, args.output_dir, "a2b")
        ref_b2a = eval_unpaired.cache_reference_fid_stats(
            inc_p, test_a, val_T, args.output_dir, "b2a")
        alphas = sched_mod.make_alphas_cumprod()
        eval_ctx = dict(val_T=val_T, inc_p=inc_p, dino=dino,
                        ref_a2b=ref_a2b, ref_b2a=ref_b2a, alphas=alphas,
                        fwd=forward_with_params)

    def run_validation(step_now):
        if eval_ctx is None:
            return
        params = unpaired.build_gen_params(
            jax.device_get(state["gen"]), jax.device_get(frozen), meta)

        def make_fwd(direction, emb):
            def f(x):
                e = jnp.broadcast_to(emb, (x.shape[0],) + emb.shape[1:])
                return eval_ctx["fwd"](params, cfgs, eval_ctx["alphas"], x,
                                       e, jax.random.PRNGKey(0), direction)
            return f

        m = {}
        m.update(eval_unpaired.evaluate_direction(
            make_fwd("a2b", emb_a2b), test_a, eval_ctx["val_T"],
            eval_ctx["inc_p"], eval_ctx["ref_a2b"], eval_ctx["dino"],
            args.output_dir, "a2b", step_now,
            max_images=args.validation_num_images))
        m.update(eval_unpaired.evaluate_direction(
            make_fwd("b2a", emb_b2a), test_b, eval_ctx["val_T"],
            eval_ctx["inc_p"], eval_ctx["ref_b2a"], eval_ctx["dino"],
            args.output_dir, "b2a", step_now,
            max_images=args.validation_num_images))
        log(m, step_now)
        print(f"validation @ {step_now}: " +
              " ".join(f"{k}={v:.3f}" for k, v in m.items()))

    import time
    rng = jax.random.PRNGKey(args.seed + 1)
    t_last = time.time()
    for step_i, batch in zip(range(start_step, total), loader):
        bsz = batch["pixel_values_src"].shape[0]
        dev_batch = mesh_mod.shard_batch({
            "pixel_values_src": batch["pixel_values_src"],
            "pixel_values_tgt": batch["pixel_values_tgt"],
            "emb_a2b": np.broadcast_to(
                np.asarray(emb_a2b), (bsz,) + emb_a2b.shape[1:]),
            "emb_b2a": np.broadcast_to(
                np.asarray(emb_b2a), (bsz,) + emb_b2a.shape[1:]),
        }, mesh)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, frozen, aux_frozen, dev_batch, sub)

        if (step_i + 1) % 10 == 0 or step_i == start_step:
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_sec"] = 10.0 / max(time.time() - t_last, 1e-9)
            t_last = time.time()
            log(m, step_i + 1)
            print(f"step {step_i + 1}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in m.items()))

        if (step_i + 1) % args.validation_steps == 0:
            run_validation(step_i + 1)

        if (step_i + 1) % args.viz_freq == 0:
            _save_viz(args.output_dir, step_i + 1, batch, state, frozen,
                      meta, cfgs, emb_a2b, emb_b2a)

        if (step_i + 1) % args.checkpointing_steps == 0:
            ckpt_mod.save_train_state(state_dir, step_i + 1, state)
            ckpt_mod.export_cyclegan_pkl(
                os.path.join(ckpt_dir, f"model_{step_i + 1}.pkl"),
                jax.device_get(state["gen"]), meta, adapter_targets,
                lora_mod.CYCLEGAN_VAE_TARGETS, jax.device_get(frozen))

    ckpt_mod.save_train_state(state_dir, total, state)
    print("training done")


def v_spec_targets(adapter) -> list:
    return sorted(adapter["modules"].keys())


def _save_viz(out_dir, step, batch, state, frozen, meta, cfgs, emb_a2b,
              emb_b2a):
    """Training-viz panels: src | fake | rec for both directions (reference
    logs the same via wandb, train_cyclegan_turbo.py:276-289)."""
    from PIL import Image
    from img2img_turbo_tpu import scheduler as sched_mod
    from img2img_turbo_tpu.pipelines.cyclegan import forward_with_params
    from img2img_turbo_tpu.training import unpaired as unp

    params = unp.build_gen_params(jax.device_get(state["gen"]),
                                  jax.device_get(frozen), meta)
    alphas = sched_mod.make_alphas_cumprod()
    a = jnp.asarray(batch["pixel_values_src"][:1])
    b = jnp.asarray(batch["pixel_values_tgt"][:1])
    ea = jnp.asarray(np.asarray(emb_a2b)[:1])
    eb = jnp.asarray(np.asarray(emb_b2a)[:1])
    rng = jax.random.PRNGKey(0)
    fake_b = forward_with_params(params, cfgs, alphas, a, ea, rng, "a2b")
    rec_a = forward_with_params(params, cfgs, alphas, fake_b, eb, rng, "b2a")
    fake_a = forward_with_params(params, cfgs, alphas, b, eb, rng, "b2a")
    rec_b = forward_with_params(params, cfgs, alphas, fake_a, ea, rng, "a2b")
    row_a = np.concatenate([np.asarray(x)[0] for x in (a, fake_b, rec_a)], 1)
    row_b = np.concatenate([np.asarray(x)[0] for x in (b, fake_a, rec_b)], 1)
    grid = np.concatenate([row_a, row_b], 0)
    u8 = np.clip((grid * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    viz_dir = os.path.join(out_dir, "viz")
    os.makedirs(viz_dir, exist_ok=True)
    Image.fromarray(u8).save(os.path.join(viz_dir, f"step_{step}.png"))


if __name__ == "__main__":
    from img2img_turbo_tpu.utils.config_args import (
        parse_args_unpaired_training)
    main(parse_args_unpaired_training())

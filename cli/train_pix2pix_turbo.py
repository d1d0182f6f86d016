"""Paired (pix2pix-turbo) training CLI — behavior parity with the reference
`accelerate launch src/train_pix2pix_turbo.py` (train_pix2pix_turbo.py:27-307)
plus real checkpoint RESUME (the reference can only restart from step 0).

DP replaces accelerate/NCCL: the batch is sharded over the mesh's data axis
and XLA emits the gradient all-reduces (SURVEY.md §2c).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(args):
    from img2img_turbo_tpu import lora as lora_mod
    from img2img_turbo_tpu.parallel import mesh as mesh_mod
    from img2img_turbo_tpu.training import (checkpoint as ckpt_mod, data,
                                            losses as losses_mod, optim,
                                            paired, runner)

    if args.seed is not None:
        np.random.seed(args.seed)
    key = jax.random.PRNGKey(args.seed or 0)
    cfgs = runner.generator_configs(args)
    clip_cfg = runner.clip_config(args)

    # models --------------------------------------------------------------
    k1, k2, k3, k4 = jax.random.split(key, 4)
    unet_p, vae_p, text_p, tok = runner.load_base_models(args, cfgs, k1)
    if tok is None:
        tok = runner.SmokeTokenizer(cfgs.text.vocab_size)
    unet_lora = lora_mod.init_lora(
        k2, unet_p,
        lora_mod.LoRASpec(args.lora_rank_unet,
                          lora_mod.PIX2PIX_UNET_TARGETS), "unet")
    vae_lora = lora_mod.init_lora(
        k3, vae_p,
        lora_mod.LoRASpec(args.lora_rank_vae, lora_mod.PIX2PIX_VAE_TARGETS),
        "vae")
    gen, frozen, meta = paired.split_trainable(unet_p, vae_p, unet_lora,
                                               vae_lora)
    aux_frozen, disc_heads, disc_sn = runner.init_aux_models(
        args, k4, clip_cfg, with_clipsim=args.lambda_clipsim > 0)
    aux_frozen["text"] = text_p

    # optimizers ----------------------------------------------------------
    sched = optim.make_lr_schedule(args.lr_scheduler, args.learning_rate,
                                   args.lr_warmup_steps,
                                   args.max_train_steps, args.lr_num_cycles,
                                   args.lr_power)
    gen_tx = optim.make_adamw(sched, args.adam_beta1, args.adam_beta2,
                              args.adam_epsilon, args.adam_weight_decay,
                              args.max_grad_norm)
    disc_tx = optim.make_adamw(sched, args.adam_beta1, args.adam_beta2,
                               args.adam_epsilon, args.adam_weight_decay,
                               args.max_grad_norm)
    state = {"gen": gen, "gen_opt": gen_tx.init(gen), "disc": disc_heads,
             "disc_sn": disc_sn, "disc_opt": disc_tx.init(disc_heads),
             "step": jnp.zeros((), jnp.int32)}

    # resume --------------------------------------------------------------
    state_dir = os.path.join(args.output_dir, "state")
    start_step = 0
    if args.resume:
        latest = ckpt_mod.latest_step(state_dir)
        if latest is not None:
            state = ckpt_mod.restore_train_state(state_dir, state)
            start_step = int(latest)
            print(f"resumed from step {start_step}")

    # data ----------------------------------------------------------------
    dataset = data.PairedDataset(args.dataset_folder, "train",
                                 args.train_image_prep, tok)
    loader = data.data_loader(dataset, args.train_batch_size,
                              seed=args.seed or 0)
    loader = data.accumulate_batches(loader,
                                     args.gradient_accumulation_steps)
    loader = data.prefetch(loader, depth=2)
    try:
        val_dataset = data.PairedDataset(args.dataset_folder, "test",
                                         args.test_image_prep, tok)
    except FileNotFoundError:
        val_dataset = None

    # mesh + step ---------------------------------------------------------
    mesh = mesh_mod.make_mesh(n_model=args.tensor_parallel)
    n_data = mesh.shape[mesh_mod.DATA_AXIS]
    dp = n_data > 1 and mesh.shape[mesh_mod.MODEL_AXIS] == 1
    if mesh.shape[mesh_mod.MODEL_AXIS] > 1:
        # tensor-parallel pjit graphs: XLA's SPMD pass cannot partition
        # Pallas custom calls — trace the pure-XLA layer paths
        from img2img_turbo_tpu.models import layers
        layers.set_fused_kernels(False)
    loss_cfg = losses_mod.PairedLossConfig(
        lambda_gan=args.lambda_gan, lambda_lpips=args.lambda_lpips,
        lambda_l2=args.lambda_l2, lambda_clipsim=args.lambda_clipsim,
        gan_loss_type=args.gan_loss_type)
    raw_step = paired.make_paired_train_step(
        cfgs, clip_cfg, loss_cfg, meta, gen_tx, disc_tx,
        remat=args.gradient_checkpointing or not args.tiny_model,
        accum_steps=args.gradient_accumulation_steps,
        axis_name=mesh_mod.DATA_AXIS if dp else None)
    # DP runs through shard_map so each shard traces the single-device
    # program (Pallas kernel engine included) on its local batch slice
    step_fn = jax.jit(
        mesh_mod.dp_shard_map(raw_step, mesh) if dp else raw_step,
        donate_argnums=(0,))
    # eval/viz run on b=1 batches with fully replicated inputs: XLA keeps
    # the un-partitioned program (Pallas calls included) whole on every
    # device, so no shard_map is needed there
    eval_fn = paired.make_eval_step(cfgs, clip_cfg, meta)

    state = mesh_mod.replicate(state, mesh)
    frozen = mesh_mod.replicate(frozen, mesh)
    aux_frozen = mesh_mod.replicate(aux_frozen, mesh)
    log = runner.make_tracker(args.report_to, args.tracker_project_name,
                              args.output_dir, vars(args))
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    # optional clean-FID tracking against test_B (reference
    # train_pix2pix_turbo.py:152-163, 291-296)
    fid_ctx = None
    if args.track_val_fid and val_dataset is not None:
        from PIL import Image
        from img2img_turbo_tpu.metrics import fid as fid_mod
        from img2img_turbo_tpu.metrics import inception as inc_mod
        inc_p = runner.init_inception(args, jax.random.PRNGKey(7))
        refs = []
        for name in val_dataset.img_names:
            img = Image.open(os.path.join(val_dataset.output_folder, name))
            refs.append(np.asarray(val_dataset.T(img).convert("RGB"),
                                   np.uint8))
        ref_feats = fid_mod.features_from_images(inc_p, refs)
        fid_ctx = {"inc": inc_p, "ref_feats": ref_feats, "fid": fid_mod}

    import time
    rng = jax.random.PRNGKey((args.seed or 0) + 1)
    t_last = time.time()
    # --mixed_precision bf16: activations in bf16 (dtype follows the batch
    # through the functional models), fp32 master trainables + fp32 loss
    # accumulation (reference weight_dtype cast, train_pix2pix_turbo.py:126-136)
    cast = (lambda x: x.astype(jnp.bfloat16)) if \
        args.mixed_precision == "bf16" else (lambda x: x)
    for step_i, batch in zip(range(start_step, args.max_train_steps), loader):
        dev_batch = mesh_mod.shard_batch({
            "conditioning_pixel_values": cast(jnp.asarray(
                batch["conditioning_pixel_values"])),
            "output_pixel_values": cast(jnp.asarray(
                batch["output_pixel_values"])),
            "input_ids": batch["input_ids"].astype(np.int32),
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

        if (step_i + 1) % args.checkpointing_steps == 0:
            ckpt_mod.save_train_state(state_dir, step_i + 1, state)
            _export_pkl(ckpt_dir, step_i + 1, state, frozen, args, meta)

        if (step_i + 1) % args.viz_freq == 0:
            _save_viz(args.output_dir, step_i + 1, dev_batch, state, frozen,
                      aux_frozen, eval_fn)

        if val_dataset is not None and (step_i + 1) % args.eval_freq == 0:
            _run_eval(eval_fn, state, frozen, aux_frozen, val_dataset, tok,
                      args, log, step_i + 1, fid_ctx)

    ckpt_mod.save_train_state(state_dir, args.max_train_steps, state)
    _export_pkl(ckpt_dir, args.max_train_steps, state, frozen, args, meta)
    print("training done")


def _export_pkl(ckpt_dir, step, state, frozen, args, meta):
    """Reference pkl schema via the pipeline exporter."""
    from img2img_turbo_tpu import lora as lora_mod
    from img2img_turbo_tpu.pipelines.pix2pix import Pix2PixTurbo
    gen = jax.device_get(state["gen"])
    frozen_h = jax.device_get(frozen)
    unet_base = dict(frozen_h["unet"])
    unet_base["conv_in"] = gen["conv_in"]
    vae_base = dict(frozen_h["vae"])
    vae_base["decoder"] = dict(vae_base["decoder"])
    vae_base["decoder"]["skip_convs"] = gen["skip_convs"]
    pipe = Pix2PixTurbo(
        base={"unet": unet_base, "vae": vae_base},
        lora={"unet": {"rank": meta.rank_unet, "alpha": meta.alpha_unet,
                       "modules": gen["unet_lora"]},
              "vae": {"rank": meta.rank_vae, "alpha": meta.alpha_vae,
                      "modules": gen["vae_lora"]}})
    pipe.save_model(os.path.join(ckpt_dir, f"model_{step}.pkl"))


def _run_eval(eval_fn, state, frozen, aux_frozen, val_dataset, tok, args,
              log, step, fid_ctx=None):
    from img2img_turbo_tpu.training import data
    n = min(args.num_samples_eval, len(val_dataset))
    loader = data.data_loader(val_dataset, 1, shuffle=False, epochs=1,
                              drop_last=False)
    agg = {}
    preds = []
    rng = jax.random.PRNGKey(42)
    for i, batch in enumerate(loader):
        if i >= n:
            break
        rng, sub = jax.random.split(rng)
        pred, m = eval_fn(state["gen"], frozen, aux_frozen, {
            "conditioning_pixel_values": jnp.asarray(
                batch["conditioning_pixel_values"]),
            "output_pixel_values": jnp.asarray(
                batch["output_pixel_values"]),
            "input_ids": jnp.asarray(batch["input_ids"], jnp.int32),
        }, sub)
        for k, v in m.items():
            agg.setdefault(k, []).append(float(v))
        if fid_ctx is not None:
            u8 = np.clip((np.asarray(pred)[0] * 0.5 + 0.5) * 255, 0,
                         255).astype(np.uint8)
            preds.append(u8)
    means = {k: float(np.mean(v)) for k, v in agg.items()}
    if fid_ctx is not None and preds:
        feats = fid_ctx["fid"].features_from_images(fid_ctx["inc"], preds)
        means["val_fid"] = fid_ctx["fid"].fid_from_feats(
            feats, fid_ctx["ref_feats"])
    log(means, step)
    print(f"eval @ {step}: " +
          " ".join(f"{k}={v:.4f}" for k, v in means.items()))


def _save_viz(out_dir, step, dev_batch, state, frozen, aux_frozen,
              eval_fn):
    """input | prediction | target panel (reference wandb image logging,
    train_pix2pix_turbo.py:244-251)."""
    from PIL import Image
    batch1 = {k: jnp.asarray(np.asarray(v)[:1]) for k, v in
              dev_batch.items()}
    pred, _ = eval_fn(state["gen"], frozen, aux_frozen, batch1,
                      jax.random.PRNGKey(0))
    cond = np.asarray(batch1["conditioning_pixel_values"])[0]
    tgt = np.asarray(batch1["output_pixel_values"])[0]
    row = np.concatenate([cond * 2 - 1, np.asarray(pred)[0], tgt], axis=1)
    u8 = np.clip((row * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    viz_dir = os.path.join(out_dir, "viz")
    os.makedirs(viz_dir, exist_ok=True)
    Image.fromarray(u8).save(os.path.join(viz_dir, f"step_{step}.png"))


if __name__ == "__main__":
    from img2img_turbo_tpu.utils.config_args import parse_args_paired_training
    main(parse_args_paired_training())

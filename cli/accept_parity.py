"""LPIPS acceptance harness — THE parity gate vs the PyTorch reference.

The standing acceptance bar (BASELINE.md): LPIPS ≤ 0.05 between this
framework's output and the reference's published output for the same
input (reference README.md:111-126 — assets/examples/bird.png →
bird_canny_blue.png via `--model_name edge_to_image`).

This box has zero network egress and no pretrained weights on disk, so
the real run cannot happen here yet. This harness makes it a ONE-COMMAND
affair the day the weights are available:

  python cli/accept_parity.py \
      --sd_turbo_path /path/to/stabilityai-sd-turbo \
      --model_path /path/to/edge_to_image_loras.pkl \
      --input_image /root/reference/assets/examples/bird.png \
      --prompt "a blue bird" \
      --reference_output /root/reference/assets/examples/bird_canny_blue.png \
      --lpips_weights /path/to/lpips_vgg.pth

Stochastic-path acceptance additionally needs the exact torch noise
(torch.manual_seed + randn is not reproducible from JAX): capture it on
the torch side with `numpy.save` and pass `--stochastic --noise_npy`.

`--tiny_random` runs the identical plumbing end-to-end with random tiny
weights and a synthetic input (tested by tests/test_pipelines.py), so the
command path stays verified between now and the real run.

Prints ONE JSON line: {"lpips": N, "threshold": 0.05, "pass": bool, ...}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

THRESHOLD = 0.05


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--sd_turbo_path", type=str,
                   default=os.environ.get("SD_TURBO_PATH", ""))
    p.add_argument("--model_path", type=str, default="",
                   help="reference pkl checkpoint (pix2pix_turbo.py:221-229 "
                        "schema)")
    p.add_argument("--input_image", type=str, default="")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--reference_output", type=str, default="",
                   help="the reference implementation's saved output image")
    p.add_argument("--lpips_weights", type=str, default="",
                   help="torch lpips VGG state dict (models/vgg_lpips."
                        "load_lpips_weights format); REQUIRED for a real "
                        "acceptance number")
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--gamma", type=float, default=0.4)
    p.add_argument("--noise_npy", type=str, default="",
                   help="(stochastic) torch-captured noise, shape "
                        "(1, 4, H/8, W/8) or (1, H/8, W/8, 4)")
    p.add_argument("--low_threshold", type=int, default=100)
    p.add_argument("--high_threshold", type=int, default=200)
    p.add_argument("--save_output", type=str, default="",
                   help="also save our output image here")
    p.add_argument("--tiny_random", action="store_true",
                   help="plumbing smoke: tiny random models + synthetic "
                        "input; the LPIPS number is meaningless")
    return p


def _lpips_value(lp_params, ours, ref, random_lpips: bool):
    """LPIPS between two (1, H, W, 3) arrays in [-1, 1], fp32."""
    import jax.numpy as jnp
    from img2img_turbo_tpu.models import vgg_lpips
    v = float(vgg_lpips.lpips(lp_params, jnp.asarray(ours, jnp.float32),
                              jnp.asarray(ref, jnp.float32))[0])
    return v


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from img2img_turbo_tpu import configs
    from img2img_turbo_tpu.models import vgg_lpips
    from img2img_turbo_tpu.ops import canny as canny_mod
    from img2img_turbo_tpu.ops import image as image_mod
    from img2img_turbo_tpu.pipelines.pix2pix import (GeneratorConfigs,
                                                     Pix2PixTurbo)

    random_lpips = not args.lpips_weights
    if args.tiny_random:
        cfgs = GeneratorConfigs(unet=configs.TINY_UNET, vae=configs.TINY_VAE,
                                text=configs.TINY_TEXT)
        pipe = Pix2PixTurbo.from_random(jax.random.PRNGKey(0), cfgs)
        pipe.merge()
        rng = np.random.RandomState(0)
        h = w = 64
        c_t = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        caption_enc = jnp.asarray(
            rng.randn(1, 77, cfgs.unet.cross_attention_dim) * 0.1,
            jnp.float32)
        if args.stochastic:
            from img2img_turbo_tpu.models import unet as unet_mod
            pipe_s = Pix2PixTurbo.from_random(jax.random.PRNGKey(0), cfgs)
            pipe_s.base["unet"] = unet_mod.make_twin_conv_in(
                pipe_s.base["unet"])
            noise = jnp.asarray(rng.randn(1, h // 8, w // 8, 4), jnp.float32)
            ours = pipe_s(c_t, caption_enc=caption_enc, deterministic=False,
                          r=args.gamma, noise_map=noise)
        else:
            ours = pipe(c_t, caption_enc=caption_enc)
        # synthetic "reference": a perturbed copy — plumbing only
        ref = np.clip(np.asarray(ours, np.float32)
                      + 0.01 * rng.randn(*ours.shape), -1, 1)
        lp_params = vgg_lpips.init_vgg_lpips(jax.random.PRNGKey(1))
    else:
        for flag in ("sd_turbo_path", "model_path", "input_image", "prompt",
                     "reference_output"):
            if not getattr(args, flag):
                raise SystemExit(f"--{flag} is required (or --tiny_random "
                                 "for the plumbing smoke)")
        pipe = Pix2PixTurbo.from_pretrained(
            args.sd_turbo_path, args.model_path,
            stochastic=args.stochastic, dtype=jnp.bfloat16)
        img = Image.open(args.input_image).convert("RGB")
        new_w = img.width - img.width % 8
        new_h = img.height - img.height % 8
        img = img.resize((new_w, new_h), Image.LANCZOS)
        arr = jnp.asarray(np.asarray(img, np.uint8))[None]
        if args.stochastic:
            unit = image_mod.uint8_to_unit(arr)
            c_t = (unit < 0.5).astype(jnp.bfloat16)
            if not args.noise_npy:
                raise SystemExit(
                    "--stochastic needs --noise_npy (torch-side captured "
                    "noise; torch.manual_seed is not reproducible from JAX)")
            noise = np.load(args.noise_npy)
            if noise.shape[1] == 4:        # NCHW -> NHWC
                noise = noise.transpose(0, 2, 3, 1)
            ours = pipe(c_t, prompt=args.prompt, deterministic=False,
                        r=args.gamma,
                        noise_map=jnp.asarray(noise, jnp.bfloat16))
        else:
            c_t = canny_mod.canny_3ch_unit(arr, float(args.low_threshold),
                                           float(args.high_threshold))
            ours = pipe(c_t.astype(jnp.bfloat16), prompt=args.prompt)
        ref_img = Image.open(args.reference_output).convert("RGB")
        if ref_img.size != (new_w, new_h):
            ref_img = ref_img.resize((new_w, new_h), Image.LANCZOS)
        ref = np.asarray(ref_img, np.float32)[None] / 127.5 - 1.0
        if args.lpips_weights:
            lp_params = vgg_lpips.load_lpips_weights(args.lpips_weights)
        else:
            lp_params = vgg_lpips.init_vgg_lpips(jax.random.PRNGKey(1))

    if args.save_output:
        out_u8 = np.asarray(image_mod.signed_to_uint8(
            jnp.asarray(ours)))[0]
        Image.fromarray(out_u8).save(args.save_output)

    val = _lpips_value(lp_params, np.asarray(ours, np.float32), ref,
                       random_lpips)
    result = {
        "lpips": round(val, 5),
        "threshold": THRESHOLD,
        "pass": bool(val <= THRESHOLD),
        "mode": "stochastic" if args.stochastic else "deterministic",
        "lpips_weights": ("RANDOM (plumbing only — number is meaningless)"
                          if random_lpips else args.lpips_weights),
        "plumbing_only": bool(args.tiny_random or random_lpips),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(build_parser().parse_args())

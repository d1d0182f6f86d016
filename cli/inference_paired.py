"""Paired inference CLI — flag parity with the reference
(src/inference_paired.py:11-75).

Differences forced by the TPU environment:
- --sd_turbo_path points at a local HF sd-turbo snapshot (no hub egress);
- --model_name resolves to <ckpt_folder>/<name>.pkl and errors with the
  reference download URL if absent (this box has no network);
- --use_fp16 maps to bfloat16 (the TPU half-precision; fp16 is a CUDA-ism).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


NAMED_CKPTS = {
    "edge_to_image": "edge_to_image_loras.pkl",
    "sketch_to_image_stochastic": "sketch_to_image_stochastic_lora.pkl",
}
DOWNLOAD_BASE = "https://www.cs.cmu.edu/~img2img-turbo/models/"


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input_image", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--model_name", type=str, default="")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--low_threshold", type=int, default=100)
    p.add_argument("--high_threshold", type=int, default=200)
    p.add_argument("--gamma", type=float, default=0.4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use_fp16", action="store_true")
    p.add_argument("--sd_turbo_path", type=str,
                   default=os.environ.get("SD_TURBO_PATH", ""),
                   help="local HF stabilityai/sd-turbo snapshot directory")
    p.add_argument("--ckpt_folder", type=str, default="checkpoints")
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from img2img_turbo_tpu.ops import canny as canny_mod
    from img2img_turbo_tpu.ops import image as image_mod
    from img2img_turbo_tpu.pipelines.pix2pix import Pix2PixTurbo

    # exactly one of model_name / model_path (reference :26-30)
    if (args.model_name == "") == (args.model_path == ""):
        raise SystemExit(
            "Either model_name or model_path should be provided, not both")
    if not args.sd_turbo_path:
        raise SystemExit("--sd_turbo_path (or $SD_TURBO_PATH) is required: "
                         "path to a local stabilityai/sd-turbo snapshot")

    ckpt_path = args.model_path
    if args.model_name:
        fname = NAMED_CKPTS.get(args.model_name)
        if fname is None:
            raise SystemExit(f"unknown model_name {args.model_name!r}; "
                             f"choose from {sorted(NAMED_CKPTS)}")
        ckpt_path = os.path.join(args.ckpt_folder, fname)
        if not os.path.exists(ckpt_path):
            raise SystemExit(
                f"checkpoint {ckpt_path} not found; this machine has no "
                f"network — download {DOWNLOAD_BASE}{fname} elsewhere and "
                f"place it there")

    stochastic = args.model_name == "sketch_to_image_stochastic"
    dtype = jnp.bfloat16 if args.use_fp16 else jnp.float32
    pipe = Pix2PixTurbo.from_pretrained(args.sd_turbo_path, ckpt_path,
                                        stochastic=stochastic, dtype=dtype)

    # load + crop to x8 (reference :38-41)
    img = Image.open(args.input_image).convert("RGB")
    new_w, new_h = img.width - img.width % 8, img.height - img.height % 8
    img = img.resize((new_w, new_h), Image.LANCZOS)
    arr = jnp.asarray(np.asarray(img, np.uint8))[None]

    rng = jax.random.PRNGKey(args.seed)
    if args.model_name == "edge_to_image":
        c_t = canny_mod.canny_3ch_unit(arr, float(args.low_threshold),
                                       float(args.high_threshold))
        out = pipe(c_t.astype(dtype), prompt=args.prompt, rng=rng)
    elif stochastic:
        # sketch: threshold < 0.5 becomes 1 (reference :55-58)
        unit = image_mod.uint8_to_unit(arr)
        c_t = (unit < 0.5).astype(dtype)
        noise = jax.random.normal(
            rng, (1, new_h // 8, new_w // 8, 4), dtype)
        out = pipe(c_t, prompt=args.prompt, rng=rng, deterministic=False,
                   r=args.gamma, noise_map=noise)
    else:
        unit = image_mod.uint8_to_unit(arr).astype(dtype)
        out = pipe(unit, prompt=args.prompt, rng=rng)

    os.makedirs(args.output_dir, exist_ok=True)
    out_u8 = np.asarray(image_mod.signed_to_uint8(out))[0]
    bname = os.path.basename(args.input_image)
    out_path = os.path.join(args.output_dir, bname)
    Image.fromarray(out_u8).save(out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(build_parser().parse_args())

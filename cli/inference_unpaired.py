"""Unpaired (CycleGAN-Turbo) inference CLI — flag parity with the reference
(src/inference_unpaired.py:10-58). Local-weights variant: --sd_turbo_path
replaces hub access; --model_name resolves to <ckpt_folder>/<file>.pkl."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


DOWNLOAD_BASE = "https://www.cs.cmu.edu/~img2img-turbo/models/"


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--input_image", type=str, required=True)
    p.add_argument("--prompt", type=str, default=None,
                   help="required when using a custom model_path")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--ckpt_folder", type=str, default="checkpoints")
    p.add_argument("--direction", type=str, default=None,
                   help="a2b or b2a; required with model_path")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--image_prep", type=str, default="resize_512x512")
    p.add_argument("--use_fp16", action="store_true")
    p.add_argument("--sd_turbo_path", type=str,
                   default=os.environ.get("SD_TURBO_PATH", ""))
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from img2img_turbo_tpu.ops import image as image_mod
    from img2img_turbo_tpu.pipelines.cyclegan import (NAMED_MODELS,
                                                      CycleGANTurbo)
    from img2img_turbo_tpu.training.data import build_transform

    # validation mirrors reference :22-27
    if (args.model_name is None) == (args.model_path is None):
        raise SystemExit(
            "Either model_name or model_path should be provided, not both")
    if args.model_path is not None and args.prompt is None:
        raise SystemExit("prompt is required when loading a custom model_path")
    if args.model_name is not None and args.prompt is not None:
        raise SystemExit("prompt is not required when loading a named model")
    if not args.sd_turbo_path:
        raise SystemExit("--sd_turbo_path (or $SD_TURBO_PATH) is required")

    caption, direction = args.prompt, args.direction
    if args.model_name is not None:
        if args.model_name not in NAMED_MODELS:
            raise SystemExit(f"unknown model_name {args.model_name!r}; "
                             f"choose from {sorted(NAMED_MODELS)}")
        fname, caption, direction = NAMED_MODELS[args.model_name]
        ckpt_path = os.path.join(args.ckpt_folder, fname)
        if not os.path.exists(ckpt_path):
            raise SystemExit(
                f"checkpoint {ckpt_path} not found; download "
                f"{DOWNLOAD_BASE}{fname} elsewhere and place it there")
    else:
        ckpt_path = args.model_path

    dtype = jnp.bfloat16 if args.use_fp16 else jnp.float32
    pipe = CycleGANTurbo.from_pretrained(args.sd_turbo_path, ckpt_path,
                                         caption=caption,
                                         direction=direction, dtype=dtype)

    img = Image.open(args.input_image).convert("RGB")
    orig_size = img.size
    T = build_transform(args.image_prep)
    arr = np.asarray(T(img), np.float32) / 127.5 - 1.0
    out = pipe(jnp.asarray(arr)[None].astype(dtype))
    out_u8 = np.asarray(image_mod.signed_to_uint8(out))[0]
    out_pil = Image.fromarray(out_u8).resize(orig_size, Image.LANCZOS)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir,
                            os.path.basename(args.input_image))
    out_pil.save(out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(build_parser().parse_args())

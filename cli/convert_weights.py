"""Convert HF sd-turbo safetensors (+ optional img2img-turbo pkl) into this
framework's native checkpoint (orbax), with LoRA pre-merged for serving.

Usage:
  python cli/convert_weights.py --sd_turbo_path /path/sd-turbo \
      [--ckpt_path edge_to_image_loras.pkl [--stochastic]] \
      --out /path/native_ckpt

The native checkpoint loads ~10x faster than re-converting safetensors and
is the deployment artifact for ServingEngine.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd_turbo_path", required=True)
    ap.add_argument("--ckpt_path", default=None,
                    help="reference pkl (or published model name)")
    ap.add_argument("--stochastic", action="store_true",
                    help="keep LoRA factored + TwinConv (sketch model)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    from img2img_turbo_tpu.pipelines.pix2pix import Pix2PixTurbo

    pipe = Pix2PixTurbo.from_pretrained(args.sd_turbo_path, args.ckpt_path,
                                        stochastic=args.stochastic)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    payload = {}
    if pipe.params is not None:
        payload["params"] = pipe.params
    if pipe.base is not None:
        payload["base"] = pipe.base
        payload["lora"] = pipe.lora
    payload["text"] = pipe.text_params
    ckptr.save(os.path.abspath(args.out), payload)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(payload))
    print(f"saved native checkpoint to {args.out} ({n / 1e6:.0f}M params)")


if __name__ == "__main__":
    main()

"""Lean e2e device-time probe: the 512^2 b1 primary (and optionally b8)
on the current env (FM_DISABLE / FM_SITES / FC_* knobs read at trace time)
— the cheap arbiter for in-graph engine A/Bs without the full bench.

Usage: python scripts/bench_e2e_quick.py [--b8] [--height H --width W]
Prints one JSON line: {"e2e_s": ..., "windows": [...], "env": {...}}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b8", action="store_true")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from bench import _make_engine, _fetch_probe, _measured

    engine, cfgs = _make_engine(jnp.bfloat16)
    rng = np.random.RandomState(0)
    bsz = 8 if args.b8 else 1
    img = jnp.asarray(rng.randint(
        0, 255, (bsz, args.height, args.width, 3)).astype(np.uint8))
    ctx = jnp.zeros((bsz, 77, cfgs.unet.cross_attention_dim), jnp.bfloat16)
    noop = jax.jit(lambda x: x[0, 0, 0, :1] + 1)
    _ = np.asarray(noop(img))  # warm first-fetch

    def probe():
        return _fetch_probe(noop, img)

    errors = []
    v, diag = _measured(lambda im, c: engine(im, c), (img, ctx),
                        iters=args.iters, windows=args.windows,
                        probe=probe, errors=errors, tag="e2e")
    out = {"e2e_s": None if v is None else round(v, 5),
           "shape": list(img.shape), "diag": diag,
           "env": {k: os.environ[k] for k in sorted(os.environ)
                   if k.startswith(("FM_", "FC_"))}}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()

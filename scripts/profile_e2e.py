"""Per-op device-time breakdown of the serving path (real TPU).

Aggregates the XLA profiler's device-track events by op name so perf work
targets the real hot spots instead of guesses. Usage:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_e2e.py \
      [--batch 1] [--size 512] [--iters 5] [--top 40]

Prints a table: total device ms per op-name bucket (Pallas kernels keep
their kernel names; XLA fusions bucket by fusion root).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def collect(fn, args, iters):
    trace_dir = tempfile.mkdtemp(prefix="jax_prof_")
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    jax.profiler.stop_trace()
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        data = json.load(fh)
    device_pids = {
        e["pid"] for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and ("TPU" in e["args"].get("name", "")
             or "/device" in e["args"].get("name", ""))}
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in device_pids]
    return evs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--height", type=int, default=0,
                    help="non-square input H (0 -> --size)")
    ap.add_argument("--width", type=int, default=0,
                    help="non-square input W (0 -> --size), e.g. 560x840 "
                         "for the bird.png x8-crop serving shape")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    args.height = args.height or args.size
    args.width = args.width or args.size

    from img2img_turbo_tpu.pipelines.pix2pix import GeneratorConfigs
    from img2img_turbo_tpu.serving.engine import ServingEngine
    from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod

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
    ctx = jnp.zeros((args.batch, 77, cfgs.unet.cross_attention_dim), dtype)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(
        0, 255, (args.batch, args.height, args.width, 3)).astype(np.uint8))

    evs = collect(lambda im, c: engine(im, c), (img, ctx), args.iters)
    span = (max(e["ts"] + e["dur"] for e in evs)
            - min(e["ts"] for e in evs)) / 1e3 / args.iters
    # drop whole-program parent events (they cover the full span)
    import re
    ops = [e for e in evs if not e.get("name", "").startswith("jit_")]
    total = sum(e["dur"] for e in ops) / 1e3 / args.iters
    buckets = collections.Counter()
    counts = collections.Counter()
    groups = collections.Counter()
    for e in ops:
        name = e.get("name", "?")
        buckets[name] += e["dur"] / 1e3 / args.iters
        counts[name] += 1
        g = re.sub(r"[.\d]+$", "", name)
        groups[g] += e["dur"] / 1e3 / args.iters
    print(f"batch={args.batch} size={args.height}x{args.width} "
          f"iters={args.iters}")
    print(f"device span/call: {span:.3f} ms   op busy/call: {total:.3f} ms")
    print("\n-- by kernel family --")
    for name, ms in groups.most_common(30):
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}%  {name[:90]}")
    print(f"\n-- top individual ops --\n{'ms/call':>9}  {'%':>5}  {'n':>4}  name")
    for name, ms in buckets.most_common(args.top):
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  "
              f"{counts[name] // args.iters:4d}  {name[:110]}")


if __name__ == "__main__":
    main()

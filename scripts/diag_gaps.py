"""Intra-module gap analysis of the serving graph on the real chip.

BENCH r5 baseline: the 512^2 engine module executes in 50.8 ms (module
event p50) while its op events sum to ~39.8 ms — ~11 ms/call of device
time sits in GAPS between op events. This script locates them: it takes
one profiled engine run, sorts the device op events inside the largest
module execution window, and prints every gap > threshold with the ops on
both sides, plus a gap histogram and the busiest op buckets.

Usage: python scripts/diag_gaps.py [--batch 1] [--size 512] [--gap-us 100]
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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gap-us", type=float, default=100.0)
    ap.add_argument("--detail", default=None,
                    help="op-name prefix: print its per-event durations "
                         "clustered to 10us within the module window")
    args = ap.parse_args()

    from bench import _make_engine

    h = args.height or args.size
    w = args.width or args.size
    engine, cfgs = _make_engine(jnp.bfloat16)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (args.batch, h, w, 3))
                      .astype(np.uint8))
    ctx = jnp.zeros((args.batch, 77, cfgs.unet.cross_attention_dim),
                    jnp.bfloat16)

    trace_dir = tempfile.mkdtemp(prefix="jax_gaps_")
    out = engine(img, ctx)
    jax.block_until_ready(out)
    _ = np.asarray(out[(0, 0, 0, 0)])  # warm first-fetch path
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        out = engine(img, ctx)
    jax.block_until_ready(out)
    _ = np.asarray(out[(0, 0, 0, 0)])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        data = json.load(fh)
    device_pids = {
        e["pid"] for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and ("TPU" in e["args"].get("name", "")
             or "/device" in e["args"].get("name", ""))}
    mod_tids = {
        (e["pid"], e.get("tid"))
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") in device_pids
        and "XLA Modules" in e.get("args", {}).get("name", "")}
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in device_pids]
    mods = [e for e in evs if (e["pid"], e.get("tid")) in mod_tids]
    ops = [e for e in evs if (e["pid"], e.get("tid")) not in mod_tids]
    if not mods:
        # fall back: treat the largest repeated event as the module
        print("no XLA Modules thread; threads seen:")
        for e in data["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "thread_name" \
                    and e.get("pid") in device_pids:
                print("  ", e.get("pid"), e.get("tid"),
                      e["args"].get("name"))
        mods = sorted(evs, key=lambda e: -e["dur"])[:args.iters]
    # the engine call dispatches several modules (threefry seeds etc.);
    # analyze the DOMINANT one: group by name, keep the name with the
    # largest total duration, then take its median execution (skip the
    # first: cold effects)
    by_mod = collections.defaultdict(list)
    for e in mods:
        by_mod[e["name"]].append(e)
    main_name = max(by_mod, key=lambda n: sum(e["dur"] for e in by_mod[n]))
    mods = sorted(by_mod[main_name], key=lambda e: e["ts"])
    m = sorted(mods[1:] or mods, key=lambda e: e["dur"])[len(mods[1:]) // 2]
    t0, t1 = m["ts"], m["ts"] + m["dur"]
    print(f"module '{m['name'][:80]}' dur {m['dur'] / 1e3:.2f} ms "
          f"({len(mods)} execs)")
    inside = sorted((e for e in ops if t0 <= e["ts"] < t1),
                    key=lambda e: e["ts"])
    busy = sum(e["dur"] for e in inside)
    print(f"  {len(inside)} op events, busy {busy / 1e3:.2f} ms, "
          f"gap total {(m['dur'] - busy) / 1e3:.2f} ms")
    # top op buckets
    buckets = collections.defaultdict(float)
    counts = collections.Counter()
    for e in inside:
        name = e["name"].split(".")[0]
        buckets[name] += e["dur"]
        counts[name] += 1
    print("  top buckets (ms, count):")
    for name, d in sorted(buckets.items(), key=lambda kv: -kv[1])[:15]:
        print(f"    {d / 1e3:8.2f}  {counts[name]:4d}  {name[:70]}")
    if args.detail:
        durs = sorted(e["dur"] for e in inside
                      if e["name"].startswith(args.detail))
        clusters = collections.Counter(round(d / 10) * 10 for d in durs)
        print(f"  {args.detail}: {len(durs)} events, "
              f"total {sum(durs) / 1e3:.2f} ms")
        for d, n in sorted(clusters.items(), key=lambda kv: -kv[0] * kv[1]):
            print(f"    {n:3d} x {d / 1e3:8.3f} ms = "
                  f"{n * d / 1e3:8.2f} ms")
    # gaps
    gaps = []
    cur = t0
    prev_name = "<module start>"
    for e in inside:
        if e["ts"] > cur + args.gap_us:
            gaps.append((cur, e["ts"] - cur, prev_name, e["name"]))
        cur = max(cur, e["ts"] + e["dur"])
        prev_name = e["name"]
    if t1 > cur + args.gap_us:
        gaps.append((cur, t1 - cur, prev_name, "<module end>"))
    gaps.sort(key=lambda g: -g[1])
    print(f"  gaps > {args.gap_us} us: {len(gaps)}, "
          f"total {sum(g[1] for g in gaps) / 1e3:.2f} ms")
    for ts, dur, a, b in gaps[:25]:
        print(f"    {dur / 1e3:8.3f} ms after {a[:48]:48s} -> {b[:48]}")


if __name__ == "__main__":
    main()

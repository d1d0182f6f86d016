"""Per-bucket device profile of the paired 4-pass train step (bench config).

VERDICT r4 item 6: the train step has been ~0.45 s since round 1 while the
forward got a kernel engine — this locates where the step's device time
actually goes (op buckets + module/gap split, same basis as diag_gaps.py).

Usage: python scripts/profile_train.py [--iters 3] [--gap-us 200]
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

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gap-us", type=float, default=200.0)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import bench

    # Reuse bench's exact train-step graph; _measured is bypassed — we
    # want the raw trace, so monkey-free: rebuild via the private helper.
    probe_calls = []

    def fake_probe():
        probe_calls.append(1)
        return 0.0

    # _train_step_device_time builds state+step then calls _measured; to
    # profile instead, duplicate its tail here via a tiny shim.
    trace_dir = tempfile.mkdtemp(prefix="jax_train_prof_")
    orig_measured = bench._measured
    holder = {}

    def capture(fn, fargs, iters, windows, probe, errors, tag):
        holder["fn"], holder["args"] = fn, fargs
        return None, None

    bench._measured = capture
    bench._train_step_device_time(windows=1, probe=None, errors=[])
    bench._measured = orig_measured
    fn, fargs = holder["fn"], holder["args"]

    out = fn(*fargs)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm fetch path
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        out = fn(*fargs)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
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
    by_mod = collections.defaultdict(list)
    for e in mods:
        by_mod[e["name"]].append(e)
    if not by_mod:
        print("no module events; op total "
              f"{sum(e['dur'] for e in ops) / 1e3:.2f} ms")
        return
    main_name = max(by_mod, key=lambda n: sum(e["dur"] for e in by_mod[n]))
    execs = sorted(by_mod[main_name], key=lambda e: e["ts"])
    m = sorted(execs[1:] or execs, key=lambda e: e["dur"])[
        len(execs[1:]) // 2]
    t0, t1 = m["ts"], m["ts"] + m["dur"]
    print(f"module '{m['name'][:70]}' p50 {m['dur'] / 1e3:.2f} ms "
          f"({len(execs)} execs)")
    inside = sorted((e for e in ops if t0 <= e["ts"] < t1),
                    key=lambda e: e["ts"])
    busy = sum(e["dur"] for e in inside)
    print(f"  {len(inside)} op events, busy {busy / 1e3:.2f} ms, gap "
          f"{(m['dur'] - busy) / 1e3:.2f} ms")
    buckets = collections.defaultdict(float)
    counts = collections.Counter()
    for e in inside:
        name = e["name"].split(".")[0]
        buckets[name] += e["dur"]
        counts[name] += 1
    print("  top buckets (ms, count):")
    for name, d in sorted(buckets.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"    {d / 1e3:8.2f}  {counts[name]:4d}  {name[:70]}")
    gaps = []
    cur = t0
    prev = "<start>"
    for e in inside:
        if e["ts"] > cur + args.gap_us:
            gaps.append((e["ts"] - cur, prev, e["name"]))
        cur = max(cur, e["ts"] + e["dur"])
        prev = e["name"]
    gaps.sort(key=lambda g: -g[0])
    print(f"  gaps > {args.gap_us} us: {len(gaps)}, total "
          f"{sum(g[0] for g in gaps) / 1e3:.2f} ms")
    for dur, a, b in gaps[:15]:
        print(f"    {dur / 1e3:8.3f} ms after {a[:44]:44s} -> {b[:44]}")


if __name__ == "__main__":
    main()

"""Sweep the fused-conv VMEM budgets on the real TPU.

Runs scripts/bench_fused_conv.py in subprocesses (one per config x shape
batch — the remote compile tunnel gets flaky when many big compiles pile
into one process) with FC_*_MB env overrides, and tabulates device time.

Usage: python scripts/sweep_fused_budgets.py [config ...]
where config is "xbuf/w/total/vmem" in MB, e.g. 24/40/80/96.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    "6/5/13/16",      # round-2 tuned defaults (16MB scoped limit)
    "12/10/28/32",
    "24/40/80/96",
    "32/48/100/120",
]

SHAPE_SETS = [[5, 3], [1, 0], [8, 10]]  # paired to bound compiles/process


def run(cfg: str, shapes):
    xb, wb, tb, vb = cfg.split("/")
    env = dict(os.environ)
    env.update({
        "FC_XBUF_MB": xb, "FC_W_MB": wb, "FC_TOTAL_MB": tb,
        "FC_VMEM_MB": vb,
        "PYTHONPATH": f"/root/.axon_site:{REPO}",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jaxcache",
    })
    cmd = ["python", os.path.join(REPO, "scripts", "bench_fused_conv.py"),
           *map(str, shapes)]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=2400)
    out = p.stdout + p.stderr
    rows = []
    for m in re.finditer(
            r"\[(\d+)\].*?(OK|FAIL|UNSUPPORTED)(?:\n\s*fused\s+([\d.]+) us"
            r"\s+([\d.]+) TF/s)?", out):
        rows.append((int(m.group(1)), m.group(2), m.group(3), m.group(4)))
    if not rows:
        print(f"  !! no output (rc={p.returncode}): {out[-500:]}")
    return rows


def main():
    configs = sys.argv[1:] or CONFIGS
    results = {}
    for cfg in configs:
        print(f"== config {cfg} ==", flush=True)
        for shapes in SHAPE_SETS:
            for idx, status, us, tfs in run(cfg, shapes):
                results[(cfg, idx)] = (status, us, tfs)
                print(f"  [{idx}] {status} {us or '-'} us {tfs or '-'} TF/s",
                      flush=True)
    print("\n== summary (us; rows=shape, cols=config) ==")
    shape_ids = sorted({k[1] for k in results})
    print("shape | " + " | ".join(f"{c:>16s}" for c in configs))
    for i in shape_ids:
        cells = []
        for c in configs:
            st, us, tfs = results.get((c, i), ("-", None, None))
            cells.append(f"{us or st:>9s} {tfs or '':>6s}")
        print(f"{i:5d} | " + " | ".join(cells))


if __name__ == "__main__":
    main()

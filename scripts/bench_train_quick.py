"""Lean train-step device-time probe on the current env (FM_* / FC_*
knobs read at trace time) — the in-graph arbiter for the training path
(VERDICT r4 item 4/6) without paying the full bench.

Usage: python scripts/bench_train_quick.py [--windows N]
Prints one JSON line: {"train_step_s": ..., "diag": ..., "env": {...}}.
"""

import argparse
import json
import os
import sys

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
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from bench import _train_step_device_time, _fetch_probe

    noop = jax.jit(lambda x: x + 1)
    arg = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(noop(arg))  # warm first-fetch (rig pathology)

    def probe():
        return _fetch_probe(noop, arg)

    errors = []
    v, diag = _train_step_device_time(windows=args.windows, probe=probe,
                                      errors=errors)
    out = {"train_step_s": None if v is None else round(v, 5),
           "diag": diag,
           "env": {k: os.environ[k] for k in sorted(os.environ)
                   if k.startswith(("FM_", "FC_"))}}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()

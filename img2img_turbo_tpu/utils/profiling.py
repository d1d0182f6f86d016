"""Tracing / profiling hooks (the reference has none — SURVEY.md §5).

- `trace(dir)` context manager wraps jax.profiler for TensorBoard traces.
- `StepTimer` tracks step time / images-per-sec with warmup discard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "step_time_p50_s": float(np.percentile(t, 50)),
            "step_time_p90_s": float(np.percentile(t, 90)),
            "steps_per_sec": float(1.0 / t.mean()),
            "images_per_sec": float(batch_size / t.mean()),
        }


def device_time_per_call(fn, args, iters: int = 10,
                         trace_dir: Optional[str] = None) -> Dict[str, float]:
    """True on-device execution time per call, measured from a profiler
    trace (the span of the device track divided by iters).

    Needed because wall-clock on relay-attached test rigs includes a large
    fixed host<->device tunnel latency (~tens of ms on this box's axon
    loopback) that does not exist on production TPU hosts.
    """
    import collections
    import glob
    import gzip
    import json
    import tempfile

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jax_devtime_")
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    try:
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    except Exception:
        pass
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {}
    with gzip.open(sorted(files)[-1], "rt") as fh:
        data = json.load(fh)
    device_pids = {
        e["pid"] for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and ("TPU" in e["args"].get("name", "")
             or "/device" in e["args"].get("name", ""))}
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in device_pids]
    if not evs:
        return {}
    span = (max(e["ts"] + e["dur"] for e in evs)
            - min(e["ts"] for e in evs)) / 1e6
    busy = sum(e["dur"] for e in evs) / 1e6
    return {"device_span_per_call_s": span / iters,
            "device_busy_total_s": busy,
            "iters": iters}


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (empty on backends without the API)."""
    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gib": ms.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gib": ms.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:
            pass
    return out

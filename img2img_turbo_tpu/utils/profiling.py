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
    trace.

    Needed because wall-clock on relay-attached test rigs includes a large
    fixed host<->device tunnel latency (~tens of ms on this box's axon
    loopback) that does not exist on production TPU hosts.

    Two estimators come back:
    - `device_p50_per_call_s` (preferred): the median duration of the
      top-level XLA-module execution events on the device track — one
      event per call, so dispatch gaps BETWEEN iterations (tunnel
      round-trips, host hiccups) cannot inflate it. BENCH_r04's 29%
      driver-vs-journal spread is exactly the failure mode this kills:
      span/iters charges inter-call idle time to the kernel.
    - `device_span_per_call_s` (legacy): device-track span / iters. Kept
      for continuity and as the fallback when module events can't be
      identified (equals the p50 basis on an idle tunnel).
    """
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
        # block_until_ready can return before device completion on the axon
        # relay; a host fetch is the only true sync. Fetch ONE element (not
        # the full output) — the round trip is the sync, the payload is not.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
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
    result = {"device_span_per_call_s": span / iters,
              "device_busy_total_s": busy,
              "iters": iters}
    # Module-level per-call durations. Preferred source: the device pid's
    # "XLA Modules" thread (one event per executable run). If a call
    # dispatches several modules, each name's median sums into the
    # per-call time. Fallback heuristic when the thread isn't labeled:
    # group ALL device events by name, keep names repeating >= iters
    # times, take the one with the largest median (op rows repeat too but
    # are strictly shorter than their enclosing module row).
    mod_tids = {
        (e["pid"], e.get("tid"))
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") in device_pids
        and "XLA Modules" in e.get("args", {}).get("name", "")}
    mod_evs = [e for e in evs if (e["pid"], e.get("tid")) in mod_tids]
    by_name: Dict[str, list] = {}
    for e in (mod_evs if mod_evs else evs):
        by_name.setdefault(e["name"], []).append(e["dur"])
    if mod_evs:
        # a module dispatched k times per call contributes k * median;
        # one-off events (donation copies, consts) have count < iters and
        # are excluded — they are not steady-state per-call work
        per_call = 0.0
        p90 = 0.0
        used = []
        for name, durs in sorted(by_name.items()):
            k = int(round(len(durs) / iters))
            if k < 1:
                continue
            arr = np.asarray(durs, np.float64) / 1e6
            per_call += k * float(np.percentile(arr, 50))
            p90 += k * float(np.percentile(arr, 90))
            used.append(name)
        if used:
            result["device_p50_per_call_s"] = per_call
            result["device_p90_per_call_s"] = p90
            result["module_event"] = ",".join(used)
    else:
        cands = {n: d for n, d in by_name.items() if len(d) >= iters}
        if cands:
            name = max(cands, key=lambda n: float(np.median(cands[n])))
            durs = np.asarray(sorted(cands[name])[-iters:],
                              np.float64) / 1e6
            result["device_p50_per_call_s"] = float(np.percentile(durs, 50))
            result["device_p90_per_call_s"] = float(np.percentile(durs, 90))
            result["module_event"] = name
    return result


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

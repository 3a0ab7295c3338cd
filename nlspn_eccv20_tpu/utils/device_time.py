"""Device-side timing via the JAX profiler.

On this TPU attachment, ``jax.block_until_ready`` returns before device
execution completes (the PJRT tunnel acknowledges early), so wall-clock
timing measures dispatch overhead, not compute. The profiler's XPlane
trace, however, records true on-device executable durations (validated:
an 8192^3 bf16 matmul shows ~5.9 ms = ~187 TFLOP/s, v5e peak). This
module runs a callable under a short trace and extracts the per-call
device duration of its compiled executable.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from typing import Callable, List, Optional

import jax


def _trace_events(trace_dir: str) -> List[dict]:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    events: List[dict] = []
    for p in paths:
        with gzip.open(p) as f:
            events.extend(json.load(f).get("traceEvents", []))
    return [e for e in events if e.get("ph") == "X" and "dur" in e]


def device_durations_us(fn: Callable, *args, calls: int = 8,
                        warmup: int = 2) -> List[float]:
    """Run ``fn(*args)`` under a profiler trace; return per-call device
    durations (us) of the dominant jitted executable.

    ``fn`` should chain its own state if steps depend on each other; calls
    here are issued back-to-back and the device queue serializes them.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    with tempfile.TemporaryDirectory(prefix="devtime_") as td:
        jax.profiler.start_trace(td)
        for _ in range(calls):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        events = _trace_events(td)

    # Group device-side executable events ("jit_<name>(fingerprint)") and
    # pick the name with the largest total duration — the workload under
    # test. Host-side python events are named differently (PjitFunction,
    # $file:line) and never match the jit_ prefix.
    groups: dict = {}
    for e in events:
        name = e.get("name", "")
        if name.startswith("jit_"):
            groups.setdefault(name.split("(")[0], []).append(float(e["dur"]))
    if not groups:
        return []
    durs = max(groups.values(), key=sum)
    durs.sort()
    # one event per execution; drop obvious outliers by using the middle
    return durs


def median_device_time_s(fn: Callable, *args, calls: int = 8,
                         warmup: int = 2) -> Optional[float]:
    """Median per-call device time in seconds, or None off-TPU/no events."""
    durs = device_durations_us(fn, *args, calls=calls, warmup=warmup)
    if not durs:
        return None
    return durs[len(durs) // 2] / 1e6

"""Tracing & profiling (aux subsystem, SURVEY.md §5).

The reference has no profiler — only tqdm postfix text (train.py:341-347).
Here: ``jax.profiler`` device traces on demand, a host-side step timer with
percentile summaries, and an HBM snapshot helper.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir, enabled: bool = True):
    """Capture a jax.profiler trace (viewable in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    try:
        with jax.profiler.trace(str(log_dir)):
            yield
    except Exception as e:  # some backends (tunneled) cannot trace
        print(f"profiler trace unavailable: {e}")
        yield


class StepTimer:
    """Wall-clock per-step timing with percentile summaries.

    Call ``tick()`` once per step *after* forcing device completion (a
    scalar readback — ``block_until_ready`` is unreliable through relayed
    backends). First ``skip`` steps are treated as warmup/compile.
    """

    def __init__(self, skip: int = 2):
        self.skip = skip
        self._times: List[float] = []
        self._last: Optional[float] = None
        self._seen = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            self._seen += 1
            dt = now - self._last
            if self._seen > self.skip:
                self._times.append(dt)
        self._last = now
        return dt

    def reset_epoch(self):
        self._last = None

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times) * 1000.0
        return {
            "steps": float(len(arr)),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p90_ms": float(np.percentile(arr, 90)),
            "p99_ms": float(np.percentile(arr, 99)),
            "max_ms": float(arr.max()),
        }


def live_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage from the runtime's memory stats (bytes)."""
    import jax

    stats = {}
    for device in jax.local_devices():
        try:
            m = device.memory_stats()
            if m:
                stats[str(device)] = {
                    "bytes_in_use": m.get("bytes_in_use", 0),
                    "peak_bytes_in_use": m.get("peak_bytes_in_use", 0),
                    "bytes_limit": m.get("bytes_limit", 0),
                }
        except Exception:
            continue
    return stats


def compiled_flops(fn, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs of the jitted fn at these args."""
    import jax

    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        a = analysis[0] if isinstance(analysis, (list, tuple)) else analysis
        return float(a.get("flops", 0.0)) or None
    except Exception:
        return None

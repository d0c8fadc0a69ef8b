"""Profiling & tracing (the reference had none; SURVEY §5 requires it).

- `trace(dir)`: context manager around jax.profiler.trace; works on the
  TPU (produces xplane + trace.json.gz viewable in TensorBoard/Perfetto).
- `summarize_trace(dir)`: host-side digest — top device ops by total time,
  grouped by HLO kind (what we used to find the warp/copy hotspots).
- `device_memory_stats()`: the --debug nvidia-smi equivalent.
- `StepTimer`: rolling per-step wall-clock with readback barriers (plain
  block_until_ready does not synchronize on remote-device platforms).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top: int = 20) -> list[tuple[str, float]]:
    """Top device op groups by total duration (ms) from the newest trace."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as fh:
        data = json.load(fh)
    host_markers = ("$", "np.", "jit_", "Pjit", "profiler")
    groups: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        name = e["name"]
        if any(name.startswith(m) or m in name for m in host_markers):
            continue
        groups[name.split(".")[0]] += e["dur"]
    return [(k, v / 1000.0) for k, v in groups.most_common(top)]


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.local_devices():
        try:
            stats[str(d)] = d.memory_stats() or {}
        except Exception:
            stats[str(d)] = {}
    return stats


class StepTimer:
    """Rolling average step timer with an explicit readback barrier."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, barrier_value=None) -> float:
        if barrier_value is not None:
            float(jax.numpy.asarray(barrier_value).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

"""Host-side timing utilities (the reference's timing.h equivalent).

ScopeTimer/TIMED_FUNCTION (reference timing.h:13-30) become a context-manager
timer plus a global toggle; device work is measured by block_until_ready
bracketing, and deep profiling goes through jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_print_timings = False
_accum = defaultdict(lambda: [0.0, 0]) # name -> [total_s, count]


def toggle_timing():
    """The reference's key-T toggle (main.cpp:996-1000)."""
    global _print_timings
    _print_timings = not _print_timings
    return _print_timings


def timing_enabled():
    return _print_timings


@contextlib.contextmanager
def timed(name: str, sync=None):
    """Time a block; if `sync` (a pytree of arrays) is given, block on it so
    device work is included."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    _accum[name][0] += dt
    _accum[name][1] += 1
    if _print_timings:
        print(f"[timing] {name}: {dt * 1e6:.1f} us")


def bench(fn, *args, warmup=2, iters=10):
    """Median wall time of fn(*args) with device sync; returns seconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def report():
    return {k: {"total_s": v[0], "count": v[1]} for k, v in _accum.items()}

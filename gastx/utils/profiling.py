"""Profiling & benchmarking utilities.

The reference has no tracing/profiling beyond wall-clock epoch timing
(SURVEY.md §5). gastx integrates the JAX profiler: trace annotations around
train/eval steps, on-demand trace capture for TensorBoard/Perfetto, and a
steady-state throughput timer that is robust to the async-dispatch pitfalls
of tunneled TPU backends (``block_until_ready`` may not block under axon —
``jax.device_get`` is the ground-truth sync).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region so it shows up named in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: Optional[str]):
    """Capture a profiler trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2,
              items_per_call: int = 1) -> Dict[str, float]:
    """Steady-state throughput of a jitted callable.

    Returns {"mean_ms", "p50_ms", "p90_ms", "items_per_s"}. Synchronizes via
    device_get of (a leaf of) the output every call.
    """
    def run_once():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf)

    for _ in range(warmup):
        run_once()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    return {
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "p90_ms": float(np.percentile(times, 90) * 1e3),
        "items_per_s": float(items_per_call / times.mean()),
    }


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Compiled-module FLOP count from XLA cost analysis (None if absent)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops"))
    except Exception:
        return None

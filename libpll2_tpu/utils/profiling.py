"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock timing in its test
runner (SURVEY §5). Here the engine's fused program carries
`jax.named_scope` annotations (pll.pmatrix / pll.partials / pll.edge_logl)
so device traces attribute time per stage, and this module wraps the JAX
profiler for one-line capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in XProf/TensorBoard:

        with profiling.trace('/tmp/pll-trace'):
            engine.loglikelihood()
    """
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Host-side trace annotation (shows up in the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def time_fn(fn: Callable[[], object], iters: int = 5,
            warmup: int = 1) -> float:
    """Best-of wall-clock seconds for fn(); blocks on JAX results."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best

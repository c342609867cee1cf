"""Profiling and stage timing helpers.

The reference's only profiling is commented-out line_profiler / MATLAB
profiler hooks (SURVEY.md §5).  TPU-native equivalents:

  * ``stage_timer`` -- wall-clock timing of jitted callables with proper
    device synchronization *and* caching pitfalls handled: on the axon
    tunnel, re-executing an identical (executable, inputs) pair is served
    from a cache and a blocked round trip costs ~30 ms, so the timer varies
    inputs via a caller-provided perturbation and reports pipelined
    throughput over n calls rather than single-call latency.
  * ``trace`` -- context manager around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, Tuple

import jax
import numpy as np


def stage_timer(
    fn: Callable,
    make_args: Callable[[int], Tuple],
    n_calls: int = 8,
    warmup: int = 1,
) -> dict:
    """Time a jitted callable: fn(*make_args(i)) for i in range(n_calls).

    make_args must return *different* argument values per i (identical inputs
    can be served from an execution cache on remote backends).  Returns
    total/avg seconds with outputs fully materialized on the host.
    """
    for i in range(warmup):
        out = fn(*make_args(-1 - i))
        jax.tree.map(lambda x: np.asarray(x), out)
    args = [make_args(i) for i in range(n_calls)]
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args]
    for o in outs:
        jax.tree.map(lambda x: np.asarray(x), o)
    total = time.perf_counter() - t0
    return {"total_s": total, "avg_s": total / n_calls, "n_calls": n_calls}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling helpers: latency histograms + XLA traces.

Replaces the reference's wall-clock prints (reference: quadjax/envs/
quadrotor.py:540,577) with blocking per-call latency percentiles and
optional `jax.profiler` traces viewable in Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def time_blocking(fn: Callable, iters: int = 30, warmup: int = 2, *args, **kw):
    """Latency stats of a device function (blocks on the result each call).

    Returns dict with p50/p90/p99/mean seconds over `iters` calls.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    arr = np.sort(np.array(times))
    return {
        "p50": float(np.percentile(arr, 50)),
        "p90": float(np.percentile(arr, 90)),
        "p99": float(np.percentile(arr, 99)),
        "mean": float(arr.mean()),
        "iters": iters,
    }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield

"""Profiling helpers: latency histograms + XLA traces.

Replaces the reference's wall-clock prints (reference: quadjax/envs/
quadrotor.py:540,577) with blocking per-call latency percentiles and
optional `jax.profiler` traces viewable in Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import numpy as np


def _sync(out):
    """Synchronize on a device result by TRANSFERRING one leaf.

    `jax.block_until_ready` does not actually block on tunneled backends
    (axon) — timings that only block read ~1000x too fast; a device_get
    cannot lie."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf))
    return out


def time_blocking(fn: Callable, iters: int = 30, warmup: int = 2, *args, **kw):
    """Per-call latency stats of a device function (syncs via transfer).

    Includes host->device dispatch (~24 ms/round-trip on a tunneled TPU) —
    this is the latency a host-in-the-loop controller would see. For the
    on-device solve rate use :func:`time_chained`.
    Returns dict with p50/p90/p99/mean seconds over `iters` calls.
    """
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    arr = np.sort(np.array(times))
    return {
        "p50": float(np.percentile(arr, 50)),
        "p90": float(np.percentile(arr, 90)),
        "p99": float(np.percentile(arr, 99)),
        "mean": float(arr.mean()),
        "iters": iters,
    }


def time_chained(fn: Callable, key, iters: int = 8, k: int = 32, warmup: int = 1):
    """Amortized per-call seconds: chains dependent calls of
    ``fn(key) -> array`` inside one jitted `lax.scan` (the shape a
    deployed control loop runs) and reads the wall via the sanctioned
    methods — device trace (:func:`time_trace`) with the two-point
    slope as fallback. The pre-r5 implementation subtracted a proxy
    empty-dispatch estimate, the method CLAUDE.md's perf notes document
    as WRONG on this box (its ±2 ms wobble corrupts a K=32 chain by up
    to 50%); that path is gone (r5 review finding).

    Returns the per-call dict the CLI bench JSON expects; with the
    trace method the per-call device work has no host-visible variance,
    so p50/p90/p99/mean all report the measured wall and ``method``
    says which estimator produced it.
    """
    del warmup  # both estimators warm internally
    import jax.numpy as jnp
    from jax import lax

    def make_run(length):
        @jax.jit
        def run(i):
            def one(c, _):
                kk, acc = c
                kk, sub = jax.random.split(kk)
                out = fn(sub)
                return (kk, acc + jnp.sum(out) * 1e-20), ()

            init = (jax.random.fold_in(key, i), jnp.float32(0.0))
            (_, acc), _ = lax.scan(one, init, None, length=length)
            return acc

        return run

    try:
        per = time_trace(make_run, chain=8 * k, iters=min(iters, 4))
        method = "trace"
    except Exception:  # noqa: BLE001 — profiler optional
        per, _ = time_slope(make_run, k=k)
        method = "slope"
    return {
        "p50": per, "p90": per, "p99": per, "mean": per,
        "iters": iters, "chained": k, "method": method,
    }


def time_slope(make_run, k: int = 32, reps: int = 5):
    """Amortized per-iteration seconds via a two-point slope fit.

    ``make_run(length)`` must return a callable ``run(i) -> value`` that
    executes `length` chained iterations in ONE dispatch (i is the rep
    index, for RNG folding) and whose result can be synchronized with
    ``float(...)``. Timing K and 5K iterations and taking the slope
    cancels dispatch overhead EXACTLY — subtracting a proxy
    empty-dispatch estimate instead lets its ±2 ms wobble corrupt a K=32
    measurement by up to 50% on this machine's tunneled TPU. Reps of the
    two lengths are interleaved so both sample the same contention
    environment; min-of-reps at each length before the slope.

    Returns ``(seconds_per_iteration, implied_dispatch_overhead_s)``.
    """
    k2 = 5 * k
    run1, run2 = make_run(k), make_run(k2)
    float(run1(0))  # warmup + compile; float() forces a real transfer
    float(run2(0))
    t1s, t2s = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        float(run1(i))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(i))
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / (k2 - k)
    overhead = min(t1s) - k * per
    return per, overhead


def time_trace(make_run, chain: int = 256, iters: int = 4,
               trace_dir: Optional[str] = None):
    """Per-iteration device seconds from a jax.profiler trace.

    Same ``make_run(length) -> run(i)`` contract as :func:`time_slope`,
    but the wall comes from DEVICE timestamps: the largest total-time
    while-op in the trace is the chain scan (inner scans nest inside
    it), and its mean duration / chain is the per-iteration wall —
    cycle-exact and immune to the ~25 ms tunnel RTT, where the slope's
    ±2 ms host wobble is ±15-25% of a short chain (it produced two
    phantom readings below the kernel floor; see bench.py). Raises if
    the profiler/trace is unavailable — callers fall back to
    :func:`time_slope`. ``trace_dir`` defaults to a per-process path so
    concurrent bench processes cannot rmtree or mis-glob each other's
    in-progress traces."""
    import shutil

    if trace_dir is None:
        trace_dir = f"/tmp/covo_time_trace_{os.getpid()}"
    run = make_run(chain)
    float(run(0))  # compile + warm
    if os.path.isdir(trace_dir):
        shutil.rmtree(trace_dir)
    with jax.profiler.trace(trace_dir):
        for i in range(iters):
            float(run(i + 1))
    hlos, _ = load_device_trace(trace_dir)
    whiles = {}
    for r in hlos:
        if r["name"].startswith("while"):
            a = whiles.setdefault(r["name"], [0.0, 0])
            a[0] += r["dur_us"]
            a[1] += 1
    if not whiles:
        raise ValueError("no while-op in device trace")
    tot, cnt = max(whiles.values(), key=lambda a: a[0])
    return (tot / cnt) / chain * 1e-6


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


# --- device-trace analysis ------------------------------------------------
#
# jax.profiler writes a Perfetto-style trace.json.gz whose device process
# carries one complete event PER EXECUTED HLO with `device_duration_ps`,
# `hlo_category`, `model_flops`, and `bytes_accessed` — enough to measure
# per-stage kernel time, arithmetic intensity, and (by segmenting on a
# once-per-iteration marker HLO) the TRUE per-solve duration distribution
# inside a chained dispatch. This works through the axon tunnel (verified:
# the tunnel RTT never touches device timestamps).


def load_device_trace(log_dir: str):
    """Parse the newest trace under ``log_dir``.

    Returns ``(hlo_events, module_events)``: per-HLO complete events on
    the device process (dicts with ``name, ts_us, dur_us, category,
    flops, bytes``) sorted by start time, and the module-level (jit_*)
    events with ``name, ts_us, dur_us, run_id``.
    """
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in e["args"].get("name", "")
    }
    hlos, modules = [], []
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        args = e.get("args", {})
        rec = {
            "name": e["name"],
            "ts_us": float(e["ts"]),
            "dur_us": float(e["dur"]),
        }
        if "hlo_category" in args:
            rec["category"] = args["hlo_category"]
            rec["flops"] = int(args.get("model_flops", 0) or 0)
            rec["bytes"] = int(args.get("bytes_accessed", 0) or 0)
            hlos.append(rec)
        else:
            rec["run_id"] = args.get("run_id")
            modules.append(rec)
    hlos.sort(key=lambda r: r["ts_us"])
    modules.sort(key=lambda r: r["ts_us"])
    return hlos, modules


def hlo_summary(hlos, top: int = 20):
    """Aggregate per-HLO events by op name.

    Returns a list of rows (dicts) sorted by total device time:
    ``name, category, count, total_us, mean_us, flops_per_call,
    bytes_per_call, tflops_per_s, gbytes_per_s`` — the measured-roofline
    inputs (utilization = tflops_per_s / peak, gbytes_per_s / peak).
    """
    agg = {}
    for r in hlos:
        a = agg.setdefault(
            r["name"],
            {"name": r["name"], "category": r["category"], "count": 0,
             "total_us": 0.0, "flops": 0, "bytes": 0},
        )
        a["count"] += 1
        a["total_us"] += r["dur_us"]
        a["flops"] += r["flops"]
        a["bytes"] += r["bytes"]
    rows = sorted(agg.values(), key=lambda a: -a["total_us"])[:top]
    for a in rows:
        a["mean_us"] = a["total_us"] / a["count"]
        a["flops_per_call"] = a["flops"] // a["count"]
        a["bytes_per_call"] = a["bytes"] // a["count"]
        sec = a["total_us"] * 1e-6
        a["tflops_per_s"] = (a["flops"] / sec / 1e12) if sec else 0.0
        a["gbytes_per_s"] = (a["bytes"] / sec / 1e9) if sec else 0.0
        del a["flops"], a["bytes"]
    return rows


def per_solve_distribution(hlos, n_solves: int, marker: str = "auto"):
    """True per-solve latency percentiles from device timestamps.

    Segments the chained dispatch at a once-per-solve marker HLO — by
    default the largest custom-call that fired exactly ``n_solves`` times
    (the flagship pallas kernel) — and returns the duration distribution
    dict (seconds). This is the honest per-solve tail: percentiles of
    host-timed chained dispatches are percentiles of CHAIN MEANS, which
    dilute a single slow solve by the chain length (round-4 verdict)."""
    if marker == "auto":
        best = None
        agg = {}
        for r in hlos:
            if r["category"] == "custom-call":
                a = agg.setdefault(r["name"], [0.0, 0])
                a[0] += r["dur_us"]
                a[1] += 1
        for name, (tot, cnt) in agg.items():
            if cnt == n_solves and (best is None or tot > best[1]):
                best = (name, tot)
        if best is None:
            raise ValueError("no once-per-solve custom-call marker found")
        marker = best[0]
    deltas = step_durations(hlos, marker)
    pct = lambda q: float(np.percentile(deltas, q))
    return {
        "marker": marker,
        "p50": pct(50),
        "p90": pct(90),
        "p99": pct(99),
        "max": float(deltas.max()),
        "n": int(len(deltas)),
    }


def step_durations(hlos, marker: str):
    """Per-iteration durations from a once-per-iteration marker HLO.

    Inside a chained dispatch (K solves in one `lax.scan`), every HLO
    whose name contains ``marker`` starts exactly once per solve;
    successive start timestamps give the true per-solve durations —
    including every inter-stage gap, unlike a stage-sum — with no host
    clock or tunnel RTT involved. Returns seconds, shape (K-1,) per
    dispatch, concatenated over dispatches.

    Dispatch boundaries are split at ``min(max(100x median, 2 ms),
    median + 10 ms)``: the inter-dispatch gap is the host round trip
    (>= ~20 ms on this box's tunnel) ON TOP of the last solve, so any
    delta more than 10 ms above the median is a boundary — while a
    10x-median cutoff (pre-r5) would also have clipped GENUINE slow
    solves from the distribution this function feeds to the "honest
    per-solve tail", and an uncapped 100x-median cutoff would re-admit
    RTT gaps for solvers with median >= ~0.25 ms (both review
    findings). Device-side execution of one XLA program does not stall
    10 ms above its own median, so everything under the boundary is a
    real solve."""
    exact = any(r["name"] == marker for r in hlos)
    match = (lambda n: n == marker) if exact else (lambda n: marker in n)
    starts = np.array(
        [r["ts_us"] for r in hlos if match(r["name"])], np.float64
    )
    if len(starts) < 3:
        raise ValueError(
            f"marker {marker!r} matched {len(starts)} events; need >= 3"
        )
    deltas = np.diff(np.sort(starts))
    med = np.median(deltas)
    boundary_us = min(max(100.0 * med, 2000.0), med + 10_000.0)
    return deltas[deltas < boundary_us] * 1e-6

#!/usr/bin/env python
"""Benchmark: MPC solve rate per chip on the flagship configuration.

Config (BASELINE.json #4): tracking_zigzag, CoVO-online, N=8192 samples,
H=32, lam=0.01, fast sampler, fused Pallas rollout engine. One solve =
cost-Hessian + eigh Σ-design + joint sampling + 8192x32 rollout kernel +
weighted update.

Measurement: K solves chained inside ONE jitted `lax.scan` — the shape a
deployed controller actually runs on TPU (the control loop lives on
device) — so the per-solve time is device time, not host-dispatch
round-trips (this machine's TPU tunnel adds ~24 ms per dispatch, which
single-call timing would mis-attribute to the solver).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": solves/s/chip, "unit": "solves/s",
   "vs_baseline": value / 500}
vs_baseline is against the 500 solves/s/chip north star (BASELINE.json —
the reference publishes no timing numbers; 500/s = 25x the 50 Hz real-time
control budget the Crazyflie platform implies).

Secondary detail (per-controller rates, engines) goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def trace_wall(make_run, init, chain: int, iters: int = 4):
    """Per-iteration device seconds from a jax.profiler trace.

    ``make_run(chain)`` must return a jitted fn ``run(init, key)`` whose
    body is one ``lax.scan`` chaining ``chain`` iterations. Thin adapter
    over :func:`covo_mpc_tpu.runtime.profiling.time_trace` (the single
    implementation of the largest-while trace wall) for run fns that
    take ``(init, key)`` instead of a rep index."""
    from covo_mpc_tpu.runtime.profiling import time_trace

    def adapt(length):
        run = make_run(length)
        return lambda i: run(
            init, jax.random.fold_in(jax.random.PRNGKey(2), i)
        )

    return time_trace(adapt, chain=chain, iters=iters)


def measure_solve_rate(solver, obs, state, params, info, control_params,
                       k: int = 32, reps: int = 5, method: str = "trace"):
    """Amortized per-solve seconds.

    method="trace" (default): chain 8*k solves per dispatch, capture a
    jax.profiler device trace of 4 dispatches, and read the scan-while
    wall from device timestamps — cycle-exact, bit-reproducible, immune
    to the tunnel (r5; scripts/kernel_ab.py uses the same primitive).
    Falls back to the slope when the profiler is unavailable.

    method="slope": two-point fit — time K and 5K solves chained in one
    dispatch each and take the slope; dispatch overhead cancels in the
    difference. CAUTION: the tunnel's ±2 ms wobble is ±15-25% of a K=32
    chain even after min-of-reps — it produced the round-3 "mppi
    0.043 ms" phantom AND an 0.029 ms reading in r5 (both below the
    31 µs rollout-kernel floor); sanity-check slope readings against
    the trace and the kernel floor before recording them."""

    def make_run(length):
        def one(carry, _):
            cp, key = carry
            key, k_act = jax.random.split(key)
            action, cp, _ = solver(obs, state, params, k_act, cp, info)
            return (cp, key), action[0]

        @jax.jit
        def run(cp, key):
            (cp, _), outs = lax.scan(one, (cp, key), None, length=length)
            # sum every float leaf of the solver state so no update is DCE'd
            # (works for MPPI/CoVO a_mean AND PID integral state)
            acc = sum(
                jnp.sum(leaf)
                for leaf in jax.tree.leaves(cp)
                if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
            )
            return acc + jnp.sum(outs)

        return run

    if method == "trace":
        try:
            return trace_wall(make_run, control_params, 8 * k), 0.0
        except Exception as e:  # noqa: BLE001 — profiler optional
            print(f"[bench] trace measurement unavailable ({e}); "
                  "falling back to slope", file=sys.stderr)

    k2 = 5 * k
    run1, run2 = make_run(k), make_run(k2)

    # sync by TRANSFERRING the scalar result: jax.block_until_ready does
    # not actually block on the tunneled axon backend (see CLAUDE.md)
    float(run1(control_params, jax.random.PRNGKey(1)))
    float(run2(control_params, jax.random.PRNGKey(1)))

    t1s, t2s = [], []
    for i in range(reps):
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        t0 = time.perf_counter()
        float(run1(control_params, key))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(control_params, key))
        t2s.append(time.perf_counter() - t0)
    per_solve = (min(t2s) - min(t1s)) / (k2 - k)
    overhead = min(t1s) - k * per_solve  # implied dispatch overhead
    return per_solve, overhead


def bench_scenarios(env, args, k: int = 8):
    """Aggregate CoVO-online AND MPPI throughput with B domain-randomized
    scenarios batched on one chip (the per-chip block of BASELINE config
    #5). Batching amortizes the solve's serial latency (Hessian scan
    steps, Σ-designer matmul chain) across scenarios."""
    from covo_mpc_tpu.models.structs import pack_state
    from covo_mpc_tpu.parallel.scenarios import (
        make_batched_covo_solve,
        make_batched_mppi_solve,
    )
    from covo_mpc_tpu.solvers import hover_sequence

    B = args.scenarios
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    params_b = jax.vmap(env.sample_params)(keys)
    states = jax.vmap(lambda key, p: env.reset_env(key, p)[2])(keys, params_b)
    x0s = jax.vmap(pack_state)(states)
    a_means0 = jnp.tile(hover_sequence(env, args.h)[None], (B, 1, 1))
    a_covs0 = jnp.tile(jnp.eye(4)[None, None] * 0.25, (B, args.h, 1, 1))

    def wall(make_run, init):
        # device-trace wall (see trace_wall); slope fallback mirrors
        # measure_solve_rate's
        try:
            return trace_wall(make_run, init, 8 * k)
        except Exception as e:  # noqa: BLE001 — profiler optional
            print(f"[bench] trace measurement unavailable ({e}); "
                  "falling back to slope", file=sys.stderr)
        k2 = 5 * k
        run1, run2 = make_run(k), make_run(k2)
        float(run1(init, jax.random.PRNGKey(1)))
        float(run2(init, jax.random.PRNGKey(1)))
        t1s, t2s = [], []
        for i in range(4):
            key = jax.random.fold_in(jax.random.PRNGKey(2), i)
            t0 = time.perf_counter()
            float(run1(init, key))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run2(init, key))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (k2 - k)

    # --- CoVO-online ---
    # the batched solves know only fast (per-scenario fold_in streams) vs
    # kernel draws — coerce "invariant" so the printed row's rng label
    # matches what actually ran
    rng = getattr(args, "rng", "fast")
    if rng != "kernel":
        rng = "fast"
    covo = make_batched_covo_solve(env, args.n, args.h, 0.01, rng=rng)

    def make_covo_run(length):
        def one(carry, _):
            a_means, key = carry
            key, k_s = jax.random.split(key)
            a_means, min_costs = covo(
                x0s, states.time, states.pos_traj, states.vel_traj,
                a_means, params_b, k_s,
            )
            return (a_means, key), min_costs[0]

        @jax.jit
        def run(a, key):
            (a, _), outs = lax.scan(one, (a, key), None, length=length)
            return jnp.sum(a) + jnp.sum(outs)

        return run

    per_batch = wall(make_covo_run, a_means0)
    agg = B / per_batch
    print(
        f"[bench] covo_online scenario-batched B={B} rng={rng} "
        f"N={args.n} H={args.h}: "
        f"{per_batch*1e3:7.3f} ms/batch-step -> {agg:8.1f} aggregate "
        f"solves/s/chip ({agg/B:.0f}/s/scenario)",
        file=sys.stderr,
    )

    # --- MPPI ---
    mppi = make_batched_mppi_solve(env, args.n, args.h, 0.01, rng=rng)

    def make_mppi_run(length):
        def one(carry, _):
            a_means, a_covs, key = carry
            key, k_s = jax.random.split(key)
            a_means, a_covs, min_costs = mppi(
                x0s, states.time, states.pos_traj, states.vel_traj,
                a_means, a_covs, params_b, k_s,
            )
            return (a_means, a_covs, key), min_costs[0]

        @jax.jit
        def run(a, key):
            (a, _, _), outs = lax.scan(one, (a, a_covs0, key), None,
                                       length=length)
            return jnp.sum(a) + jnp.sum(outs)

        return run

    per_batch_m = wall(make_mppi_run, a_means0)
    agg_m = B / per_batch_m
    print(
        f"[bench] mppi        scenario-batched B={B} rng={rng} "
        f"N={args.n} H={args.h}: "
        f"{per_batch_m*1e3:7.3f} ms/batch-step -> {agg_m:8.1f} aggregate "
        f"solves/s/chip ({agg_m/B:.0f}/s/scenario)",
        file=sys.stderr,
    )
    return agg


def bench_speculative(env, args, k: int = 32, rng_mode=None,
                      hessian_mode="adjoint"):
    """covo_speculative: the obs→action latency path (act: shift + sample +
    rollout + update with the Σ prepared last step) vs the full step
    (act + prepare fused). act is what a deployed 50 Hz loop pays between
    observing the state and emitting the action; prepare hides in loop
    idle (or on a second pipeline chip)."""
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.solvers import get_solver

    if rng_mode is None:
        rng_mode = sampling.FAST
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    solver, cp = get_solver(
        env, "covo_speculative", f"N{args.n}_H{args.h}_lam0.01",
        rng_mode=rng_mode, hessian_mode=hessian_mode, collect_debug=False,
        engine=args.engine, sigma_mode="ns",
    )
    cp = solver.reset(state, params, cp, jax.random.PRNGKey(7))
    per_full, _ = measure_solve_rate(solver, obs, state, params, info, cp, k=k)
    per_act, _ = measure_solve_rate(
        solver.act, obs, state, params, info, cp, k=k
    )
    tag = f"{args.engine}+krng" if rng_mode == sampling.KERNEL else args.engine
    if hessian_mode != "adjoint":
        tag = f"{tag}+{hessian_mode}"
    print(
        f"[bench] covo_spec    engine={tag:16s} N={args.n} H={args.h}: "
        f"act {per_act*1e3:7.3f} ms obs->action "
        f"({1.0/per_act:7.1f}/s), full step {per_full*1e3:7.3f} ms "
        f"({1.0/per_full:7.1f}/s)",
        file=sys.stderr,
    )
    return 1.0 / per_act


def bench_latency(env, args, iters: int = 60, chain: int = 256):
    """Real-time latency artifact (BASELINE.md p99 row): per-solve latency
    DISTRIBUTIONS for the covo_online headline mode and the
    covo_speculative act() path (the obs→action number a 50 Hz deployment
    pays), recorded four ways so nothing is mis-attributed:

      * device PER-SOLVE p50/p90/p99 — the honest tail: a jax.profiler
        device trace of the chained run, segmented at the once-per-solve
        rollout-kernel launch (runtime/profiling.per_solve_distribution);
        every individual solve's duration from device timestamps;
      * device chain-mean p50/p90/p99 — per-solve means of `iters`
        dispatches of `chain` solves each. NOTE: these are percentiles of
        CHAIN MEANS — a single slow solve inside a chain is diluted
        ~`chain`x, so this measures dispatch-to-dispatch variance, NOT
        the per-solve tail (round-4 verdict; kept for continuity with
        earlier rounds' mislabelled "device p99");
      * host single-dispatch p50/p99 — raw obs→action round trip through
        THIS box's TPU tunnel (upper bound; dominated by the ~24 ms RTT);
      * the empty-dispatch RTT distribution, reported separately, so the
        host numbers can be read as RTT + solve.

    Returns a dict for the JSON line + RESULTS.md table.
    """
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.runtime.profiling import (
        load_device_trace,
        per_solve_distribution,
        time_blocking,
    )
    from covo_mpc_tpu.solvers import get_solver

    import numpy as np

    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    pstr = f"N{args.n}_H{args.h}_lam0.01"

    rng_mode = sampling.KERNEL if args.engine == "pallas" else sampling.FAST

    def chained_percentiles(fn, cp, tag):
        """(per_solve, chain_mean, rtt) latency dicts — see docstring."""

        def make_run(length):
            def one(carry, _):
                cp, key = carry
                key, k_act = jax.random.split(key)
                action, cp, _ = fn(obs, state, params, k_act, cp, info)
                return (cp, key), action[0]

            @jax.jit
            def run(cp, key):
                (cp, _), outs = lax.scan(one, (cp, key), None, length=length)
                acc = sum(
                    jnp.sum(leaf)
                    for leaf in jax.tree.leaves(cp)
                    if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
                )
                return acc + jnp.sum(outs)

            return run

        run = make_run(chain)
        float(run(cp, jax.random.PRNGKey(1)))  # compile + warm
        # honest per-solve tail: device trace, kernel-marker segmented
        trace_iters = 8
        # per-process dir: concurrent benches must not clobber each
        # other's in-progress traces (review finding)
        tdir = f"/tmp/bench_latency_trace_{tag}_{os.getpid()}"
        per_solve = None
        try:
            import shutil

            if os.path.isdir(tdir):
                shutil.rmtree(tdir)
            with jax.profiler.trace(tdir):
                for i in range(trace_iters):
                    float(run(cp, jax.random.fold_in(jax.random.PRNGKey(3), i)))
            hlos, _ = load_device_trace(tdir)
            per_solve = per_solve_distribution(hlos, trace_iters * chain)
        except Exception as e:  # noqa: BLE001 — profiler optional
            print(f"[bench] latency trace unavailable ({e}); "
                  "per-solve tail omitted", file=sys.stderr)
        # empty-dispatch RTT distribution (reported separately)
        @jax.jit
        def empty(x):
            return x + 1

        float(empty(jnp.zeros((), jnp.int32)))
        rtts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(empty(jnp.zeros((), jnp.int32)))
            rtts.append(time.perf_counter() - t0)
        rtt_med = float(np.median(rtts))
        per = []
        for i in range(iters):
            key = jax.random.fold_in(jax.random.PRNGKey(2), i)
            t0 = time.perf_counter()
            float(run(cp, key))
            per.append((time.perf_counter() - t0 - rtt_med) / chain)
        arr = np.sort(np.maximum(np.array(per), 0.0))
        pct = lambda q: float(np.percentile(arr, q))
        return (
            per_solve,
            {"p50": pct(50), "p90": pct(90), "p99": pct(99)},
            {
                "p50": rtt_med,
                "p99": float(np.percentile(np.array(rtts), 99)),
            },
        )

    out = {}

    # covo_online headline mode (gn + kernel-rng where available)
    solver, cp = get_solver(
        env, "covo_online", pstr, rng_mode=rng_mode,
        hessian_mode=args.hessian_mode, collect_debug=False,
        engine=args.engine, sigma_mode="ns",
    )
    ps, cm, rtt = chained_percentiles(solver, cp, "covo")
    host = time_blocking(
        lambda key: solver(obs, state, params, key, cp, info)[0],
        iters=30, warmup=3, key=jax.random.PRNGKey(3),
    )
    out["covo_online"] = {"per_solve": ps, "chain_mean": cm,
                          "host_dispatch": host, "rtt": rtt}

    # covo_speculative act() path: obs->action with Σ prepared last step
    spec, cps = get_solver(
        env, "covo_speculative", pstr, rng_mode=rng_mode,
        hessian_mode=args.hessian_mode, collect_debug=False,
        engine=args.engine, sigma_mode="ns",
    )
    cps = spec.reset(state, params, cps, jax.random.PRNGKey(7))
    ps_a, cm_a, rtt_a = chained_percentiles(spec.act, cps, "act")
    host_a = time_blocking(
        lambda key: spec.act(obs, state, params, key, cps, info)[0],
        iters=30, warmup=3, key=jax.random.PRNGKey(3),
    )
    out["covo_speculative_act"] = {
        "per_solve": ps_a, "chain_mean": cm_a,
        "host_dispatch": host_a, "rtt": rtt_a,
    }

    budget = 0.020
    for name, row in out.items():
        d = row["per_solve"] or row["chain_mean"]
        tag = "per-solve" if row["per_solve"] else "chain-mean(!)"
        h, r = row["host_dispatch"], row["rtt"]
        cm = row["chain_mean"]
        print(
            f"[bench] latency {name:22s}: device {tag} p50/p90/p99 = "
            f"{d['p50']*1e3:.3f}/{d['p90']*1e3:.3f}/{d['p99']*1e3:.3f} ms "
            f"(20ms budget p99: {'PASS' if d['p99'] < budget else 'FAIL'}); "
            f"chain-mean p50/p99 = {cm['p50']*1e3:.3f}/{cm['p99']*1e3:.3f} ms; "
            f"host dispatch p50/p99 = {h['p50']*1e3:.1f}/{h['p99']*1e3:.1f} ms "
            f"(tunnel RTT p50/p99 = {r['p50']*1e3:.1f}/{r['p99']*1e3:.1f} ms)",
            file=sys.stderr,
        )
    return out


def bench_covo_offline(env, args, k: int = 32):
    """CoVO-offline: one-time Σ-schedule precompute (the reference redoes
    this scan at every reset, covo.py:101-112) + steady-state solve rate
    with the precomputed schedule."""
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.solvers import get_solver

    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    solver, cp = get_solver(
        env, "covo_offline", f"N{args.n}_H{args.h}_lam0.01",
        rng_mode=sampling.FAST, hessian_mode="adjoint",
        collect_debug=False, engine=args.engine, sigma_mode="ns",
    )
    # schedule precompute: one dispatch, seconds-scale -> wall time is fine
    # (the ~25 ms tunnel overhead is <2% here); sync via transfer
    reset = lambda: solver.reset(state, params, cp, jax.random.PRNGKey(7))
    cp_sched = reset()
    float(jnp.sum(cp_sched.a_cov_offline))  # compile + sync
    t0 = time.time()
    cp_sched = reset()
    float(jnp.sum(cp_sched.a_cov_offline))
    precompute_s = time.time() - t0

    per_solve, overhead = measure_solve_rate(
        solver, obs, state, params, info, cp_sched, k=k
    )
    rate = 1.0 / per_solve
    print(
        f"[bench] covo_offline engine={args.engine:6s} N={args.n} H={args.h}: "
        f"schedule precompute {precompute_s:.2f} s (300 steps), then "
        f"{per_solve*1e3:7.3f} ms/solve -> {rate:7.1f} solves/s/chip "
        f"(20ms budget: {'PASS' if per_solve < 0.02 else 'FAIL'})",
        file=sys.stderr,
    )
    return rate


def wait_for_backend(budget_s: float) -> None:
    """Wait (bounded) for the TPU backend to come up before touching jax.

    The axon tunnel on this machine goes down for hours at a time; its
    backend init BLOCKS inside PJRT and then raises UNAVAILABLE, so an
    in-process try/except can stall unboundedly. Probe from a subprocess
    with a hard timeout instead and retry until ``budget_s`` is spent —
    then fall through and let the real init produce its own error.
    """
    import os
    import subprocess

    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return  # cpu/tpu-local run: nothing to wait for
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.time()
        if left <= 0:
            print("[bench] backend wait budget exhausted; proceeding "
                  "(init may fail)", file=sys.stderr)
            return
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=min(300, left),
            )
            rc = probe.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc == 0:
            if attempt > 1:
                print(f"[bench] backend up after {attempt} probes",
                      file=sys.stderr)
            return
        print(f"[bench] backend probe {attempt} failed "
              f"(rc={rc}); retrying ({int(left)}s budget left)",
              file=sys.stderr)
        time.sleep(min(60, max(0, deadline - time.time())))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=32, help="solves per dispatch")
    ap.add_argument("--controller", default="covo_online")
    ap.add_argument("--engine", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--all", action="store_true", help="also bench mppi/jnp")
    ap.add_argument("--rng", default="kernel",
                    choices=["fast", "invariant", "kernel"],
                    help="sampler for the headline row (kernel = in-kernel "
                         "TPU-PRNG draw, pallas engine only — "
                         "quality-gated: RESULTS.md speed-mode rows)")
    ap.add_argument("--hessian-mode", default="gn",
                    choices=["fwd_fwd", "fwd_rev", "sensitivity", "adjoint",
                             "gn"],
                    help="CoVO Hessian for the headline row. Default gn "
                         "(Gauss-Newton): quality-gated on the 40-episode "
                         "protocol (RESULTS.md: gn+krng 3.53 cm, +47.9% vs "
                         "MPPI — inside the paper's 43-54% band, on par "
                         "with the exact adjoint's 3.83)")
    ap.add_argument("--disturb-type", default="gaussian",
                    choices=["gaussian", "none", "sin", "periodic", "drag",
                             "mixed"],
                    help="disturbance model for the benched env (drag/mixed "
                         "exercise the velocity-coupled 16-dim Hessian "
                         "fast path)")
    ap.add_argument("--scenarios", type=int, default=0,
                    help="also bench the scenario-batched CoVO solve "
                         "(aggregate solves/s/chip at B scenarios)")
    ap.add_argument("--wait-tpu", type=float, default=1200.0,
                    help="seconds to wait for the (flaky) TPU tunnel "
                         "before starting; 0 = don't probe")
    ap.add_argument("--no-latency", action="store_true",
                    help="skip the p50/p90/p99 latency distribution pass "
                         "(covo_online + speculative act path)")
    args = ap.parse_args()

    if args.wait_tpu > 0:
        wait_for_backend(args.wait_tpu)

    # remote axon compiles are high-variance (23-344 s observed for one
    # program); reruns load the compiled executable from .jax_cache instead
    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.ops import covariance, sampling
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag",
            enable_randomizer=False,
            disturb_type=args.disturb_type,
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    pstr = f"N{args.n}_H{args.h}_lam0.01"
    print(f"[bench] device={jax.devices()[0]}", file=sys.stderr)

    def bench_one(controller, engine, sigma_mode="ns", rng_mode=None,
                  hessian_mode="adjoint"):
        # fast-path config: adjoint Hessian + matmul-only Newton-Schulz
        # Σ-designer (quality pinned vs the eigh path in tests + RESULTS.md);
        # rng "kernel" = in-kernel TPU-PRNG sampling (quality-gated in
        # RESULTS.md), only meaningful with the pallas engine;
        # hessian "gn" = Gauss-Newton curvature (quality-gated likewise)
        if rng_mode is None:
            rng_mode = sampling.FAST
        solver, cp = get_solver(
            env, controller, pstr, rng_mode=rng_mode,
            hessian_mode=hessian_mode, collect_debug=False,
            engine=engine, sigma_mode=sigma_mode,
        )
        per_solve, overhead = measure_solve_rate(
            solver, obs, state, params, info, cp, k=args.k
        )
        rate = 1.0 / per_solve
        tag = f"{engine}+krng" if rng_mode == sampling.KERNEL else engine
        if hessian_mode != "adjoint":
            tag = f"{tag}+{hessian_mode}"
        if sigma_mode != "ns":
            tag = f"{tag}+{sigma_mode}"
        print(
            f"[bench] {controller:12s} engine={tag:16s} N={args.n} H={args.h}: "
            f"{per_solve*1e3:7.3f} ms/solve -> {rate:7.1f} solves/s/chip "
            f"(dispatch overhead {overhead*1e3:.1f} ms, "
            f"20ms budget: {'PASS' if per_solve < 0.02 else 'FAIL'})",
            file=sys.stderr,
        )
        return rate

    def bench_pid(k):
        solver, cp = get_solver(env, "pid")
        per_solve, _ = measure_solve_rate(
            solver, obs, state, params, info, cp, k=k
        )
        print(
            f"[bench] {'pid':12s} {'':13s} baseline          : "
            f"{per_solve*1e3:7.3f} ms/solve -> {1.0/per_solve:7.1f} "
            f"solves/s/chip",
            file=sys.stderr,
        )

    if args.all:
        for c in ("mppi", "covo_online"):
            for e in ("jnp", "pallas"):
                bench_one(c, e)
        bench_one("mppi", "pallas", rng_mode=sampling.KERNEL)
        bench_one("covo_online", "pallas", rng_mode=sampling.KERNEL)
        bench_one("covo_online", "pallas", sigma_mode="eigh")
        bench_one("covo_online", "pallas", hessian_mode="gn")
        bench_one("covo_online", "pallas", rng_mode=sampling.KERNEL,
                  hessian_mode="gn")
        # coverage boundary: the velocity-coupled (16-dim) Hessian fast
        # path on a drag env (same flagship config, different disturbance)
        env_drag = QuadEnv(
            EnvConfig(
                task="tracking_zigzag", enable_randomizer=False,
                disturb_type="drag", disable_rollover_terminate=True,
                generate_noisy_state=True,
            )
        )
        obs_d, info_d, state_d = env_drag.reset_env(
            jax.random.PRNGKey(0), env_drag.default_params
        )
        solver_d, cp_d = get_solver(
            env_drag, "covo_online", pstr, rng_mode=sampling.FAST,
            hessian_mode="adjoint", collect_debug=False,
            engine=args.engine, sigma_mode="ns",
        )
        per_solve_d, _ = measure_solve_rate(
            solver_d, obs_d, state_d, env_drag.default_params, info_d, cp_d,
            k=args.k,
        )
        print(
            f"[bench] {'covo_online':12s} engine={args.engine + '+drag':16s} "
            f"N={args.n} H={args.h}: {per_solve_d*1e3:7.3f} ms/solve -> "
            f"{1.0/per_solve_d:7.1f} solves/s/chip "
            f"(velocity-coupled Hessian)",
            file=sys.stderr,
        )
        bench_covo_offline(env, args, k=args.k)
        bench_speculative(env, args, k=args.k)
        bench_speculative(env, args, k=args.k, hessian_mode="gn")
        if args.engine == "pallas":  # in-kernel draw needs the fused kernel
            bench_speculative(env, args, k=args.k, rng_mode=sampling.KERNEL)
        bench_pid(k=args.k * 4)

    if args.scenarios:
        bench_scenarios(env, args, k=args.k)

    headline_rng = args.rng
    if args.engine != "pallas" and headline_rng == "kernel":
        headline_rng = "fast"  # in-kernel draw needs the fused kernel
    rate = bench_one(args.controller, args.engine, rng_mode=headline_rng,
                     hessian_mode=args.hessian_mode)
    mode = f"{args.engine}"
    if headline_rng == "kernel":
        mode += "+krng"
    if args.hessian_mode != "adjoint":
        mode += f"+{args.hessian_mode}"
    record = {
        "metric": f"{args.controller}_solves_per_s_chip_N{args.n}_H{args.h}",
        "value": round(rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(rate / 500.0, 3),
        # quality gate for the non-parity speed modes: RESULTS.md
        # "Speed-mode quality gates" (40-episode protocol)
        "mode": mode,
    }
    if not args.no_latency:
        # real-time latency artifact (BASELINE.md p99 row + the
        # speculative act path — the obs→action number a 50 Hz
        # single-plant deployment pays)
        lat = bench_latency(env, args)
        for tag, row in (("", lat["covo_online"]),
                         ("act_", lat["covo_speculative_act"])):
            ps, cm = row["per_solve"], row["chain_mean"]
            if ps is not None:
                # HONEST per-solve tail: device-trace timestamps,
                # kernel-marker segmented (one entry per individual solve)
                record[f"{tag}per_solve_p99_ms"] = round(ps["p99"] * 1e3, 4)
                record[f"{tag}per_solve_p50_ms"] = round(ps["p50"] * 1e3, 4)
            # chain-mean percentiles (dispatch-to-dispatch variance of
            # 256-solve means — NOT a per-solve tail; kept for continuity
            # with the pre-r5 mislabelled "p99_ms_device")
            record[f"{tag}chain_mean_p99_ms"] = round(cm["p99"] * 1e3, 4)
            record[f"{tag}chain_mean_p50_ms"] = round(cm["p50"] * 1e3, 4)
        act_ps = lat["covo_speculative_act"]["per_solve"]
        act_ref = act_ps or lat["covo_speculative_act"]["chain_mean"]
        record.update(
            act_solves_per_s=round(1.0 / max(act_ref["p50"], 1e-9), 1),
            host_dispatch_p99_ms=round(
                lat["covo_online"]["host_dispatch"]["p99"] * 1e3, 1
            ),
            rtt_p50_ms=round(lat["covo_online"]["rtt"]["p50"] * 1e3, 1),
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()

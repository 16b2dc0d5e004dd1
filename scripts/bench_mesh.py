#!/usr/bin/env python
"""Multi-chip benchmark harness: solve rate on a device mesh.

The one command a pod operator runs (BASELINE.md scaling row — ≥85%
efficiency at ≥2 hosts; protocol being scaled: reference
quadjax/envs/quadrotor.py:506-591):

    python scripts/bench_mesh.py                      # all devices, auto mesh
    python scripts/bench_mesh.py --samples 4          # 4-way sample sharding
    python scripts/bench_mesh.py --scenarios 8 --b 8  # scenario-DP sweep

Two scaling axes are measured (SURVEY.md §2 parallelism table):

  * SAMPLE sharding — one flagship CoVO-online solve's N rollout samples
    split across chips (3 collectives/solve: pmin + 2 psum). Strong
    scaling: fixed N, lower latency per solve. Reported per shard count
    with efficiency vs the 1-shard rate.
  * SCENARIO data-parallelism — B independent DR episodes, one per-chip
    batched CoVO step each (zero per-solve communication). Weak scaling:
    aggregate solves/s. Reported with efficiency vs the 1-chip aggregate.

Measurement: solves chained per dispatch, per-solve wall from a
jax.profiler DEVICE trace (runtime/profiling.time_trace — cycle-exact,
tunnel-immune; r5), two-point slope as fallback; never time single
dispatches through the ~24 ms TPU tunnel.

On the CPU backend (8 virtual devices) the numbers are PLUMBING-ONLY —
they validate the harness and the collective layout, not TPU performance.
Prints one JSON line per configuration plus a summary table to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192, help="samples per solve")
    ap.add_argument("--h", type=int, default=32, help="horizon")
    ap.add_argument("--lam", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=32, help="solves per dispatch")
    ap.add_argument("--samples", type=int, default=0,
                    help="sample-shard counts to bench (0 = sweep 1..all "
                         "devices in powers of 2)")
    ap.add_argument("--scenarios", type=int, default=0,
                    help="scenario-DP width to bench (0 = skip; uses all "
                         "devices as scenario shards)")
    ap.add_argument("--b", type=int, default=0,
                    help="total scenario batch for the scenario axis "
                         "(default: one per scenario shard)")
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "jnp"],
                    help="rollout engine; auto = pallas on TPU (interpret "
                         "elsewhere) when per-shard N is tile-aligned")
    ap.add_argument("--rng", default="invariant",
                    choices=["invariant", "kernel"],
                    help="sampler: invariant = mesh-shape-invariant "
                         "global-id draws; kernel = in-kernel TPU-PRNG "
                         "draw per shard (pallas engine only — fastest, "
                         "not resharding-invariant)")
    ap.add_argument("--hessian", default="adjoint",
                    choices=["adjoint", "gn"],
                    help="CoVO Hessian for the sample-sharded solve (gn = "
                         "the quality-gated headline curvature)")
    ap.add_argument("--offline", action="store_true",
                    help="also bench the CoVO-offline Σ-schedule precompute "
                         "sharded over the mesh (parallel/offline.py)")
    ap.add_argument("--pipeline", action="store_true",
                    help="also bench the two-stage speculative pipeline "
                         "(act + Σ-design on separate chips, "
                         "parallel/pipeline.py) on the first two devices")
    ap.add_argument("--metrics", default="",
                    help="write per-solve health metrics (ESS, cost "
                         "min/mean/max, Σ conditioning — psum'd from the "
                         "shard partials) for a short mesh episode as "
                         "JSONL to this path")
    ap.add_argument("--metrics-steps", type=int, default=32,
                    help="episode length for --metrics")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (plumbing smoke test; pair "
                         "with XLA_FLAGS=--xla_force_host_platform_device_"
                         "count=8 for a virtual 8-chip mesh)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host pod run: jax.distributed.initialize via "
                         "COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID "
                         "env vars (one process per host), then bench over "
                         "the global device set")
    return ap.parse_args()


def resolve_engine(choice: str, n_local: int):
    """Engine + interpret flag for this backend/shard shape.

    Ragged/small per-shard sample counts are fine: the fused kernel
    tile-pads the sample axis (each shard computes at least one full
    1024-sample tile, so prefer fewer shards at tiny N).
    """
    del n_local
    on_tpu = jax.default_backend() == "tpu"
    if choice == "jnp":
        return "jnp", False
    return "pallas", not on_tpu


def make_env():
    from covo_mpc_tpu.models import EnvConfig, QuadEnv

    return QuadEnv(
        EnvConfig(
            task="tracking_zigzag",
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )


def measure(make_run, k: int):
    """Device-trace wall (r5 default), slope fallback.

    The slope's ±2 ms host wobble is ±15-25% of a short chain on this
    box's tunneled TPU (two phantom sub-kernel-floor readings on
    record); the trace wall is cycle-exact. On CPU (plumbing-only runs)
    the trace may lack device lanes — fall back to the slope."""
    from covo_mpc_tpu.runtime.profiling import time_slope, time_trace

    try:
        return time_trace(make_run, chain=8 * k), 0.0
    except Exception as e:  # noqa: BLE001 — profiler optional
        print(f"[bench-mesh] trace wall unavailable ({e}); using slope",
              file=sys.stderr)
        return time_slope(make_run, k=k)


def bench_sample_sharding(env, args, shard_counts):
    """Strong scaling: one CoVO-online solve, N sharded across chips."""
    from covo_mpc_tpu.models.structs import pack_state
    from covo_mpc_tpu.parallel import make_mesh
    from covo_mpc_tpu.parallel.sharded import make_distributed_covo_solve
    from covo_mpc_tpu.solvers import hover_sequence

    params = env.default_params
    _, _, state = env.reset_env(jax.random.PRNGKey(0), params)
    x0 = pack_state(state)
    a_mean0 = hover_sequence(env, args.h)

    rows = []
    for s in shard_counts:
        engine, interpret = resolve_engine(args.engine, args.n // s)
        rng_mode = args.rng if engine == "pallas" else "invariant"
        mesh = make_mesh(samples=s, scenarios=1, devices=jax.devices()[:s])
        solve = make_distributed_covo_solve(
            env, mesh, N=args.n, H=args.h, lam=args.lam,
            engine=engine, interpret=interpret, rng=rng_mode,
            hessian_mode=args.hessian,
        )

        def make_run(length):
            def one(carry, _):
                a_mean, rng = carry
                rng, sub = jax.random.split(rng)
                a_mean, min_cost = solve(
                    x0, state.time, state.pos_traj, state.vel_traj,
                    a_mean, params, sub,
                )
                return (a_mean, rng), min_cost

            @jax.jit
            def run(i):
                key = jax.random.fold_in(jax.random.PRNGKey(2), i)
                (a, _), outs = lax.scan(one, (a_mean0, key), None,
                                        length=length)
                return jnp.sum(a) + jnp.sum(outs)

            return run

        per_solve, overhead = measure(make_run, k=args.k)
        rows.append({
            "axis": "samples",
            "shards": s,
            "rng": rng_mode,
            "engine": engine + ("/interpret" if interpret else ""),
            "ms_per_solve": per_solve * 1e3,
            "solves_per_s": 1.0 / per_solve,
        })
        print(
            f"[mesh] covo_online N={args.n} H={args.h} sample-shards={s} "
            f"({rows[-1]['engine']}): {per_solve*1e3:7.3f} ms/solve -> "
            f"{1.0/per_solve:8.1f} solves/s "
            f"(dispatch overhead {overhead*1e3:.1f} ms)",
            file=sys.stderr,
        )

    base = rows[0]
    for r in rows:
        speedup = r["solves_per_s"] / base["solves_per_s"]
        r["speedup_vs_1shard"] = speedup
        r["scaling_efficiency"] = speedup / (r["shards"] / base["shards"])
    return rows


def bench_scenario_dp(env, args, n_chips, B):
    """Weak scaling: B DR episodes data-parallel over n_chips chips, each
    chip running the batched CoVO step on its local scenarios."""
    from covo_mpc_tpu.parallel import make_mesh
    from covo_mpc_tpu.parallel.scenarios import make_multichip_covo_step
    from covo_mpc_tpu.solvers import hover_sequence

    rows = []
    for chips in sorted({1, n_chips}):
        b = max(B * chips // n_chips, 1) if chips < n_chips else B
        engine, interpret = resolve_engine(args.engine, args.n)
        rng_mode = args.rng if engine == "pallas" else "invariant"
        mesh = make_mesh(samples=1, scenarios=chips,
                         devices=jax.devices()[:chips])
        step = make_multichip_covo_step(
            env, mesh, N=args.n, H=args.h, lam=args.lam,
            engine=engine, interpret=interpret, rng=rng_mode,
        )
        keys = jax.random.split(jax.random.PRNGKey(1), b)
        scen_params = jax.vmap(env.sample_params)(keys)
        states = jax.vmap(lambda k, p: env.reset_env(k, p)[2])(
            keys, scen_params
        )
        a_means0 = jnp.tile(hover_sequence(env, args.h)[None], (b, 1, 1))

        def make_run(length):
            def one(carry, _):
                a_means, rng = carry
                rng, sub = jax.random.split(rng)
                step_keys = jax.random.split(sub, b)
                _, a_means, rewards, _ = step(
                    states, scen_params, a_means, step_keys
                )
                return (a_means, rng), jnp.sum(rewards)

            @jax.jit
            def run(i):
                key = jax.random.fold_in(jax.random.PRNGKey(3), i)
                (a, _), outs = lax.scan(one, (a_means0, key), None,
                                        length=length)
                return jnp.sum(a) + jnp.sum(outs)

            return run

        per_step, overhead = measure(make_run, k=max(args.k // 4, 2))
        agg = b / per_step
        rows.append({
            "axis": "scenarios",
            "chips": chips,
            "scenario_batch": b,
            "rng": rng_mode,
            "engine": engine + ("/interpret" if interpret else ""),
            "ms_per_step": per_step * 1e3,
            "aggregate_solves_per_s": agg,
        })
        print(
            f"[mesh] covo_online scenario-DP chips={chips} B={b} "
            f"({rows[-1]['engine']}): {per_step*1e3:7.3f} ms/step -> "
            f"{agg:8.1f} aggregate solves/s "
            f"(dispatch overhead {overhead*1e3:.1f} ms)",
            file=sys.stderr,
        )

    base = rows[0]
    for r in rows:
        per_chip = r["aggregate_solves_per_s"] / r["chips"]
        base_per_chip = base["aggregate_solves_per_s"] / base["chips"]
        r["scaling_efficiency"] = per_chip / base_per_chip
    return rows


def bench_offline_schedule(env, args, shard_counts):
    """Offline Σ-schedule precompute scaling: phase 2's max_steps
    independent Hessian+designer problems sharded over the mesh
    (parallel/offline.py; 1 shard = the single-chip ``_reset_offline``).
    One-shot seconds-scale dispatches, so wall time with a transfer sync
    is the right measurement (tunnel overhead <2% — matches bench.py's
    covo_offline precompute row)."""
    import time

    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.parallel import (
        make_distributed_offline_schedule,
        make_mesh,
    )
    from covo_mpc_tpu.solvers import get_solver

    params = env.default_params
    _, _, state = env.reset_env(jax.random.PRNGKey(0), params)
    solver, cp0 = get_solver(
        env, "covo_offline", f"N{args.n}_H{args.h}_lam{args.lam}",
        rng_mode=sampling.FAST, hessian_mode="adjoint",
        collect_debug=False, sigma_mode="ns",
    )
    key = jax.random.PRNGKey(7)

    rows = []
    for s in shard_counts:
        if s == 1:
            sched = lambda: solver.reset(state, params, cp0, key)
        else:
            dist = make_distributed_offline_schedule(
                solver,
                make_mesh(samples=s, scenarios=1, devices=jax.devices()[:s]),
            )
            sched = lambda: dist(state, params, cp0, key)
        float(jnp.sum(sched().a_cov_offline))  # compile + sync
        t0 = time.time()
        float(jnp.sum(sched().a_cov_offline))  # sync via transfer (axon)
        dt = time.time() - t0
        rows.append({
            "axis": "offline_schedule",
            "shards": s,
            "precompute_s": dt,
        })
        print(
            f"[mesh] covo_offline schedule H={args.h} shards={s}: "
            f"{dt:6.3f} s precompute",
            file=sys.stderr,
        )

    base = rows[0]
    for r in rows:
        speedup = base["precompute_s"] / r["precompute_s"]
        r["speedup_vs_1shard"] = speedup
        r["scaling_efficiency"] = speedup / (r["shards"] / base["shards"])
    return rows


def bench_pipeline(env, args):
    """Latency pipelining: one control loop's solve rate with act and
    Σ-design overlapped on two chips — 1/max(act, design) instead of the
    single-chip speculative's 1/(act + design) (parallel/pipeline.py)."""
    from covo_mpc_tpu.models.structs import pack_state
    from covo_mpc_tpu.parallel import (
        make_init_factor,
        make_pipeline_mesh,
        make_pipeline_step,
    )
    from covo_mpc_tpu.solvers import hover_sequence

    params = env.default_params
    _, _, state = env.reset_env(jax.random.PRNGKey(0), params)
    x0 = pack_state(state)
    a_mean0 = hover_sequence(env, args.h)
    engine, interpret = resolve_engine(args.engine, args.n)
    rng_mode = args.rng if engine == "pallas" else "invariant"
    mesh = make_pipeline_mesh(jax.devices()[:2])
    step = make_pipeline_step(
        env, mesh, N=args.n, H=args.h, lam=args.lam,
        engine=engine, interpret=interpret, rng=rng_mode,
    )
    factor0 = make_init_factor(
        env, args.h,
        hessian_primal="pallas_interpret" if interpret
        else "pallas" if engine == "pallas" else "scan",
    )(x0, state.time, state.pos_traj, state.vel_traj, a_mean0, params,
      jax.random.PRNGKey(4))

    def make_run(length):
        def one(carry, _):
            a_mean, factor, rng = carry
            rng, sub = jax.random.split(rng)
            a_mean, factor, mc = step(
                x0, state.time, state.pos_traj, state.vel_traj,
                a_mean, factor, params, sub,
            )
            return (a_mean, factor, rng), mc

        @jax.jit
        def run(i):
            key = jax.random.fold_in(jax.random.PRNGKey(5), i)
            (a, f, _), outs = lax.scan(
                one, (a_mean0, factor0, key), None, length=length
            )
            return jnp.sum(a) + jnp.sum(f) + jnp.sum(outs)

        return run

    per_step, overhead = measure(make_run, k=args.k)
    row = {
        "axis": "pipe",
        "chips": 2,
        "rng": rng_mode,
        "engine": engine + ("/interpret" if interpret else ""),
        "ms_per_step": per_step * 1e3,
        "solves_per_s": 1.0 / per_step,
    }
    print(
        f"[mesh] covo speculative pipeline N={args.n} H={args.h} chips=2 "
        f"({row['engine']}): {per_step*1e3:7.3f} ms/step -> "
        f"{1.0/per_step:8.1f} solves/s "
        f"(dispatch overhead {overhead*1e3:.1f} ms)",
        file=sys.stderr,
    )
    return [row]


def emit_metrics_episode(env, args, shards, path, steps=32):
    """Run a short control episode of distributed CoVO solves with
    collect_metrics=True and write one JSONL health record per solve
    (SURVEY §5 metrics row on the distributed path — the single-chip
    counterpart is `cli.py --metrics`). Returns the stacked metric arrays.
    """
    from covo_mpc_tpu.models.structs import pack_state
    from covo_mpc_tpu.parallel import make_mesh
    from covo_mpc_tpu.parallel.sharded import make_distributed_covo_solve
    from covo_mpc_tpu.runtime.metrics import MetricsLogger
    from covo_mpc_tpu.solvers import hover_sequence

    params = env.default_params
    _, _, state = env.reset_env(jax.random.PRNGKey(0), params)
    x0 = pack_state(state)
    engine, interpret = resolve_engine(args.engine, args.n // shards)
    rng_mode = args.rng if engine == "pallas" else "invariant"
    mesh = make_mesh(samples=shards, scenarios=1,
                     devices=jax.devices()[:shards])
    solve = make_distributed_covo_solve(
        env, mesh, N=args.n, H=args.h, lam=args.lam,
        engine=engine, interpret=interpret, rng=rng_mode,
        collect_metrics=True,
    )

    def one(carry, _):
        a_mean, rng = carry
        rng, sub = jax.random.split(rng)
        a_mean, min_cost, metrics = solve(
            x0, state.time, state.pos_traj, state.vel_traj,
            a_mean, params, sub,
        )
        return (a_mean, rng), metrics

    _, metrics = jax.jit(
        lambda: lax.scan(one, (hover_sequence(env, args.h),
                               jax.random.PRNGKey(11)), None, length=steps)
    )()
    logger = MetricsLogger(path)
    for t in range(steps):
        logger.log(step=t, shards=shards,
                   **{k: v[t] for k, v in metrics.items()})
    logger.close()
    print(f"[mesh] wrote {steps} per-solve health records "
          f"(shards={shards}) to {path}", file=sys.stderr)
    return metrics


def main():
    args = parse_args()
    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.cpu:
        # env var alone is not enough on this machine — sitecustomize
        # registers the remote TPU backend in every process
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        from covo_mpc_tpu.parallel.distributed import initialize_distributed

        pid = initialize_distributed()
        print(f"[mesh] multi-host process {pid} up, "
              f"{len(jax.devices())} global devices", file=sys.stderr)
    n_dev = len(jax.devices())
    backend = jax.default_backend()
    print(
        f"[mesh] backend={backend} devices={n_dev}"
        + (" (CPU: plumbing-only numbers, not TPU performance)"
           if backend != "tpu" else ""),
        file=sys.stderr,
    )
    env = make_env()

    if args.samples:
        shard_counts = [args.samples]
        if args.samples > 1:
            shard_counts = [1, args.samples]
    else:
        shard_counts, s = [], 1
        while s <= n_dev:
            shard_counts.append(s)
            s *= 2
    rows = bench_sample_sharding(env, args, shard_counts)

    if args.scenarios:
        B = args.b or args.scenarios
        rows += bench_scenario_dp(env, args, args.scenarios, B)

    if args.offline:
        rows += bench_offline_schedule(env, args, shard_counts)

    if args.pipeline:
        if n_dev < 2:
            print("[mesh] --pipeline needs two devices; skipping",
                  file=sys.stderr)
        else:
            rows += bench_pipeline(env, args)

    if args.metrics:
        emit_metrics_episode(env, args, shard_counts[-1], args.metrics,
                             steps=args.metrics_steps)

    for r in rows:
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}))


if __name__ == "__main__":
    main()

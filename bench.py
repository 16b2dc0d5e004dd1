#!/usr/bin/env python
"""Benchmark: CoVO-online MPC solve rate per chip on the flagship config.

Config (BASELINE.json #4): tracking_zigzag, N=8192 samples, H=32, lam=0.01,
fast sampler, fwd-over-rev Hessian. One full solve = cost-Hessian + eigh
Σ-design + joint sampling + 8192x32 rollouts + weighted update.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": solves/s/chip, "unit": "solves/s",
   "vs_baseline": value / 500}
vs_baseline is against the 500 solves/s/chip north star (BASELINE.json —
the reference publishes no timing numbers; 500/s = 25x the 50 Hz real-time
control budget the platform implies).

Secondary detail (per-stage latency, MPPI rate, p50/p99) goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _time_fn(fn, iters: int, *args):
    """Median / p99 latency of fn over `iters` blocking calls, seconds."""
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(jax.random.PRNGKey(100), i), *args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
    return p50, p99


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--controller", default="covo_online")
    args = ap.parse_args()

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.ops import covariance, sampling
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag",
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    pstr = f"N{args.n}_H{args.h}_lam0.01"
    solver, control_params = get_solver(
        env,
        args.controller,
        pstr,
        rng_mode=sampling.FAST,
        hessian_mode=covariance.FWD_FWD,
        collect_debug=False,
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)

    @jax.jit
    def solve(key, control_params, state, info):
        action, control_params, _ = solver(
            obs, state, params, key, control_params, info
        )
        return action, control_params.a_mean

    print(
        f"[bench] device={jax.devices()[0]} controller={args.controller} "
        f"N={args.n} H={args.h}",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    jax.block_until_ready(solve(jax.random.PRNGKey(9), control_params, state, info))
    print(f"[bench] compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    p50, p99 = _time_fn(solve, args.iters, control_params, state, info)
    solves_per_s = 1.0 / p50
    print(
        f"[bench] p50={p50*1e3:.2f}ms p99={p99*1e3:.2f}ms "
        f"-> {solves_per_s:.1f} solves/s/chip "
        f"(real-time budget 20ms: {'PASS' if p50 < 0.02 else 'FAIL'})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"{args.controller}_solves_per_s_chip_N{args.n}_H{args.h}",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profile-backed roofline + true per-solve latency tail (round-4 verdict
items 2+3).

Captures a jax.profiler device trace of chained flagship solves
(covo_online gn+kernel-rng and mppi kernel-rng, the two headline modes)
and derives, from DEVICE timestamps (the tunnel RTT never touches them):

  * per-HLO stage table: measured kernel/fusion times, FLOP/s and
    bytes/s vs the chip peaks — replaces DESIGN.md §5's back-of-envelope
    speed-of-light arithmetic with measured numbers;
  * the TRUE per-solve duration distribution, segmented at the
    once-per-solve rollout-kernel launch — the honest p50/p99 that the
    chain-mean percentiles in bench.py (now labelled chain_mean_*)
    structurally dilute ~K-fold.

Writes results/roofline_<mode>.json; prints a markdown table for
DESIGN.md §5.

Usage: python -u scripts/roofline.py [--k 256] [--iters 8] [--modes covo mppi]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# TPU v5e (v5 lite) single-chip peaks, public spec: 394 bf16 TFLOP/s
# (MXU), ~197 fp32-accum; HBM 819 GB/s. VPU fp32: 8 lanes x 128 sublanes
# x 4 ALUs x ~0.94 GHz ~= 3.8e12 elementwise ops/s ceiling.
PEAK_HBM_GBS = 819.0
PEAK_MXU_TFLOPS = 197.0


def build(mode, n, h):
    import jax

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag", enable_randomizer=False,
            disturb_type="gaussian", disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    name, hessian = {
        "covo": ("covo_online", "gn"),
        "mppi": ("mppi", "adjoint"),
    }[mode]
    solver, cp = get_solver(
        env, name, f"N{n}_H{h}_lam0.01", rng_mode="kernel",
        hessian_mode=hessian, collect_debug=False, engine="pallas",
        sigma_mode="ns",
    )
    return env, solver, cp, obs, info, state, params


def make_chain(solver, obs, info, state, params, k):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def one(carry, _):
        cp, key = carry
        key, k_act = jax.random.split(key)
        action, cp, _ = solver(obs, state, params, k_act, cp, info)
        return (cp, key), action[0]

    @jax.jit
    def run(cp, key):
        (cp, _), outs = lax.scan(one, (cp, key), None, length=k)
        acc = sum(
            jnp.sum(leaf)
            for leaf in jax.tree.leaves(cp)
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        )
        return acc + jnp.sum(outs)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=256, help="solves per dispatch")
    ap.add_argument("--iters", type=int, default=8, help="traced dispatches")
    ap.add_argument("--modes", nargs="+", default=["covo", "mppi"])
    ap.add_argument("--marker", default="auto",
                    help="once-per-solve marker HLO substring; 'auto' picks "
                         "the largest custom-call firing exactly once/solve")
    ap.add_argument("--trace-root", default="/tmp/covo_roofline")
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--dump-names", action="store_true",
                    help="print all HLO names (marker discovery)")
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import os

    import jax
    import numpy as np

    from covo_mpc_tpu.runtime.profiling import (
        hlo_summary,
        load_device_trace,
        per_solve_distribution,
        step_durations,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    print(f"[roofline] device={jax.devices()[0]}", file=sys.stderr)

    for mode in args.modes:
        env, solver, cp, obs, info, state, params = build(mode, args.n, args.h)
        run = make_chain(solver, obs, info, state, params, args.k)
        float(run(cp, jax.random.PRNGKey(1)))  # compile + warm (sync=transfer)
        tdir = f"{args.trace_root}_{mode}"
        t0 = time.time()
        with jax.profiler.trace(tdir):
            for i in range(args.iters):
                float(run(cp, jax.random.fold_in(jax.random.PRNGKey(2), i)))
        print(f"[roofline] {mode}: traced {args.iters}x{args.k} solves "
              f"({time.time()-t0:.1f}s wall)", file=sys.stderr)

        hlos, modules = load_device_trace(tdir)
        rows = hlo_summary(hlos, top=999)
        if args.dump_names:
            for r in rows:
                print(f"  {r['total_us']:10.1f} us x{r['count']:6d} "
                      f"[{r['category']:>22s}] {r['name'][:70]}",
                      file=sys.stderr)

        n_solves = args.iters * args.k
        # leaf HLOs only: while/conditional wrappers CONTAIN their body
        # HLOs' time (summing both double-counts the loop bodies)
        total_us = sum(r["total_us"] for r in rows
                       if r["category"] not in ("while", "conditional"))
        # module-level wall (includes inter-HLO gaps XLA couldn't overlap)
        mod_us = sum(m["dur_us"] for m in modules if m["name"].startswith("jit_run"))
        per_solve_sum = total_us / n_solves
        per_solve_wall = mod_us / n_solves if mod_us else float("nan")

        # true per-solve distribution, segmented at the once-per-solve
        # flagship kernel launch: the LARGEST custom-call that fires
        # exactly once per solve (substring markers over-match when a
        # solve launches several pallas kernels)
        try:
            if args.marker == "auto":
                d = per_solve_distribution(hlos, n_solves)
            else:
                deltas = step_durations(hlos, args.marker)
                pct = lambda q: float(np.percentile(deltas, q))
                d = {"marker": args.marker, "p50": pct(50), "p90": pct(90),
                     "p99": pct(99), "max": float(deltas.max()),
                     "n": int(len(deltas))}
            dist = {"marker": d["marker"], "n": d["n"],
                    **{f"{k}_ms": d[k] * 1e3
                       for k in ("p50", "p90", "p99", "max")}}
        except ValueError as e:
            dist = {"error": str(e)}

        top_rows = hlo_summary(hlos, top=14)
        print(f"\n[{mode}] per-solve: HLO-sum {per_solve_sum*1e-3:.4f} ms, "
              f"module-wall {per_solve_wall*1e-3:.4f} ms; "
              f"marker-segmented {dist}", file=sys.stderr)
        print(f"| op | category | calls/solve | us/solve | TFLOP/s | GB/s | "
              f"% peak |", file=sys.stderr)
        print("|---|---|---|---|---|---|---|", file=sys.stderr)
        for r in top_rows:
            upct = max(r["tflops_per_s"] / PEAK_MXU_TFLOPS,
                       r["gbytes_per_s"] / PEAK_HBM_GBS) * 100
            print(
                f"| {r['name'][:42]} | {r['category']} | "
                f"{r['count']/n_solves:.2f} | "
                f"{r['total_us']/n_solves:6.2f} | "
                f"{r['tflops_per_s']:.2f} | {r['gbytes_per_s']:.1f} | "
                f"{upct:.0f}% |",
                file=sys.stderr,
            )

        out = {
            "mode": mode, "n": args.n, "h": args.h,
            "chain": args.k, "iters": args.iters,
            "per_solve_hlo_sum_ms": per_solve_sum * 1e-3,
            "per_solve_module_wall_ms": per_solve_wall * 1e-3,
            "per_solve_distribution": dist,
            "peaks": {"hbm_gbs": PEAK_HBM_GBS, "mxu_tflops": PEAK_MXU_TFLOPS},
            "top_hlos": top_rows,
        }
        path = os.path.join(args.out_dir, f"roofline_{mode}.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"[roofline] wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

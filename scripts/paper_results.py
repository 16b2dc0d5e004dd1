#!/usr/bin/env python
"""Reproduce the paper's headline comparison on TPU.

Runs the reference evaluation protocol (40 episodes = 4 fixed trajectories
x 10 reps, tracking error in cm; reference: quadjax/envs/quadrotor.py:
506-591, scripts/covo_quadrotor.sh) for PID / MPPI / CoVO-online /
CoVO-offline on tracking_zigzag without domain randomization, and writes
RESULTS.md. The paper (arXiv:2401.07369) reports CoVO beating MPPI by
43-54% on tracking cost.

Each controller row runs SUPERVISED (runtime/supervisor.py): finished
rows are memoized in <checkpoint-root>/cells.json and the in-flight row
checkpoints per episode chunk, so a tunnel drop mid-table resumes
instead of restarting. --fresh forces re-measurement, --unsupervised
restores bare evaluate().

Usage: python scripts/paper_results.py [--n 8192] [--h 32] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--task", default="tracking_zigzag")
    ap.add_argument("--disturb-type", default="gaussian",
                    choices=["gaussian", "none", "sin", "periodic", "drag",
                             "mixed"])
    ap.add_argument("--quick", action="store_true",
                    help="1 rep per trajectory instead of 10")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--controllers", nargs="+",
                    default=["pid", "mppi", "covo_online", "covo_offline"])
    ap.add_argument("--engine", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--sigma-mode", default="ns", choices=["eigh", "ns", "ns_pallas"])
    ap.add_argument("--rng", default="fast", choices=["fast", "invariant", "kernel"],
                    help="sampler mode for the sampled controllers (kernel = "
                         "in-kernel TPU-PRNG draw; quality-gates that mode)")
    ap.add_argument("--hessian-mode", default="adjoint",
                    choices=["fwd_fwd", "fwd_rev", "sensitivity", "adjoint", "gn"],
                    help="CoVO Hessian estimator (gn = Gauss-Newton "
                         "approximation; quality-gates that mode)")
    ap.add_argument("--checkpoint-root", default="results/ckpt_paper")
    ap.add_argument("--fresh", action="store_true",
                    help="discard memoized cells (force re-measurement)")
    ap.add_argument("--unsupervised", action="store_true",
                    help="bare evaluate() per cell (no checkpoint/resume)")
    args = ap.parse_args()

    import jax

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.runtime import CellStore, evaluate, run_supervised
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task=args.task,
            enable_randomizer=False,
            disturb_type=args.disturb_type,
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    total_steps = 300 * 4 * (1 if args.quick else 10)
    pstr = f"N{args.n}_H{args.h}_lam0.01"

    store = None if args.unsupervised else CellStore(args.checkpoint_root)
    rows = []
    for name in args.controllers:
        sampled = name != "pid"
        solver, _ = get_solver(
            env, name, pstr, rng_mode=args.rng if sampled else sampling.FAST,
            hessian_mode=args.hessian_mode if "covo" in name else "fwd_fwd",
            collect_debug=False,
            engine=args.engine if sampled else "jnp",
            sigma_mode=args.sigma_mode,
        )
        fp = (f"{args.task}/{name}/{pstr}/{args.rng}/{args.hessian_mode}/"
              f"{args.engine}/{args.sigma_mode}/{args.disturb_type}/"
              f"steps={total_steps}")

        def cell(ckpt_dir, solver=solver, fp=fp):
            t0 = time.time()
            res = run_supervised(
                env, solver, total_steps=total_steps,
                checkpoint_dir=ckpt_dir, chunk_episodes=4, fingerprint=fp,
            )
            return [res.mean * 100, res.std * 100, time.time() - t0]

        if store is None:
            t0 = time.time()
            res = evaluate(env, solver, total_steps=total_steps)
            rec, cached = [res.mean * 100, res.std * 100,
                           time.time() - t0], False
        else:
            key = f"{name}_{args.task}_{args.disturb_type}"
            if args.fresh:
                store.drop(key, clear_checkpoint=True)
            rec, cached = store.run_cell(key, fp, cell)
        rows.append((name, rec[0], rec[1], rec[2]))
        print(f"{name:14s} err_pos = {rec[0]:6.2f} +/- {rec[1]:5.2f} cm"
              f"  (eval wall {rec[2]:.0f}s{', cached' if cached else ''})",
              file=sys.stderr)

    mppi = next((r for r in rows if r[0] == "mppi"), None)
    lines = [
        f"# Results — {args.task}, N={args.n}, H={args.h}, lam=0.01, noDR"
        + (f", disturb={args.disturb_type}"
           if args.disturb_type != "gaussian" else ""),
        "",
        f"Protocol: {total_steps//300} episodes = 4 fixed trajectories x "
        f"{total_steps//1200} reps x 300 steps @ 50 Hz "
        "(reference: quadrotor.py:506-591). Error = mean ||pos - pos_tar|| "
        "over the episode, in cm. Device: "
        f"{jax.devices()[0]}. Fast path: engine={args.engine}, "
        f"sigma_mode={args.sigma_mode}, {args.hessian_mode} Hessian, "
        f"{args.rng} sampler.",
        "",
        "| controller | err_pos (cm) | vs MPPI |",
        "|---|---|---|",
    ]
    for name, mean, std, wall in rows:
        rel = f"{(1 - mean / mppi[1]) * 100:+.1f}%" if mppi and name != "mppi" else "—"
        lines.append(f"| {name} | {mean:.2f} ± {std:.2f} | {rel} |")
    lines += [
        "",
        "The paper (arXiv:2401.07369) reports CoVO-MPC improving tracking "
        "cost 43-54% over MPPI. Solve throughput for this configuration is "
        "in `bench.py` / DESIGN.md §5; the N-ablation in RESULTS_N.md.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({r[0]: round(r[1], 2) for r in rows}))


if __name__ == "__main__":
    main()

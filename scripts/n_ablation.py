#!/usr/bin/env python
"""Sample-count ablation (the paper's second experiment).

Sweeps N in {16, 32, 64, 128, 256, 512, 1024} at H=32, lam=0.01 over
{mppi, covo_online, covo_offline} on tracking_zigzag without domain
randomization (reference: quadjax/scripts/covo_quadrotor_N.sh:1-12) and
writes RESULTS_N.md. The paper's claim: CoVO's advantage over MPPI grows
as the sample budget shrinks (optimal Σ matters most when samples are
scarce).

Runs the fused Pallas rollout engine at every N on TPU (ragged sample
counts are tile-padded by the kernel) — the same engine the flagship
benchmark uses, so quality and throughput claims share one code path.

The 21-cell sweep is hours of TPU time; every cell runs SUPERVISED
(runtime/supervisor.py — finished cells memoized in
<checkpoint-root>/cells.json, in-flight cell checkpointed per episode
chunk), so a tunnel drop mid-sweep resumes instead of restarting.
--fresh forces re-measurement, --unsupervised restores bare evaluate().

Usage: python scripts/n_ablation.py [--quick] [--ns 16 64 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", nargs="+", type=int,
                    default=[16, 32, 64, 128, 256, 512, 1024])
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--task", default="tracking_zigzag")
    ap.add_argument("--quick", action="store_true",
                    help="1 rep per trajectory instead of 10")
    ap.add_argument("--out", default="RESULTS_N.md")
    ap.add_argument("--controllers", nargs="+",
                    default=["mppi", "covo_online", "covo_offline"])
    ap.add_argument("--checkpoint-root", default="results/ckpt_n_ablation")
    ap.add_argument("--fresh", action="store_true",
                    help="discard memoized cells (force re-measurement)")
    ap.add_argument("--unsupervised", action="store_true",
                    help="bare evaluate() per cell (no checkpoint/resume)")
    args = ap.parse_args()

    import jax

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.ops import sampling
    from covo_mpc_tpu.runtime import CellStore, evaluate, run_supervised
    from covo_mpc_tpu.solvers import get_solver

    env = QuadEnv(
        EnvConfig(
            task=args.task,
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    total_steps = 300 * 4 * (1 if args.quick else 10)

    store = None if args.unsupervised else CellStore(args.checkpoint_root)
    results = {}
    for n in args.ns:
        for name in args.controllers:
            solver, _ = get_solver(
                env, name, f"N{n}_H{args.h}_lam0.01", rng_mode=sampling.FAST,
                hessian_mode="adjoint" if "covo" in name else "fwd_fwd",
                collect_debug=False, sigma_mode="ns" if "covo" in name else "eigh",
                engine="auto",
            )
            fp = (f"{args.task}/{name}/N{n}_H{args.h}/fast/auto/"
                  f"steps={total_steps}")

            def cell(ckpt_dir, solver=solver, fp=fp):
                res = run_supervised(
                    env, solver, total_steps=total_steps,
                    checkpoint_dir=ckpt_dir, chunk_episodes=4,
                    fingerprint=fp,
                )
                return [res.mean * 100, res.std * 100]

            t0 = time.time()
            if store is None:
                res = evaluate(env, solver, total_steps=total_steps)
                rec, cached = [res.mean * 100, res.std * 100], False
            else:
                key = f"N{n}_{name}"
                if args.fresh:
                    store.drop(key, clear_checkpoint=True)
                rec, cached = store.run_cell(key, fp, cell)
            results[(n, name)] = tuple(rec)
            print(
                f"N={n:5d} {name:14s} err_pos = {rec[0]:6.2f} "
                f"+/- {rec[1]:5.2f} cm  ({time.time()-t0:.0f}s"
                f"{', cached' if cached else ''})",
                file=sys.stderr,
            )

    lines = [
        f"# N-ablation — {args.task}, H={args.h}, lam=0.01, noDR",
        "",
        f"Protocol: {total_steps//300} episodes per cell "
        "(reference sweep: scripts/covo_quadrotor_N.sh). err_pos in cm, "
        f"mean ± std over episodes. Device: {jax.devices()[0]}. "
        "engine=auto (fused Pallas kernel on TPU at every N — ragged "
        "sample counts tile-padded), adjoint Hessian, ns designer, fast "
        "sampler.",
        "",
        "| N | " + " | ".join(args.controllers) + " | CoVO-on vs MPPI |",
        "|---|" + "---|" * (len(args.controllers) + 1),
    ]
    for n in args.ns:
        cells = [f"{results[(n, c)][0]:.2f} ± {results[(n, c)][1]:.2f}"
                 for c in args.controllers]
        rel = "—"
        if ("mppi" in args.controllers and "covo_online" in args.controllers):
            m, c = results[(n, "mppi")][0], results[(n, "covo_online")][0]
            rel = f"{(1 - c / m) * 100:+.1f}%"
        lines.append(f"| {n} | " + " | ".join(cells) + f" | {rel} |")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({f"N{n}_{c}": round(v[0], 2)
                      for (n, c), v in results.items()}))


if __name__ == "__main__":
    main()

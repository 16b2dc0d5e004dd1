#!/usr/bin/env python
"""Quality gates for the non-parity speed modes, on the full eval protocol.

Every speed mode bench.py advertises (in-kernel TPU-PRNG sampling,
Gauss-Newton Hessian, the speculative act/design pipeline) must carry an
err_pos measured under the reference's 40-episode protocol (reference:
quadjax/envs/quadrotor.py:564-579) before its throughput number counts.
This script runs the mode matrix and rewrites the "Speed-mode quality
gates" section of RESULTS.md between marker comments (idempotent).

The matrix is hours of TPU time on this box and the tunnel drops for
hours at a stretch (CLAUDE.md), so every cell runs SUPERVISED
(runtime/supervisor.py): finished cells are memoized in
<checkpoint-root>/cells.json and the in-flight cell checkpoints every
chunk — kill the process anywhere and re-running the same command
resumes without recomputing a finished episode. --fresh discards the
memo AND each cell's episode-level checkpoint (a full re-measurement
from episode 0 — a kept checkpoint of a completed run would otherwise
just resume-at-end); --unsupervised restores the bare evaluate() path.

Usage: python -u scripts/mode_gates.py [--quick] [--n 8192] [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

sys.path.insert(0, ".")

BEGIN = "<!-- mode-gates:begin -->"
END = "<!-- mode-gates:end -->"


def run_matrix(args):
    import jax

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
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

    # (tag, controller, rng_mode, hessian_mode, N)
    matrix = [
        ("mppi fast (anchor)", "mppi", "fast", "adjoint", args.n),
        ("mppi kernel-rng", "mppi", "kernel", "adjoint", args.n),
        ("covo adjoint+kernel-rng", "covo_online", "kernel", "adjoint", args.n),
        ("covo gn", "covo_online", "fast", "gn", args.n),
        ("covo gn+kernel-rng", "covo_online", "kernel", "gn", args.n),
        ("covo speculative", "covo_speculative", "fast", "adjoint", args.n),
        # one N-ablation point for the fastest composite mode
        ("mppi kernel-rng N=1024", "mppi", "kernel", "adjoint", 1024),
        ("covo gn+kernel-rng N=1024", "covo_online", "kernel", "gn", 1024),
    ]

    store = None if args.unsupervised else CellStore(args.checkpoint_root)
    rows = []
    for tag, name, rng, hmode, n in matrix:
        pstr = f"N{n}_H{args.h}_lam0.01"
        solver, _ = get_solver(
            env, name, pstr, rng_mode=rng, hessian_mode=hmode,
            collect_debug=False, engine=args.engine, sigma_mode=args.sigma_mode,
        )
        fp = (f"{args.task}/{name}/{pstr}/{rng}/{hmode}/{args.engine}/"
              f"{args.sigma_mode}/steps={total_steps}")

        def cell(ckpt_dir, solver=solver, fp=fp):
            t0 = time.time()
            res = run_supervised(
                env, solver, total_steps=total_steps,
                checkpoint_dir=ckpt_dir, chunk_episodes=4, fingerprint=fp,
            )
            return dict(mean=res.mean * 100, std=res.std * 100,
                        wall=time.time() - t0,
                        failed=int(res.failed.sum()))

        if store is None:
            t0 = time.time()
            res = evaluate(env, solver, total_steps=total_steps)
            rec, cached = dict(mean=res.mean * 100, std=res.std * 100,
                               wall=time.time() - t0, failed=0), False
        else:
            key = f"{name}_N{n}_{rng}_{hmode}"
            if args.fresh:
                store.drop(key, clear_checkpoint=True)
            rec, cached = store.run_cell(key, fp, cell)
        rows.append(dict(tag=tag, name=name, rng=rng, hessian=hmode, n=n,
                         **rec))
        print(f"{tag:28s} err_pos = {rec['mean']:6.2f} +/- "
              f"{rec['std']:5.2f} cm  (wall {rec['wall']:.0f}s"
              f"{', cached' if cached else ''}"
              f"{', %d ep FAILED' % rec['failed'] if rec['failed'] else ''})",
              file=sys.stderr, flush=True)
    return rows, total_steps, str(jax.devices()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--task", default="tracking_zigzag")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "pallas_interpret", "jnp"])
    ap.add_argument("--sigma-mode", default="ns")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--json", default="results_mode_gates.json")
    ap.add_argument("--checkpoint-root", default="results/ckpt_mode_gates",
                    help="CellStore root: finished cells memoized, "
                         "in-flight cell checkpointed per 4-episode chunk")
    ap.add_argument("--fresh", action="store_true",
                    help="discard memoized cells (force re-measurement)")
    ap.add_argument("--unsupervised", action="store_true",
                    help="bare evaluate() per cell (no checkpoint/resume)")
    args = ap.parse_args()

    rows, total_steps, device = run_matrix(args)
    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1)

    anchor = next(r for r in rows if r["tag"].startswith("mppi fast"))

    lines = [
        BEGIN,
        "## Speed-mode quality gates (full 40-episode protocol)",
        "",
        f"Same protocol as above ({total_steps//300} episodes, "
        f"tracking_zigzag, H={args.h}, lam=0.01, noDR, engine={args.engine}, "
        f"sigma_mode={args.sigma_mode}); device {device}. Each non-parity "
        "speed mode advertised by bench.py, gated on tracking quality. "
        "'vs MPPI' compares against the same-run fast-sampler MPPI anchor.",
        "",
        "| mode | N | err_pos (cm) | vs MPPI |",
        "|---|---|---|---|",
    ]
    for r in rows:
        if r["n"] == args.n:
            rel = (
                "anchor" if r is anchor
                else f"{(1 - r['mean'] / anchor['mean']) * 100:+.1f}%"
            )
        else:
            rel = "(N-ablation)"
        lines.append(
            f"| {r['tag']} | {r['n']} | {r['mean']:.2f} ± {r['std']:.2f} | {rel} |"
        )
    lines += [
        "",
        f"Raw rows: `{args.json}` (includes per-run wall time).",
        END,
    ]
    section = "\n".join(lines)

    with open(args.out) as f:
        doc = f.read()
    if BEGIN in doc:
        doc = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), section,
                     doc, flags=re.S)
    else:
        doc = doc.rstrip("\n") + "\n\n" + section + "\n"
    with open(args.out, "w") as f:
        f.write(doc)
    print(json.dumps({r["tag"]: round(r["mean"], 2) for r in rows}))


if __name__ == "__main__":
    main()

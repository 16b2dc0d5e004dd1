#!/usr/bin/env python
"""Transcendental-diet ceilings for the fused rollout kernel (round-4
verdict item 4a, the one kernel A/B sub-item without a recorded number).

Per sample-step the penyaw cost model spends: 1 log (the multi-scale
log_pos barrier), 1 polynomial atan2 (+1 divide), 2 sqrt (norms); the
kernel-rng sampling adds 2 log + 2 sqrt + 2 sincos per 4-dim draw
(Box-Muller). This harness measures the CEILING of removing the reward's
transcendentals by timing-only stubs (invalid semantics — a realized
diet would need a quality re-gate), trace-walled at full-solve level
like scripts/kernel_ab.py:

  full          the shipping solve
  lin_log       log_pos_penalty's log1p replaced by a linear ramp —
                ceiling of a polynomial log-barrier replacement
  const_reward  penyaw_reward replaced by a 3-op quadratic — ceiling of
                the ENTIRE reward stage (norms+log+atan2+clips)

Usage: python -u scripts/transcendental_ab.py [--mode mppi|covo] [--k 256]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mppi", choices=["mppi", "covo"])
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "lin_log", "const_reward"])
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from covo_mpc_tpu.models import scalar_core
    from scripts.kernel_ab import trace_wall
    from scripts.roofline import build, make_chain

    orig_barrier = scalar_core.log_pos_penalty
    orig_penyaw = scalar_core.penyaw_reward

    def lin_barrier(err_pos):
        # timing-only: same op count as one clip term, no log
        return err_pos * 0.4 + jnp.clip(err_pos * 4.0, 0.0, 1.0) * 0.8

    def quad_reward(pos, vel, quat, pos_tar, vel_tar, atan2=None, norm=None):
        ex = pos_tar[0] - pos[0]
        ey = pos_tar[1] - pos[1]
        ez = pos_tar[2] - pos[2]
        return 1.3 - (ex * ex + ey * ey + ez * ez) * 0.1

    rows = []
    for variant in args.variants:
        if variant == "lin_log":
            scalar_core.log_pos_penalty = lin_barrier
        elif variant == "const_reward":
            scalar_core.penyaw_reward = quad_reward
        try:
            env, solver, cp, obs, info, state, params = build(
                args.mode, args.n, args.h
            )
            run = make_chain(solver, obs, info, state, params, args.k)
            ms, wname = trace_wall(
                run, cp, args.k, args.iters,
                f"/tmp/transc_ab_{args.mode}_{variant}")
        finally:
            scalar_core.log_pos_penalty = orig_barrier
            scalar_core.penyaw_reward = orig_penyaw
        rows.append((variant, ms))
        print(f"[transc-ab] {args.mode} {variant:12s}: {ms*1e3:7.2f} "
              f"us/solve (trace wall, {wname})", file=sys.stderr, flush=True)

    full = dict(rows)["full"]
    print(json.dumps({
        "mode": args.mode, "n": args.n, "h": args.h, "chain": args.k,
        "rows": [{"variant": v, "us_per_solve": round(ms * 1e3, 2),
                  "delta_vs_full_us": round((full - ms) * 1e3, 2)}
                 for v, ms in rows],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Fused-designer (sigma_mode="ns_pallas") re-measure under the r5 trace
method.

The fused single-kernel Σ-designer was declined in r2 on slope timing
("ties XLA, 0.245 vs 0.238 ms") — but that verdict predates both the
r3-r5 designer redesign (block-normalized extremes, certified ‖R‖_F
bound, quintic lift) and the r5 roofline, which found the remaining
headline headroom is ~0.8 µs/op ISSUE LATENCY on the designer's ~200-op
chain — "attackable only by moving whole stages into fewer kernels"
(DESIGN.md §5). ops/covariance_pallas.py IS that move and tracks the
current math exactly (equivalence-pinned in tests/test_covo.py), so this
harness re-runs the decision solve-level with device-trace walls:

  ns          the shipping XLA-side NS designer (headline)
  ns_pallas   the whole designer (extremes, both NS chains, elimination
              for logdet+factor) as ONE pallas launch

Usage: python -u scripts/sigma_pallas_ab.py [--k 256] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--modes", nargs="+", default=["ns", "ns_pallas"])
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.solvers import get_solver
    from scripts.kernel_ab import trace_wall
    from scripts.roofline import make_chain

    env = QuadEnv(
        EnvConfig(
            task="tracking_zigzag", enable_randomizer=False,
            disturb_type="gaussian", disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)

    rows = []
    for sm in args.modes:
        solver, cp = get_solver(
            env, "covo_online", f"N{args.n}_H{args.h}_lam0.01",
            rng_mode="kernel", hessian_mode="gn", collect_debug=False,
            engine="pallas", sigma_mode=sm,
        )
        run = make_chain(solver, obs, info, state, params, args.k)
        ms, wname = trace_wall(run, cp, args.k, args.iters,
                               f"/tmp/sigma_ab_{sm}")
        rows.append((sm, ms))
        print(f"[sigma-ab] covo gn+krng sigma_mode={sm:10s}: "
              f"{ms*1e3:7.2f} us/solve (trace wall, {wname})",
              file=sys.stderr, flush=True)

    base = dict(rows).get("ns")
    print(json.dumps({
        "mode": "covo_online gn+krng", "n": args.n, "h": args.h,
        "chain": args.k,
        "rows": [{"sigma_mode": sm, "us_per_solve": round(ms * 1e3, 2),
                  "delta_vs_ns_us":
                      round((base - ms) * 1e3, 2) if base else None}
                 for sm, ms in rows],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

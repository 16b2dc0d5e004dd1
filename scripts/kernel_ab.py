#!/usr/bin/env python
"""Rollout-kernel headroom A/B, measured from DEVICE-TRACE walls.

Round-4 verdict item 4: the fused rollout kernel + its per-solve prep is
the dominant cost of every fast path. This harness measures variants the
designer_ab way — stub one stage, measure the full solve — but with the
per-solve wall taken from the jax.profiler device trace (the while-loop
duration / chain length) instead of host-timed slopes: at K=32 the
tunnel's +-2 ms wobble is +-15-25% of a chained measurement, which is
HOW the round-3 "mppi 0.043 ms" phantom happened; the trace wall is
cycle-exact and bit-reproducible run to run.

Variants (timing-only stubs unless noted):
  full          the shipping solve
  const_traj    ptar/vtar window gather replaced by a constant
  const_table   disturbance table+draw+scal/ints prep replaced by consts
  const_prep    all SMEM operand prep constant (the hoisting ceiling)
  no_weights    weighted-mean update stubbed to a plain mean (ceiling of
                the softmax+reduce stage; NOT valid semantics)

Usage: python -u scripts/kernel_ab.py [--mode mppi|covo] [--k 256]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def trace_wall(run, cp, k, iters, tdir):
    """Per-solve device wall from the scan-while duration in a trace.

    Deliberately NOT runtime/profiling.time_trace: this variant also
    returns the chosen while-op's NAME (printed per variant so a stub
    that accidentally changes program structure is visible) and takes an
    explicit per-variant trace dir so all variants' traces survive for
    inspection."""
    import glob
    import os
    import shutil

    import jax
    import numpy as np

    from covo_mpc_tpu.runtime.profiling import load_device_trace

    if os.path.isdir(tdir):
        shutil.rmtree(tdir)
    float(run(cp, jax.random.PRNGKey(1)))  # compile + warm
    with jax.profiler.trace(tdir):
        for i in range(iters):
            float(run(cp, jax.random.fold_in(jax.random.PRNGKey(2), i)))
    hlos, modules = load_device_trace(tdir)
    # the outermost while (the K-solve scan) is the largest total-time
    # wrapper; its mean duration / K = per-solve wall
    whiles = {}
    for r in hlos:
        if r["name"].startswith("while"):
            a = whiles.setdefault(r["name"], [0.0, 0])
            a[0] += r["dur_us"]
            a[1] += 1
    name, (tot, cnt) = max(whiles.items(), key=lambda kv: kv[1][0])
    per_disp = np.array(
        [r["dur_us"] for r in hlos if r["name"] == name]
    )
    return float(np.mean(per_disp)) / k * 1e-3, name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mppi", choices=["mppi", "covo"])
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "const_traj", "const_table",
                             "const_prep", "no_weights"])
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from covo_mpc_tpu.ops import reductions
    from covo_mpc_tpu.ops import rollout_pallas as rp
    from scripts.roofline import build, make_chain

    env, solver, cp, obs, info, state, params = build(
        args.mode, args.n, args.h
    )
    orig_pack = rp._pack_kernel_inputs
    C = orig_pack(env, jnp.zeros(16), state.time, state.pos_traj,
                  state.vel_traj, params, jax.random.PRNGKey(0), False,
                  1.0, args.h)
    C = jax.tree.map(jnp.asarray, C)

    def const_variant(mask):
        def f(*a, **kw):
            out = list(orig_pack(*a, **kw))
            for i in mask:
                out[i] = C[i]
            return tuple(out)
        return f

    orig_mean_t = reductions.mean_update_t
    rows = []
    for variant in args.variants:
        if variant == "const_traj":
            rp._pack_kernel_inputs = const_variant((0, 1))
        elif variant == "const_table":
            rp._pack_kernel_inputs = const_variant((2, 3, 4))
        elif variant == "const_prep":
            rp._pack_kernel_inputs = const_variant((0, 1, 2, 3, 4))
        elif variant == "no_weights":
            reductions.mean_update_t = (
                lambda w, a_t, a_mean, gm: jnp.mean(a_t, axis=-1)
            )
        try:
            env2, solver2, cp2, obs2, info2, state2, params2 = build(
                args.mode, args.n, args.h
            )
            run = make_chain(solver2, obs2, info2, state2, params2, args.k)
            ms, wname = trace_wall(run, cp2, args.k, args.iters,
                                   f"/tmp/kernel_ab_{args.mode}_{variant}")
        finally:
            rp._pack_kernel_inputs = orig_pack
            reductions.mean_update_t = orig_mean_t
        rows.append((variant, ms))
        print(f"[kernel-ab] {args.mode} {variant:12s}: {ms*1e3:7.2f} us/solve "
              f"(trace wall, {wname})", file=sys.stderr, flush=True)

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

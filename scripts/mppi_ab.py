#!/usr/bin/env python
"""MPPI kernel-rng stage decomposition (round-4 follow-up).

The MPPI kernel-rng solve measures 0.084-0.086 ms vs the CoVO fast path's
0.066 ms base stage (sample+rollout+update with a GIVEN factor). The three
structural extras MPPI carries are measured here by solve-level stubbing,
same harness as scripts/designer_ab.py:

  full        the shipping MPPI kernel-rng solve
  det         deterministic rollouts (no in-kernel disturbance draws) —
              NOT valid semantics (reference rolls stochastically,
              mppi.py:69), timing only
  no_cov      covariance blend update stubbed (mean update kept).
              HISTORICAL: the 0.013 ms ceiling this variant measured was
              against the pre-r4 solve that always ran the blend; the
              shipped solve now skips it entirely via the gamma_sigma==0
              lax.cond (ops/reductions.py), which is what converted that
              ceiling into the 0.086->0.074 ms win. Today no_cov stubs a
              branch that never executes at the paper config, so it
              measures ~0 by construction — it stays only as a regression
              tripwire (a nonzero delta means the cond stopped firing).
  no_chol     the per-solve (H,4,4) batched Cholesky replaced by a
              constant factor — timing only. HISTORICAL since r5: the
              shipped solve carries the factor (MPPIParams.a_cov_chol,
              refreshed only inside the gamma_sigma>0 blend branch), so
              no per-solve Cholesky runs at the paper config and this
              variant measures ~0 — a regression tripwire like no_cov
              (a nonzero delta means the carried factor stopped
              covering the hot path). The 13.2 us ceiling it measured
              against the r4 code is what motivated the carry
              (device-trace verified 75 -> 62 us, scripts/kernel_ab.py).

Run on the TPU: python -u scripts/mppi_ab.py [--k 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from bench import measure_solve_rate
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
    pstr = f"N{args.n}_H{args.h}_lam0.01"

    def build():
        return get_solver(
            env, "mppi", pstr, rng_mode="kernel", collect_debug=False,
            engine="pallas",
        )

    rows = []
    for level in ("full", "det", "no_cov", "no_chol"):
        solver, cp = build()
        if level == "det":
            # stochastic -> deterministic rollouts: measures the in-kernel
            # per-step disturbance draws
            orig = solver.rollout_sampling

            def det_rs(*a, _orig=orig, **kw):
                kw["deterministic"] = True
                return _orig(*a, **kw)

            solver.rollout_sampling = det_rs
        elif level == "no_cov":
            from covo_mpc_tpu.ops import reductions

            orig_cov = reductions.cov_update_t
            reductions.cov_update_t = (
                lambda w, a_t, mean, cov, gamma: cov
            )
        elif level == "no_chol":
            chol0 = jnp.linalg.cholesky(cp.a_cov)
            orig_chol = jnp.linalg.cholesky
            jnp.linalg.cholesky = lambda x: chol0 + 0.0 * x
        t0 = time.time()
        try:
            per, _ = measure_solve_rate(
                solver, obs, state, params, info, cp, k=args.k,
                reps=args.reps,
            )
        finally:
            if level == "no_cov":
                reductions.cov_update_t = orig_cov
            elif level == "no_chol":
                jnp.linalg.cholesky = orig_chol
        rows.append((level, per))
        print(f"[mppi-ab] {level:8s}: {per*1e3:7.4f} ms/solve "
              f"({1/per:8.1f}/s)  [{time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    full = dict(rows)["full"]
    print("\nvariant, ms_per_solve, delta_vs_full_ms")
    for level, per in rows:
        print(f"{level}, {per*1e3:.4f}, {(full-per)*1e3:+.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Σ-designer warm-start ceiling A/B (round-3 verdict, Next #6).

Successive cost Hessians are temporally correlated, so the designer's
spectral-extreme estimation (λ_max pass, λ_min rough pass + rough-NS +
inverse refine — ~2/3 of its sequential matmul chain) could be warm-started
from the previous solve. Before building that machinery, measure its
CEILING: stub each extreme-estimation stage with compile-time constants
(zero estimation cost, identical downstream graph) and time the FULL
covo_online solve. The (full − stub) delta is the most ANY warm-start can
recover; per the round-3 lesson (CLAUDE.md: halving the NS chain bought
0.010 ms) only end-to-end solve deltas count.

Variants:
  full        the shipping optimize_sigma_ns
  no_lmax     λ_max pass stubbed (constant), λ_min machinery intact
  no_refine   rough-NS + inverse-refine skipped (λ_min = rough estimate)
  oracle      both extremes constant — main NS + Cholesky only
  no_chol     oracle + Cholesky tail stubbed (measures the Cholesky)

Run on the TPU: python -u scripts/designer_ab.py [--k 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def make_variant(level, lam_max_c, lam_min_c):
    """optimize_sigma_ns with stage `level` replaced by constants.

    Mirrors covo_mpc_tpu/ops/covariance.py::optimize_sigma_ns stage for
    stage; stubbed stages use compile-time floats so XLA folds them away
    entirely — emulating a perfect zero-cost warm estimate.
    """
    import jax.numpy as jnp

    from covo_mpc_tpu.ops.covariance import _extreme_eig, _mm, _ns_sqrt

    def opt(R, sample_sigma, D):
        R = (R + R.T) / 2.0
        eye = jnp.eye(D, dtype=R.dtype)
        fnorm = jnp.linalg.norm(R) + 1e-30

        if level in ("no_lmax",):
            lam_max = lam_min_c * 0.0 + lam_max_c  # constant, no pass
        else:
            lam_max = _extreme_eig(fnorm * eye + R, 14) - fnorm

        if level in ("oracle", "no_chol"):
            lam_min = lam_max * 0.0 + lam_min_c
        else:
            bound = lam_max * 1.02 + 1e-3 * fnorm
            lam_min_rough = bound - _extreme_eig(bound * eye - R, 14)
            if level == "no_refine":
                lam_min = lam_min_rough
            else:
                spread = bound - lam_min_rough
                delta1 = 1e-2 + 2e-3 * spread
                off1 = -lam_min_rough + delta1
                s1 = (lam_max + off1) * 1.05
                _, Z1 = _ns_sqrt((R + off1 * eye) / s1, 3, 4)
                lam_min = s1 / _extreme_eig(_mm(Z1, Z1), 14) - off1

        offset = -lam_min + 1e-2
        A = R + offset * eye
        s = (lam_max + offset) * 1.05 + 1e-30
        _, Z = _ns_sqrt(A / s, 8, 5)

        Z = (Z + Z.T) / 2.0
        log_det_a_cov = D * (jnp.log(sample_sigma) * 2.0)
        if level == "no_chol":
            # stub the Cholesky tail: logdet from the constant extremes,
            # factor = Z itself (wrong values, same shapes/costs downstream)
            log_det_A = D * jnp.log(s)
            log_const = (log_det_a_cov * 2.0 + log_det_A) / D
            c = jnp.exp(0.5 * log_const)
            scale = c / jnp.sqrt(s)
            return scale * Z, jnp.sqrt(scale) * Z
        Lz = jnp.linalg.cholesky(Z)
        log_det_A = D * jnp.log(s) - 4.0 * jnp.sum(jnp.log(jnp.diagonal(Lz)))
        log_const = (log_det_a_cov * 2.0 + log_det_A) / D
        c = jnp.exp(0.5 * log_const)
        scale = c / jnp.sqrt(s)
        return scale * Z, jnp.sqrt(scale) * Lz

    return opt


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
            env, "covo_online", pstr, rng_mode="kernel",
            hessian_mode="gn", collect_debug=False, engine="pallas",
            sigma_mode="ns",
        )

    # representative extremes from one real solve's Hessian (values only
    # matter for keeping the stubbed variants finite)
    solver, cp = build()
    R = solver.get_hessian(state, params, cp.a_mean, jax.random.PRNGKey(3))
    eigs = jnp.linalg.eigvalsh((R + R.T) / 2.0)
    lam_max_c = float(eigs[-1]) * 1.0
    lam_min_c = float(eigs[0])
    print(f"[ab] reference extremes at reset: lam_max={lam_max_c:.4f} "
          f"lam_min={lam_min_c:.6f}", file=sys.stderr)

    rows = []
    for level in ("full", "no_lmax", "no_refine", "oracle", "no_chol"):
        solver, cp = build()
        if level != "full":
            solver._optimize_sigma = make_variant(level, lam_max_c, lam_min_c)
        t0 = time.time()
        per, _ = measure_solve_rate(
            solver, obs, state, params, info, cp, k=args.k, reps=args.reps
        )
        rows.append((level, per))
        print(f"[ab] {level:10s}: {per*1e3:7.4f} ms/solve "
              f"({1/per:8.1f}/s)  [{time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    full = dict(rows)["full"]
    print("\nvariant, ms_per_solve, delta_vs_full_ms")
    for level, per in rows:
        print(f"{level}, {per*1e3:.4f}, {(full-per)*1e3:+.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

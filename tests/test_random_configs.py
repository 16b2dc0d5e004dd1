"""Randomized-config robustness net (round-4 verdict item 5).

The suite's pins are deep but configuration-sparse: every other test
hand-picks its (task, disturb, obs, N, H, engine, rng) point. This sweep
draws ~20 seeded-random combos across the full reference config space
(reference surface: quadjax/envs/quadrotor.py:29-38 + the solver factory
options) and drives each through one env step and one solve on BOTH
engines, asserting finiteness/range and jnp-vs-pallas agreement — the
cross-product nobody hand-picked.

Slow tier: each case compiles two solver programs (jnp + interpret-mode
pallas); the quick pins for each individual axis live in test_env /
test_mppi / test_covo / test_pallas_rollout.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv
from covo_mpc_tpu.solvers import get_solver

TASKS = ["tracking", "tracking_slow", "tracking_zigzag", "hovering"]
OBS_TYPES = ["quad", "quad_params", "params", "adapt_hist"]
DISTURBS = ["periodic", "sin", "drag", "mixed", "gaussian", "none"]
CONTROLLERS = ["mppi", "covo_online", "covo_offline"]
NS = [16, 64, 256]
HS = [8, 16]
RNGS = ["parity", "fast", "invariant"]  # cross-engine-comparable streams
HESSIANS = ["fwd_fwd", "fwd_rev", "sensitivity", "adjoint", "gn"]
SIGMAS = ["eigh", "ns"]


def _draw_cases(n_cases=20, seed=20240820):
    rng = random.Random(seed)
    cases, seen = [], set()
    # 4 of the 20 exercise the kernel-rng stream (pallas-only draws;
    # finiteness + determinism instead of cross-engine agreement)
    while len(cases) < n_cases:
        kernel = len(cases) >= n_cases - 4
        c = dict(
            task=rng.choice(TASKS),
            obs_type=rng.choice(OBS_TYPES),
            disturb=rng.choice(DISTURBS),
            randomizer=rng.random() < 0.5,
            controller=rng.choice(CONTROLLERS),
            n=rng.choice(NS),
            h=rng.choice(HS),
            rng_mode="kernel" if kernel else rng.choice(RNGS),
            hessian=rng.choice(HESSIANS),
            sigma=rng.choice(SIGMAS),
        )
        key = tuple(sorted(c.items()))
        if key not in seen:
            seen.add(key)
            cases.append(c)
    return cases


CASES = _draw_cases()
IDS = [
    f"{c['controller']}-{c['task']}-{c['disturb']}-{c['obs_type']}-"
    f"N{c['n']}H{c['h']}-{c['rng_mode']}-{c['hessian']}-{c['sigma']}"
    for c in CASES
]


def _one_solve(env, c, engine, state, obs, info):
    params = env.default_params
    solver, cp = get_solver(
        env, c["controller"], f"N{c['n']}_H{c['h']}_lam0.01",
        rng_mode=c["rng_mode"],
        hessian_mode=c["hessian"] if "covo" in c["controller"] else "fwd_fwd",
        sigma_mode=c["sigma"], engine=engine, collect_debug=False,
    )
    cp = solver.reset(state, params, cp, jax.random.PRNGKey(7))
    action, cp2, _ = solver(obs, state, params, jax.random.PRNGKey(3), cp,
                            info)
    return np.asarray(action), np.asarray(cp2.a_mean)


@pytest.mark.slow
@pytest.mark.parametrize("c", CASES, ids=IDS)
def test_random_config_sweep(c):
    env = QuadEnv(
        EnvConfig(
            task=c["task"], obs_type=c["obs_type"],
            enable_randomizer=c["randomizer"], disturb_type=c["disturb"],
            disable_rollover_terminate=True, generate_noisy_state=True,
        )
    )
    params = env.default_params
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
    assert obs.shape == (env.obs_dim,) and bool(jnp.isfinite(obs).all())

    # one env step under a mid-range action
    action0 = jnp.full((env.action_dim,), 0.1)
    obs1, state1, reward, done, info1 = env.step(
        jax.random.PRNGKey(1), state, action0, params
    )
    assert bool(jnp.isfinite(obs1).all()) and bool(jnp.isfinite(reward))

    if c["rng_mode"] == "kernel":
        # in-kernel TPU-PRNG draws exist only in the pallas engine; pin
        # finiteness/range + run-to-run determinism
        a1, m1 = _one_solve(env, c, "pallas_interpret", state, obs, info)
        a2, m2 = _one_solve(env, c, "pallas_interpret", state, obs, info)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(m1, m2)
        for arr in (a1, m1):
            assert np.isfinite(arr).all()
            assert np.abs(arr).max() <= 1.0 + 1e-6
        return

    a_jnp, m_jnp = _one_solve(env, c, "jnp", state, obs, info)
    a_pls, m_pls = _one_solve(env, c, "pallas_interpret", state, obs, info)
    for arr in (a_jnp, m_jnp, a_pls, m_pls):
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() <= 1.0 + 1e-6
    # both engines consume the SAME sampled actions (draws happen outside
    # the kernel for these rng modes); the kernel recomputes costs in
    # fp32, so the weighted updates agree to accumulated-ulp tolerance
    np.testing.assert_allclose(a_pls, a_jnp, atol=2e-3)
    np.testing.assert_allclose(m_pls, m_jnp, atol=2e-3)

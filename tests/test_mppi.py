"""MPPI solver: sampling parity, solve parity, episode parity vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv
from covo_mpc_tpu.ops import sampling
from covo_mpc_tpu.solvers import get_solver
from tests.reference_oracle import load_reference

N, H, LAM = 32, 8, 0.01


def make_env():
    return QuadEnv(
        EnvConfig(
            task="tracking",
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )


def make_ref_pair(name="mppi", params=f"N{N}_H{H}_lam{LAM}"):
    ref = load_reference()
    ref_env = ref.envs.quadrotor.Quad3D(
        task="tracking",
        obs_type="quad",
        enable_randomizer=False,
        disturb_type="gaussian",
        disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    ref_ctrl, _ = ref.envs.quadrotor.get_controller(ref_env, name, params)
    env = make_env()
    solver, _ = get_solver(env, name, params, rng_mode=sampling.PARITY)
    return env, solver, ref_env, ref_ctrl


class TestSampler:
    def test_parity_matches_reference_mvn(self):
        """Shared-Cholesky batched sampling == vmapped multivariate_normal."""
        key = jax.random.PRNGKey(0)
        a_mean = jax.random.normal(jax.random.PRNGKey(1), (H, 4)) * 0.1
        a_cov = jnp.tile(jnp.diag(jnp.array([0.25, 0.2, 0.15, 0.1])), (H, 1, 1))

        ours = sampling.sample_per_step(key, a_mean, a_cov, N, mode=sampling.PARITY)

        def ref_single(k):
            ks = jax.random.split(k, H)
            return jax.vmap(
                lambda kk, m, c: jax.random.multivariate_normal(kk, m, c)
            )(ks, a_mean, a_cov)

        ref = jax.vmap(ref_single)(jax.random.split(key, N))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_fast_mode_statistics(self):
        key = jax.random.PRNGKey(2)
        a_mean = jnp.zeros((H, 4))
        a_cov = jnp.tile(jnp.eye(4) * 0.25, (H, 1, 1))
        s = sampling.sample_per_step(key, a_mean, a_cov, 4096, mode=sampling.FAST)
        assert abs(float(s.mean())) < 0.02
        assert abs(float(s.std()) - 0.5) < 0.02

    def test_invariant_mode_shard_independent(self):
        """fold_in-keyed draws: the same global ids give the same samples
        regardless of batch slicing."""
        key = jax.random.PRNGKey(3)
        a_mean = jnp.zeros((H, 4))
        a_cov = jnp.tile(jnp.eye(4) * 0.25, (H, 1, 1))
        full = sampling.sample_per_step(key, a_mean, a_cov, 16, mode=sampling.INVARIANT)
        part = sampling.sample_per_step(
            key, a_mean, a_cov, 8, mode=sampling.INVARIANT,
            sample_ids=jnp.arange(8, 16),
        )
        np.testing.assert_allclose(full[8:], part, atol=1e-7)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestSolveParity:
    def test_single_solve(self):
        env, solver, ref_env, ref_ctrl = make_ref_pair()
        key = jax.random.PRNGKey(42)
        params = env.default_params
        obs, info, state = env.reset_env(key, params)
        obs_r, info_r, state_r = ref_env.reset_env(key, ref_env.default_params)

        cp = solver.reset(state, params, solver.init_control_params, jax.random.PRNGKey(7))
        cp_r = ref_ctrl.reset(state_r, ref_env.default_params,
                              ref_ctrl.init_control_params, jax.random.PRNGKey(7))

        rng_act = jax.random.PRNGKey(3)
        action, cp, _ = solver(obs, state, params, rng_act, cp, info)
        action_r, cp_r, _ = ref_ctrl(obs_r, state_r, ref_env.default_params,
                                     rng_act, cp_r, info_r)
        np.testing.assert_allclose(action, action_r, atol=2e-4)
        np.testing.assert_allclose(cp.a_mean, cp_r.a_mean, atol=2e-4)
        np.testing.assert_allclose(cp.a_cov, cp_r.a_cov, atol=2e-4)

    def test_multi_step_episode(self):
        """Closed-loop control-trajectory parity (BASELINE.md row 3,
        revised contract — full rationale in tests/test_parity_episode.py):
        <= 1e-3 over the first 15 steps, bounded growth through 25. The
        chaotic closed loop amplifies XLA-fusion-level (1 ulp) differences
        past 1e-3 around step ~22, and fusion changes with ANY graph
        refactor, so a fixed 25-step 1e-3 assertion only measures chaos
        margin luck; a semantic bug instead fails the per-solve 2e-4 pin
        (test_single_solve) and the first-steps window here."""
        env, solver, ref_env, ref_ctrl = make_ref_pair()
        rng = jax.random.PRNGKey(1)
        params = env.default_params
        params_r = ref_env.default_params
        reset_key = jax.random.PRNGKey(100)
        obs, info, state = env.reset_env(reset_key, params)
        obs_r, info_r, state_r = ref_env.reset_env(reset_key, params_r)
        cp = solver.init_control_params
        cp_r = ref_ctrl.init_control_params

        diffs = []
        for t in range(25):
            rng, rng_act, rng_step = jax.random.split(rng, 3)
            action, cp, _ = solver(obs, state, params, rng_act, cp, info)
            action_r, cp_r, _ = ref_ctrl(obs_r, state_r, params_r, rng_act, cp_r, info_r)
            diffs.append(float(jnp.max(jnp.abs(action - action_r))))
            obs, state, _, _, info = env.step(rng_step, state, action, params)
            obs_r, state_r, _, _, info_r = ref_env.step(
                rng_step, state_r, action_r, params_r
            )
            if t < 15:
                np.testing.assert_allclose(state.pos, state_r.pos, atol=1e-3)

        diffs = np.array(diffs)
        assert diffs[:3].max() < 1e-4, f"per-solve window broken: {diffs[:3]}"
        assert diffs[:15].max() <= 1e-3, (
            f"1e-3 parity lost before step 15: {diffs[:15]}"
        )
        # chaos-growth bound: still same-trajectory through 25 steps
        assert diffs.max() < 5e-2, f"trajectories separated early: {diffs}"


class TestStandalone:
    @pytest.mark.slow
    def test_episode_improves_over_random(self):
        from covo_mpc_tpu.runtime import make_episode_runner

        env = make_env()
        solver, _ = get_solver(env, "mppi", f"N{N}_H{H}_lam{LAM}",
                               rng_mode=sampling.FAST)
        runner = make_episode_runner(env, solver, steps=60)
        _, err_pos, _, _ = runner(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
        rand_solver, _ = get_solver(env, "random")
        rand_runner = make_episode_runner(env, rand_solver, steps=60)
        _, err_rand, _, _ = rand_runner(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
        assert float(err_pos.mean()) < float(err_rand.mean())


class TestCarriedFactor:
    """The carried chol(a_cov) (MPPIParams.a_cov_chol) removes the
    sampler's per-solve batched Cholesky — 13.2 us of the 75 us
    kernel-rng solve measured by device trace (results/roofline_mppi.json).
    These pins guarantee it can never desync from a_cov."""

    def _setup(self, gamma_sigma):
        env = make_env()
        solver, cp = get_solver(env, "mppi", f"N{N}_H{H}_lam{LAM}",
                                rng_mode=sampling.FAST)
        cp = cp.replace(gamma_sigma=gamma_sigma)
        params = env.default_params
        obs, info, state = env.reset_env(jax.random.PRNGKey(0), params)
        return env, solver, cp, params, obs, info, state

    @pytest.mark.parametrize("gamma_sigma", [0.0, 0.3])
    def test_factor_tracks_cov(self, gamma_sigma):
        """After several solves the carried factor IS chol(a_cov) — for
        the identity blend (gamma=0) and the live blend (gamma>0)."""
        env, solver, cp, params, obs, info, state = self._setup(gamma_sigma)
        key = jax.random.PRNGKey(3)
        for i in range(3):
            key, k = jax.random.split(key)
            _, cp, _ = solver(obs, state, params, k, cp, info)
        np.testing.assert_allclose(
            np.asarray(cp.a_cov_chol),
            np.asarray(jnp.linalg.cholesky(cp.a_cov)),
            atol=1e-6,
        )

    @pytest.mark.parametrize("gamma_sigma", [0.0, 0.3])
    def test_matches_per_solve_cholesky(self, gamma_sigma):
        """Dropping the carried factor (a_cov_chol=None re-derives chol
        per solve) gives the same actions/means — the carry is a pure
        scheduling change, not a semantic one."""
        env, solver, cp, params, obs, info, state = self._setup(gamma_sigma)
        cp_nochol = cp.replace(a_cov_chol=None)
        key = jax.random.PRNGKey(5)
        a1, cp1, _ = solver(obs, state, params, key, cp, info)
        a2, cp2, _ = solver(obs, state, params, key, cp_nochol, info)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cp1.a_mean),
                                   np.asarray(cp2.a_mean), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cp1.a_cov),
                                   np.asarray(cp2.a_cov), atol=1e-6)

"""QuadEnv: reset/step/obs parity against the reference Quad3D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, EnvParams3D, QuadEnv
from tests.reference_oracle import load_reference

STATE_FIELDS = [
    "pos", "vel", "quat", "omega", "omega_tar", "pos_tar", "vel_tar",
    "acc_tar", "last_thrust", "last_torque", "time", "f_disturb",
    "vel_hist", "omega_hist", "action_hist",
]


def make_pair(task="tracking", disturb_type="gaussian", enable_randomizer=False,
              disable_rollover_terminate=True, generate_noisy_state=True):
    ref = load_reference()
    ref_env = ref.envs.quadrotor.Quad3D(
        task=task,
        obs_type="quad",
        enable_randomizer=enable_randomizer,
        disturb_type=disturb_type,
        disable_rollover_terminate=disable_rollover_terminate,
        generate_noisy_state=generate_noisy_state,
    )
    env = QuadEnv(
        EnvConfig(
            task=task,
            obs_type="quad",
            enable_randomizer=enable_randomizer,
            disturb_type=disturb_type,
            disable_rollover_terminate=disable_rollover_terminate,
            generate_noisy_state=generate_noisy_state,
        )
    )
    return env, ref_env


def assert_states_close(ours, ref, atol=1e-5, msg=""):
    for f in STATE_FIELDS:
        np.testing.assert_allclose(
            getattr(ours, f), getattr(ref, f), atol=atol, err_msg=f"{msg}:{f}"
        )


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestParity:
    @pytest.mark.parametrize("task", ["tracking", "tracking_zigzag", "hovering"])
    def test_reset(self, task):
        env, ref_env = make_pair(task=task)
        key = jax.random.PRNGKey(11)
        obs, info, state = env.reset_env(key, env.default_params)
        obs_r, info_r, state_r = ref_env.reset_env(key, ref_env.default_params)
        assert_states_close(state, state_r, msg=task)
        np.testing.assert_allclose(obs, obs_r, atol=1e-5)
        np.testing.assert_allclose(info["err_pos"], info_r["err_pos"], atol=1e-6)
        assert_states_close(info["noisy_state"], info_r["noisy_state"], msg="noisy")

    @pytest.mark.parametrize("disturb", [
        "gaussian", "drag",
        # same step plumbing, different disturbance table — slow tier
        pytest.param("periodic", marks=pytest.mark.slow),
        pytest.param("sin", marks=pytest.mark.slow),
        pytest.param("none", marks=pytest.mark.slow),
    ])
    def test_step_env_sequence(self, disturb):
        env, ref_env = make_pair(task="tracking", disturb_type=disturb)
        key = jax.random.PRNGKey(5)
        params = env.default_params
        params_r = ref_env.default_params
        _, _, state = env.reset_env(key, params)
        _, _, state_r = ref_env.reset_env(key, params_r)

        act_key = jax.random.PRNGKey(77)
        for t in range(5):
            act_key, k_act, k_step = jax.random.split(act_key, 3)
            action = jax.random.uniform(k_act, (4,), minval=-1.0, maxval=1.0)
            obs, state, reward, done, info = env.step_env(k_step, state, action, params)
            obs_r, state_r, reward_r, done_r, info_r = ref_env.step_env(
                k_step, state_r, action, params_r
            )
            assert_states_close(state, state_r, msg=f"{disturb}@{t}")
            np.testing.assert_allclose(obs, obs_r, atol=1e-5)
            np.testing.assert_allclose(reward, reward_r, atol=1e-5)
            assert bool(done) == bool(done_r)
            np.testing.assert_allclose(info["err_pos"], info_r["err_pos"], atol=1e-5)
            assert_states_close(
                info["noisy_state"], info_r["noisy_state"], msg="noisy"
            )

    def test_step_env_deterministic_flag(self):
        env, ref_env = make_pair(disturb_type="gaussian")
        key = jax.random.PRNGKey(3)
        params = env.default_params
        _, _, state = env.reset_env(key, params)
        _, _, state_r = ref_env.reset_env(key, ref_env.default_params)
        action = jnp.array([0.1, 0.0, -0.2, 0.05])
        _, s1, *_ = env.step_env(key, state, action, params, deterministic=True)
        _, s1r, *_ = ref_env.step_env(key, state_r, action, ref_env.default_params, True)
        assert_states_close(s1, s1r)
        np.testing.assert_allclose(s1.f_disturb, np.zeros(3), atol=1e-7)

    def test_autoreset_step(self):
        env, ref_env = make_pair()
        key = jax.random.PRNGKey(8)
        params = env.default_params
        _, _, state = env.reset_env(key, params)
        _, _, state_r = ref_env.reset_env(key, ref_env.default_params)
        # drive out of bounds to trigger auto-reset select
        state = state.replace(pos=jnp.array([5.0, 0.0, 0.0]))
        state_r = state_r.replace(pos=jnp.array([5.0, 0.0, 0.0]))
        k = jax.random.PRNGKey(9)
        action = jnp.zeros(4)
        obs, state2, reward, done, info = env.step(k, state, action, params)
        obs_r, state2_r, reward_r, done_r, info_r = ref_env.step(
            k, state_r, action, ref_env.default_params
        )
        assert bool(done) and bool(done_r)
        assert_states_close(state2, state2_r, msg="autoreset")
        np.testing.assert_allclose(obs, obs_r, atol=1e-5)

    def test_sample_params_dr(self):
        env, ref_env = make_pair(enable_randomizer=True)
        key = jax.random.PRNGKey(21)
        p = env.sample_params(key)
        p_r = ref_env.sample_params(key)
        np.testing.assert_allclose(p.m, p_r.m, atol=1e-6)
        np.testing.assert_allclose(p.I_diag, jnp.diagonal(p_r.I), atol=1e-8)
        np.testing.assert_allclose(p.action_scale, p_r.action_scale, atol=1e-6)
        np.testing.assert_allclose(p.alpha_bodyrate, p_r.alpha_bodyrate, atol=1e-6)
        np.testing.assert_allclose(p.disturb_params, p_r.disturb_params, atol=1e-6)

    def test_sample_params_nodr(self):
        env, ref_env = make_pair(enable_randomizer=False)
        key = jax.random.PRNGKey(22)
        p = env.sample_params(key)
        p_r = ref_env.sample_params(key)
        np.testing.assert_allclose(p.disturb_params, p_r.disturb_params, atol=1e-6)
        np.testing.assert_allclose(p.m, p_r.m, atol=1e-8)

    def test_obs_dims(self):
        env, ref_env = make_pair()
        assert env.obs_dim == ref_env.obs_dim == 49


class TestStandalone:
    def test_episode_runs(self):
        env = QuadEnv(EnvConfig(task="hovering", enable_randomizer=False,
                                disturb_type="none", generate_noisy_state=True,
                                disable_rollover_terminate=True))
        key = jax.random.PRNGKey(0)
        params = env.default_params
        obs, info, state = env.reset(key, params)
        for _ in range(3):
            key, k = jax.random.split(key)
            obs, state, reward, done, info = env.step(k, state, jnp.zeros(4), params)
        assert state.time == 3
        assert obs.shape == (env.obs_dim,)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
def test_obs_quad_params_parity():
    """quad_params observation (state + normalized parameters) matches."""
    ref = load_reference()
    env_r = ref.envs.quadrotor.Quad3D(
        task="tracking", obs_type="quad_params", enable_randomizer=True,
        disturb_type="gaussian", disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    env = QuadEnv(
        EnvConfig(task="tracking", obs_type="quad_params",
                  enable_randomizer=True, disturb_type="gaussian",
                  disable_rollover_terminate=True, generate_noisy_state=True)
    )
    key = jax.random.PRNGKey(33)
    params = env.sample_params(key)
    params_r = env_r.sample_params(key)
    obs, _, state = env.reset_env(key, params)
    obs_r, _, state_r = env_r.reset_env(key, params_r)
    np.testing.assert_allclose(obs, obs_r, atol=1e-5)
    assert env.obs_dim == obs.shape[0] == 67


@pytest.mark.parametrize("obs_type,ref_builder", [
    ("params", "get_obs_paramsonly"),
    ("adapt_hist", "get_obs_adapt_hist"),
])
def test_obs_extra_types_wired(obs_type, ref_builder):
    """The params / adapt_hist builders are selectable via EnvConfig.

    The reference exposes these builders (quadrotor.py:396-452) but only
    wires quad/quad_params/quad_l1 in its ctor (:176-192); here every
    in-scope builder is config-selectable. Width pins the real emitted
    dim (the reference's declared adapt_obs_dim=22*h matches; its
    param_obs_dim=20 is stale — the builder emits 18)."""
    env = QuadEnv(
        EnvConfig(task="tracking", obs_type=obs_type, enable_randomizer=True,
                  disturb_type="gaussian", disable_rollover_terminate=True,
                  generate_noisy_state=True)
    )
    key = jax.random.PRNGKey(7)
    params = env.sample_params(key)
    obs, _, state = env.reset_env(key, params)
    assert obs.shape == (env.obs_dim,)
    assert np.isfinite(np.asarray(obs)).all()

    ref = load_reference()
    if ref is None:
        pytest.skip("reference unavailable")
    env_r = ref.envs.quadrotor.Quad3D(
        task="tracking", obs_type="quad", enable_randomizer=True,
        disturb_type="gaussian", disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    params_r = env_r.sample_params(key)
    _, _, state_r = env_r.reset_env(key, params_r)
    obs_r = getattr(env_r, ref_builder)(state_r, params_r)
    np.testing.assert_allclose(obs, obs_r, atol=1e-5)

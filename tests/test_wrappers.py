"""LogWrapper + misc utility parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, LogWrapper, QuadEnv, misc
from tests.reference_oracle import load_reference


def test_log_wrapper_accumulates():
    env = LogWrapper(
        QuadEnv(
            EnvConfig(
                task="hovering", enable_randomizer=False, disturb_type="none",
                disable_rollover_terminate=True, generate_noisy_state=True,
            )
        )
    )
    key = jax.random.PRNGKey(0)
    obs, info, state = env.reset(key, env.default_params)
    total = 0.0
    for t in range(4):
        key, k = jax.random.split(key)
        obs, state, reward, done, info = env.step(k, state, jnp.zeros(4),
                                                  env.default_params)
        total += float(reward)
    assert float(state.episode_lengths) == 4
    assert float(state.episode_returns) == pytest.approx(total, abs=1e-5)
    assert not bool(info["returned_episode"])


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
def test_misc_parity():
    ref = load_reference().dynamics.utils
    xs = jnp.array([0.1, 3.5, -4.0, 10.0])
    np.testing.assert_allclose(
        misc.angle_normalize(xs), jax.vmap(ref.angle_normalize)(xs), atol=1e-6
    )
    key = jax.random.PRNGKey(3)
    np.testing.assert_allclose(
        misc.sample_sphere(key, 2.0, jnp.array([1.0, 2.0, 3.0])),
        ref.sample_sphere(key, 2.0, jnp.array([1.0, 2.0, 3.0])),
        atol=1e-6,
    )

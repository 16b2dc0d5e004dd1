"""Reward functions: batched-vs-scalar consistency + reference parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import rewards
from tests.reference_oracle import load_reference


def _random_state_arrays(key, n):
    ks = jax.random.split(key, 5)
    return {
        "pos": jax.random.normal(ks[0], (n, 3)),
        "vel": jax.random.normal(ks[1], (n, 3)),
        "quat": jax.random.normal(ks[2], (n, 4))
        / jnp.linalg.norm(jax.random.normal(ks[2], (n, 4)), axis=-1, keepdims=True),
        "pos_tar": jax.random.normal(ks[3], (n, 3)),
        "vel_tar": jax.random.normal(ks[4], (n, 3)),
    }


def test_batch_matches_loop():
    s = _random_state_arrays(jax.random.PRNGKey(0), 8)
    batched = rewards.tracking_penyaw_reward(
        s["pos"], s["vel"], s["quat"], s["pos_tar"], s["vel_tar"]
    )
    single = jnp.stack(
        [
            rewards.tracking_penyaw_reward(
                s["pos"][i], s["vel"][i], s["quat"][i], s["pos_tar"][i], s["vel_tar"][i]
            )
            for i in range(8)
        ]
    )
    np.testing.assert_allclose(batched, single, atol=1e-6)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestReferenceParity:
    def _ref_state(self, s, i):
        """Reference EnvState3D carrying the reward-relevant fields."""
        ref = load_reference()
        z3 = jnp.zeros(3)
        return ref.dynamics.dataclass.EnvState3D(
            pos=s["pos"][i], vel=s["vel"][i], quat=s["quat"][i],
            omega=z3, omega_tar=z3,
            pos_traj=jnp.zeros((10, 3)), vel_traj=jnp.zeros((10, 3)),
            acc_traj=jnp.zeros((10, 3)),
            pos_tar=s["pos_tar"][i], vel_tar=s["vel_tar"][i], acc_tar=z3,
            last_thrust=0.0, last_torque=z3, time=0, f_disturb=z3,
            vel_hist=jnp.zeros((6, 3)), omega_hist=jnp.zeros((6, 3)),
            action_hist=jnp.zeros((6, 4)),
        )

    def test_penyaw(self):
        utils = load_reference().dynamics.utils
        s = _random_state_arrays(jax.random.PRNGKey(1), 6)
        ours = rewards.tracking_penyaw_reward(
            s["pos"], s["vel"], s["quat"], s["pos_tar"], s["vel_tar"]
        )
        for i in range(6):
            ref = utils.tracking_penyaw_reward_fn(self._ref_state(s, i))
            np.testing.assert_allclose(ours[i], ref, atol=1e-5)

    def test_tracking(self):
        utils = load_reference().dynamics.utils
        s = _random_state_arrays(jax.random.PRNGKey(2), 6)
        ours = rewards.tracking_reward(s["pos"], s["vel"], s["pos_tar"], s["vel_tar"])
        for i in range(6):
            ref = utils.tracking_reward_fn(self._ref_state(s, i))
            np.testing.assert_allclose(ours[i], ref, atol=1e-5)

    def test_realworld(self):
        utils = load_reference().dynamics.utils
        s = _random_state_arrays(jax.random.PRNGKey(3), 6)
        ours = rewards.tracking_realworld_reward(s["pos"], s["quat"], s["pos_tar"])
        for i in range(6):
            ref = utils.tracking_realworld_reward_fn(self._ref_state(s, i))
            np.testing.assert_allclose(ours[i], ref, atol=1e-5)

    def test_hover(self):
        utils = load_reference().dynamics.utils
        s = _random_state_arrays(jax.random.PRNGKey(4), 6)
        ours = rewards.hovering_reward(s["pos"], s["vel"], s["pos_tar"], s["vel_tar"])
        for i in range(6):
            ref = utils.hovering_reward_fn(self._ref_state(s, i))
            np.testing.assert_allclose(ours[i], ref, atol=1e-5)


class TestScalarCoreTwin:
    """Direct pins: the Pallas kernels' component-form rewards
    (models/scalar_core) == the array-form definitions here."""

    def _inputs(self):
        k = jax.random.PRNGKey(13)
        pos = jax.random.normal(k, (64, 3))
        vel = jax.random.normal(jax.random.PRNGKey(14), (64, 3))
        quat = jax.random.normal(jax.random.PRNGKey(15), (64, 4))
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        pt = jax.random.normal(jax.random.PRNGKey(16), (64, 3))
        vt = jax.random.normal(jax.random.PRNGKey(17), (64, 3))
        return pos, vel, quat, pt, vt

    def test_penyaw(self):
        from covo_mpc_tpu.models import scalar_core

        pos, vel, quat, pt, vt = self._inputs()
        ref = rewards.tracking_penyaw_reward(pos, vel, quat, pt, vt)
        for norm in (scalar_core.norm3, scalar_core.norm3_elementwise):
            got = scalar_core.penyaw_reward(
                (pos[:, 0], pos[:, 1], pos[:, 2]),
                (vel[:, 0], vel[:, 1], vel[:, 2]),
                (quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]),
                (pt[:, 0], pt[:, 1], pt[:, 2]),
                (vt[:, 0], vt[:, 1], vt[:, 2]),
                norm=norm,
            )
            np.testing.assert_allclose(got, ref, atol=2e-6)

    def test_realworld(self):
        from covo_mpc_tpu.models import scalar_core

        pos, _, quat, pt, _ = self._inputs()
        ref = rewards.tracking_realworld_reward(pos, quat, pt)
        got = scalar_core.realworld_reward(
            (pos[:, 0], pos[:, 1], pos[:, 2]), quat[:, 3],
            (pt[:, 0], pt[:, 1], pt[:, 2]),
        )
        np.testing.assert_allclose(got, ref, atol=2e-6)

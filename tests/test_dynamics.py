"""Dynamics step: physics sanity + reference parity (golden equations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import dynamics
from covo_mpc_tpu.models.structs import EnvParams3D
from tests.reference_oracle import load_reference


def random_packed_state(key, n=None):
    shape = (n, 16) if n else (16,)
    x = jax.random.normal(key, shape) * 0.3
    q = x[..., 3:7]
    x = x.at[..., 3:7].set(q / jnp.linalg.norm(q, axis=-1, keepdims=True))
    return x


class TestPhysics:
    def test_hover_equilibrium(self):
        """At exact hover thrust with identity attitude, velocity stays 0."""
        p = EnvParams3D()
        x = jnp.zeros(16).at[6].set(1.0)  # identity quat, all else 0
        hover_cmd = (p.m * p.g / p.max_thrust) * 2.0 - 1.0
        a = jnp.array([hover_cmd, 0.0, 0.0, 0.0])
        u, _ = dynamics.control_to_thrust_omega(a, p)
        x2 = dynamics.bodyrate_step(x, u, p, p.dt)
        np.testing.assert_allclose(x2[7:10], np.zeros(3), atol=1e-6)
        np.testing.assert_allclose(x2[:3], np.zeros(3), atol=1e-6)

    def test_freefall(self):
        p = EnvParams3D()
        x = jnp.zeros(16).at[6].set(1.0)
        u = jnp.array([0.0, 0.0, 0.0, 0.0])  # zero thrust
        x2 = dynamics.bodyrate_step(x, u, p, p.dt)
        assert float(x2[9]) == pytest.approx(-p.g * p.dt, rel=1e-5)

    def test_bodyrate_lag(self):
        p = EnvParams3D()
        x = jnp.zeros(16).at[6].set(1.0)
        u = jnp.array([0.2, 1.0, -2.0, 0.5])
        x2 = dynamics.bodyrate_step(x, u, p, p.dt)
        expected = (1.0 - p.alpha_bodyrate) * u[1:4] * p.action_scale
        np.testing.assert_allclose(x2[10:13], expected, atol=1e-6)

    def test_batched_matches_single(self):
        p = EnvParams3D()
        x = random_packed_state(jax.random.PRNGKey(0), 8)
        u = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        batched = dynamics.bodyrate_step(x, u, p, p.dt)
        single = jnp.stack(
            [dynamics.bodyrate_step(x[i], u[i], p, p.dt) for i in range(8)]
        )
        np.testing.assert_allclose(batched, single, atol=1e-6)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestReferenceParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_core_ode_step(self, seed):
        """bodyrate_step == reference quad_dynamics_bodyrate (free.py:75-112),
        modulo the reference's deferred quaternion normalization (free.py:139):
        the reference wrapper normalizes the integrated quat when writing back
        to the state; our step returns it already normalized."""
        ref = load_reference()
        _, ref_dyn = ref.dynamics.free.get_quadrotor_1st_order_dyn("none")
        p_ref = ref.dynamics.dataclass.EnvParams3D()
        p = EnvParams3D()

        x = random_packed_state(jax.random.PRNGKey(seed))
        u = jax.random.normal(jax.random.PRNGKey(seed + 100), (4,))
        x_ref = ref_dyn(x, u, p_ref, p_ref.dt, jax.random.PRNGKey(0))
        x_ref = x_ref.at[3:7].set(x_ref[3:7] / jnp.linalg.norm(x_ref[3:7]))
        ours = dynamics.bodyrate_step(x, u, p, p.dt)
        np.testing.assert_allclose(ours, x_ref, atol=1e-5)

    def test_randomized_params(self):
        """Same check under randomized mass / alpha / action_scale."""
        ref = load_reference()
        _, ref_dyn = ref.dynamics.free.get_quadrotor_1st_order_dyn("none")
        p_ref = ref.dynamics.dataclass.EnvParams3D(
            m=0.031, action_scale=1.1, alpha_bodyrate=0.42
        )
        p = EnvParams3D(m=0.031, action_scale=1.1, alpha_bodyrate=0.42)
        x = random_packed_state(jax.random.PRNGKey(9))
        u = jnp.array([0.3, -0.5, 0.2, 0.9])
        x_ref = ref_dyn(x, u, p_ref, p_ref.dt, jax.random.PRNGKey(0))
        x_ref = x_ref.at[3:7].set(x_ref[3:7] / jnp.linalg.norm(x_ref[3:7]))
        ours = dynamics.bodyrate_step(x, u, p, p.dt)
        np.testing.assert_allclose(ours, x_ref, atol=1e-5)


class TestScalarCoreTwin:
    def test_bodyrate_step_component_form_matches_array_form(self):
        """The Pallas kernels' component-form ODE (models/scalar_core) ==
        the array-form definition (models/dynamics.bodyrate_step) to fp
        noise — the direct pin that keeps the two layouts one model."""
        from covo_mpc_tpu.models import scalar_core
        from covo_mpc_tpu.models.structs import EnvParams3D

        params = EnvParams3D()
        key = jax.random.PRNGKey(11)
        x = jax.random.normal(key, (64, 16)) * 0.3
        # make quaternions non-degenerate
        x = x.at[:, 3:7].add(jnp.array([0.0, 0.0, 0.0, 1.0]))
        u = jax.random.uniform(jax.random.PRNGKey(12), (64, 4),
                               minval=-1.0, maxval=1.0)

        ref = dynamics.bodyrate_step(x, u, params, 0.02)

        us = u * params.action_scale
        out = scalar_core.bodyrate_step(
            tuple(x[:, i] for i in range(13)),
            us[:, 0], (us[:, 1], us[:, 2], us[:, 3]),
            (x[:, 13], x[:, 14], x[:, 15]),
            params.m, params.g, 0.02, params.alpha_bodyrate,
        )
        np.testing.assert_allclose(
            jnp.stack(out, axis=-1), ref[:, :13], atol=1e-5
        )

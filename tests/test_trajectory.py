"""Trajectory generators: shape/sanity + bit-level reference parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import trajectory
from tests.reference_oracle import load_reference

MAX_STEPS, DT = 300, 0.02


class TestShapes:
    @pytest.mark.parametrize(
        "gen,T",
        [
            (trajectory.generate_fixed_traj, 300),
            (trajectory.generate_lissa_traj, 350),
            (trajectory.generate_lissa_traj_slow, 350),
            (trajectory.generate_zigzag_traj, 320),
        ],
    )
    def test_shapes(self, gen, T):
        pos, vel, acc = gen(MAX_STEPS, DT, jax.random.PRNGKey(0))
        assert pos.shape == (T, 3) and vel.shape == (T, 3) and acc.shape == (T, 3)
        np.testing.assert_allclose(pos[0], np.zeros(3), atol=1e-6)

    def test_lissa_vel_consistent(self):
        pos, vel, _ = trajectory.generate_lissa_traj(MAX_STEPS, DT, jax.random.PRNGKey(3))
        fd = (pos[2:] - pos[:-2]) / (2 * DT)
        np.testing.assert_allclose(fd, vel[1:-1], atol=0.02)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestReferenceParity:
    def setup_method(self, _):
        self.utils = load_reference().dynamics.utils

    @pytest.mark.parametrize("seed", [0, 1, 42])
    def test_lissa(self, seed):
        key = jax.random.PRNGKey(seed)
        ours = trajectory.generate_lissa_traj(MAX_STEPS, DT, key)
        ref = self.utils.generate_lissa_traj(MAX_STEPS, DT, key)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, atol=1e-5)

    @pytest.mark.parametrize("seed", [0, 7])
    def test_lissa_slow(self, seed):
        key = jax.random.PRNGKey(seed)
        ours = trajectory.generate_lissa_traj_slow(MAX_STEPS, DT, key)
        ref = self.utils.generate_lissa_traj_slow(MAX_STEPS, DT, key)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, atol=1e-5)

    @pytest.mark.parametrize("seed", [0, 1, 42, 123])
    def test_zigzag(self, seed):
        key = jax.random.PRNGKey(seed)
        ours = trajectory.generate_zigzag_traj(MAX_STEPS, DT, key)
        ref = self.utils.generate_zigzag_traj(MAX_STEPS, DT, key)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, atol=1e-5)

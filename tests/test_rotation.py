"""Quaternion/SO(3) math: closed-form identities + reference parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import rotation
from tests.reference_oracle import load_reference

KEY = jax.random.PRNGKey(0)


def random_quats(n, key=KEY, normalize=True):
    q = jax.random.normal(key, (n, 4))
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q


class TestIdentities:
    def test_quat_mul_identity(self):
        q = random_quats(16)
        ident = jnp.array([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(rotation.quat_mul(q, ident), q, atol=1e-6)
        np.testing.assert_allclose(rotation.quat_mul(ident, q), q, atol=1e-6)

    def test_conjugate_inverts(self):
        q = random_quats(16)
        prod = rotation.quat_mul(q, rotation.quat_conj(q))
        expected = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (16, 1))
        np.testing.assert_allclose(prod, expected, atol=1e-5)

    def test_rotmat_orthogonal(self):
        R = rotation.quat_to_rotmat(random_quats(16))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(16), atol=1e-5)

    def test_rotate_vec_matches_matrix(self):
        q = random_quats(16)
        v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        via_quat = rotation.rotate_vec(v, q)
        via_mat = jnp.einsum("nij,nj->ni", rotation.quat_to_rotmat(q), v)
        np.testing.assert_allclose(via_quat, via_mat, atol=1e-5)

    def test_body_z_is_third_column(self):
        q = random_quats(16)
        np.testing.assert_allclose(
            rotation.body_z_world(q),
            rotation.quat_to_rotmat(q)[..., :, 2],
            atol=1e-6,
        )

    def test_rotmat_quat_roundtrip(self):
        # restrict to w > 0 hemisphere (single-branch formula)
        q = random_quats(32)
        q = q * jnp.sign(q[:, 3:4])
        q = q[jnp.abs(q[:, 3]) > 0.1]
        q2 = rotation.rotmat_to_quat(rotation.quat_to_rotmat(q))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_vee_hat_roundtrip(self):
        v = jax.random.normal(KEY, (8, 3))
        np.testing.assert_allclose(rotation.vee(rotation.hat(v)), v, atol=1e-6)

    def test_quat_integrate_small_angle(self):
        q = jnp.array([0.0, 0.0, 0.0, 1.0])
        omega = jnp.array([0.1, 0.0, 0.0])
        q2 = rotation.quat_integrate(q, omega, 0.01)
        assert abs(float(jnp.linalg.norm(q2)) - 1.0) < 1e-6
        assert float(q2[0]) == pytest.approx(0.1 * 0.01 / 2, rel=1e-3)


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
class TestReferenceParity:
    def setup_method(self, _):
        ref = load_reference()
        self.geom = ref.dynamics.geom

    def test_quat_mul(self):
        q = np.array(random_quats(8, normalize=False))
        for i in range(4):
            ref = self.geom.multiple_quat(jnp.array(q[i]), jnp.array(q[i + 4]))
            ours = rotation.quat_mul(jnp.array(q[i]), jnp.array(q[i + 4]))
            np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_qtoQ_normalized_and_not(self):
        # the homogeneous form must match the reference for UN-normalized
        # quaternions too (PID consumes noisy quats, pid.py:43)
        q = random_quats(8, normalize=False)
        for i in range(8):
            np.testing.assert_allclose(
                rotation.quat_to_rotmat(q[i]), self.geom.qtoQ(q[i]), atol=1e-5
            )

    def test_rotate_with_quat(self):
        q = random_quats(4)
        v = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
        for i in range(4):
            np.testing.assert_allclose(
                rotation.rotate_vec(v[i], q[i]),
                self.geom.rotate_with_quat(v[i], q[i]),
                atol=1e-5,
            )

    def test_Qtoq(self):
        q = random_quats(8)
        q = q * jnp.sign(q[:, 3:4])
        R = rotation.quat_to_rotmat(q)
        for i in range(8):
            np.testing.assert_allclose(
                rotation.rotmat_to_quat(R[i]), self.geom.Qtoq(R[i]), atol=1e-5
            )

    def test_rpy(self):
        q = random_quats(8)
        for i in range(8):
            np.testing.assert_allclose(
                rotation.quat_to_rpy(q[i]), self.geom.qtorpy(q[i]), atol=1e-5
            )

    def test_axis_angle(self):
        axis = jax.random.normal(KEY, (4, 3))
        angles = jnp.array([0.1, 0.5, 1.0, 2.0])
        for i in range(4):
            np.testing.assert_allclose(
                rotation.axis_angle_to_rotmat(axis[i], angles[i]),
                self.geom.axisangletoR(axis[i], angles[i]),
                atol=1e-5,
            )

    def test_hat_vee(self):
        v = jax.random.normal(KEY, (3,))
        np.testing.assert_allclose(rotation.hat(v), self.geom.hat(v), atol=1e-6)
        R = jax.random.normal(jax.random.PRNGKey(5), (3, 3))
        np.testing.assert_allclose(rotation.vee(R), self.geom.vee(R), atol=1e-6)

    def test_rodrigues_parity(self):
        """rp_to_quat / quat_to_rp vs reference rptoq/qtorp
        (reference: geom.py:90-95), plus round-trip identity."""
        rp = jax.random.normal(KEY, (6, 3)) * 0.7
        for i in range(6):
            q = rotation.rp_to_quat(rp[i])
            np.testing.assert_allclose(q, self.geom.rptoq(rp[i]), atol=1e-6)
            np.testing.assert_allclose(
                rotation.quat_to_rp(q), self.geom.qtorp(q), atol=1e-6
            )
            # round trip (q_w > 0 by construction)
            np.testing.assert_allclose(rotation.quat_to_rp(q), rp[i], atol=1e-5)
        # batched form broadcasts
        qb = rotation.rp_to_quat(rp)
        assert qb.shape == (6, 4)
        np.testing.assert_allclose(rotation.quat_to_rp(qb), rp, atol=1e-5)

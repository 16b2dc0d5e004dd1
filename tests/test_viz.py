"""Meshcat replay helpers (pure-numpy parts; meshcat itself is optional
and absent from the build image)."""

import numpy as np
import pytest

from covo_mpc_tpu.viz.meshcat_vis import _quat_xyzw_to_matrix, _vec_to_transform


def test_quat_to_matrix_identity():
    M = _quat_xyzw_to_matrix([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(M, np.eye(4), atol=1e-12)


def test_vec_to_transform_frame():
    """Arrow frame: +z column along the force, scaled by |f| * scale,
    orthogonal basis, origin in the translation column (the math of
    reference scripts/vis.py:14-40, with the rotation actually applied)."""
    M = _vec_to_transform([1.0, 2.0, 3.0], [0.0, 0.0, 2.0], scale=1.5)
    np.testing.assert_allclose(M[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(M[:3, 2], [0.0, 0.0, 3.0])
    # general direction: columns mutually orthogonal, equal length
    f = np.array([0.3, -0.4, 0.5])
    M = _vec_to_transform(np.zeros(3), f, scale=2.0)
    R = M[:3, :3]
    lengths = np.linalg.norm(R, axis=0)
    np.testing.assert_allclose(lengths, np.linalg.norm(f) * 2.0, atol=1e-12)
    np.testing.assert_allclose(R.T @ R, np.diag(lengths**2), atol=1e-12)
    np.testing.assert_allclose(
        R[:, 2] / lengths[2], f / np.linalg.norm(f), atol=1e-12
    )


def test_vec_to_transform_zero_force():
    M = _vec_to_transform([1.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(M[:3, :3], 0.0)
    np.testing.assert_allclose(M[:3, 3], [1.0, 0.0, 0.0])


def test_replay_requires_meshcat():
    from covo_mpc_tpu.viz import meshcat_vis

    with pytest.raises(ImportError, match="meshcat"):
        meshcat_vis._require_meshcat()

"""State / parameter / action pytrees for the quadrotor model.

These mirror the *API surface* of the reference structs
(reference: quadjax/dynamics/dataclass.py:11-106) so that a user of the
reference finds the same fields, but the rollout hot path does NOT use
these nested pytrees: solvers pack the 16 physical state entries into a
single batch-first ``(N, 16)`` array (see :mod:`covo_mpc_tpu.ops.rollout`)
so that N-sample rollouts never replicate trajectory tables per sample.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
from flax import struct


def default_array(values):
    """flax struct field with a jnp-array default (reference: dataclass.py:6-7)."""
    return struct.field(default_factory=lambda: jnp.array(values))


# Packed-state layout used by the rollout engines: x = (N, 16) float32 with
#   x[..., 0:3]   position (world)
#   x[..., 3:7]   quaternion (x, y, z, w)
#   x[..., 7:10]  velocity (world)
#   x[..., 10:13] body angular velocity
#   x[..., 13:16] force disturbance (world)
PACKED_STATE_DIM = 16
POS = slice(0, 3)
QUAT = slice(3, 7)
VEL = slice(7, 10)
OMEGA = slice(10, 13)
FDIST = slice(13, 16)


@struct.dataclass
class EnvState3D:
    """Full episode state (reference: dataclass.py:11-37).

    The solver-internal rollout state is the packed subset (pos, quat, vel,
    omega, f_disturb); everything else here exists for the episode harness,
    observation builders, and parity with the reference API.
    """

    # drone
    pos: jnp.ndarray  # (3,) world position
    vel: jnp.ndarray  # (3,) world velocity
    quat: jnp.ndarray  # (4,) quaternion (x, y, z, w)
    omega: jnp.ndarray  # (3,) body angular velocity
    omega_tar: jnp.ndarray  # (3,) last commanded body rate
    # target trajectory tables (shared, never per-sample replicated)
    pos_traj: jnp.ndarray  # (T, 3)
    vel_traj: jnp.ndarray  # (T, 3)
    acc_traj: jnp.ndarray  # (T, 3)
    pos_tar: jnp.ndarray  # (3,) current target position
    vel_tar: jnp.ndarray  # (3,)
    acc_tar: jnp.ndarray  # (3,)
    # debug values
    last_thrust: float
    last_torque: jnp.ndarray  # (3,) torque in body frame
    time: int
    f_disturb: jnp.ndarray  # (3,) force disturbance in world frame
    # adaptation histories (FIFO, newest last)
    vel_hist: jnp.ndarray  # (adapt_horizon + 2, 3)
    omega_hist: jnp.ndarray  # (adapt_horizon + 2, 3)
    action_hist: jnp.ndarray  # (adapt_horizon + 2, 4)
    # lower-controller state hook (reference: dataclass.py:37)
    control_params: Union[float, struct.dataclass] = 0.0


@struct.dataclass
class EnvParams3D:
    """Environment parameters: Crazyflie-2 constants + DR ranges.

    Values follow the reference defaults (reference: dataclass.py:41-100).
    ``I_diag`` replaces the reference's full 3x3 inertia matrix: the
    first-order bodyrate model never uses inertia in the dynamics, only the
    diagonal appears in parameter observations (reference: quadrotor.py:431).
    """

    max_speed: float = 8.0
    max_torque: jnp.ndarray = default_array([9e-3, 9e-3, 2e-3])
    max_omega: jnp.ndarray = default_array([10.0, 10.0, 3.0])
    max_thrust: float = 0.8
    dt: float = 0.02
    g: float = 9.81

    m: float = 0.027
    m_mean: float = 0.027
    m_std: float = 0.003

    I_diag: jnp.ndarray = default_array([1.7e-5, 1.7e-5, 3.0e-5])
    I_diag_mean: jnp.ndarray = default_array([1.7e-5, 1.7e-5, 3.0e-5])
    I_diag_std: jnp.ndarray = default_array([0.2e-5, 0.2e-5, 0.3e-5])

    l: float = 0.3
    l_mean: float = 0.3
    l_std: float = 0.1

    hook_offset: jnp.ndarray = default_array([0.0, 0.0, -0.01])
    hook_offset_mean: jnp.ndarray = default_array([0.0, 0.0, -0.02])
    hook_offset_std: jnp.ndarray = default_array([0.01, 0.01, 0.01])

    action_scale: float = 1.0
    action_scale_mean: float = 1.0
    action_scale_std: float = 0.1

    # first-order bodyrate model coefficients
    alpha_bodyrate: float = 0.5
    alpha_thrust: float = 0.6
    alpha_bodyrate_mean: float = 0.5
    alpha_bodyrate_std: float = 0.1

    max_steps_in_episode: int = 300
    rope_taut_therehold: float = 1e-4
    traj_obs_len: int = 5
    traj_obs_gap: int = 5

    # disturbance parameters
    d_offset: jnp.ndarray = default_array([0.0] * 6)
    disturb_period: int = 50
    disturb_scale: float = 0.2
    disturb_params: jnp.ndarray = default_array([0.0] * 6)

    # curriculum / RMA hooks kept for API parity
    curri_params: float = 1.0
    adapt_horizon: int = 4

    # noise scales
    dyn_noise_scale: float = 0.05
    obs_noise_scale: float = 0.05


@struct.dataclass
class Action3D:
    """Physical action (reference: dataclass.py:104-106)."""

    thrust: float
    torque: jnp.ndarray  # (3,) body torque


def pack_state(state: EnvState3D) -> jnp.ndarray:
    """Pack the 16 physical entries of an EnvState3D into one flat vector.

    The packed layout is the rollout engines' native representation; see the
    module docstring for slice assignments.
    """
    return jnp.concatenate(
        [state.pos, state.quat, state.vel, state.omega, state.f_disturb]
    )


def unpack_state(x: jnp.ndarray):
    """Split a packed state vector ``(..., 16)`` into its five components."""
    return x[..., POS], x[..., QUAT], x[..., VEL], x[..., OMEGA], x[..., FDIST]

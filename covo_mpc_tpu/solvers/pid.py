"""Geometric PID controller.

Capability parity with the reference controller
(reference: quadjax/controllers/pid.py:11-83), re-designed in the repo's
batch-first idiom: the control law is three pure broadcasting stages —
force setpoint → tilt setpoint → SO(3) rate command — over ``(..., 3)``
arrays, so one code path serves the interactive solver, vmapped scenario
batches, and CoVO-offline's scanned expansion policy without per-call vmap
wrappers. Oracle parity is pinned by tests/test_harness.py (full eval
protocol) and the offline-schedule pins in tests/test_covo.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from covo_mpc_tpu.models import rotation
from covo_mpc_tpu.models.structs import default_array
from covo_mpc_tpu.solvers.base import BaseSolver


@struct.dataclass
class PIDParams:
    """Gain schedule + controller carry. Field schema is a parity contract
    (reference: pid.py:11-22): CoVO-offline instantiates this with its own
    expansion gains, and the carry (integral, quat_desired) threads through
    the harness exactly like any solver's control_params."""

    Kp: float = 4.0
    Kd: float = 4.0
    Ki: float = 1.0
    Kp_att: float = 4.0
    Ki_att: float = 1.0

    integral: jnp.ndarray = default_array([0.0, 0.0, 0.0])
    quat_desired: jnp.ndarray = default_array([0.0, 0.0, 0.0, 1.0])
    att_integral: jnp.ndarray = default_array([0.0, 0.0, 0.0])


def force_setpoint(gains, plant, *, pos_err, vel_err, integral, acc_ff):
    """Stage 1 — world-frame PD+I force with gravity + feed-forward lift.

    ``f = m (g e_z − Kp e_p − Kd e_v − Ki ∫e_p + a_ff)``. Broadcasts over
    any leading batch dims of the error terms.
    """
    e_z = jnp.zeros_like(pos_err).at[..., 2].set(1.0)
    accel_cmd = (
        plant.g * e_z
        - gains.Kp * pos_err
        - gains.Kd * vel_err
        - gains.Ki * integral
        + acc_ff
    )
    return plant.m * accel_cmd


def tilt_setpoint(f_d):
    """Stage 2 — desired attitude whose body z-axis carries the force.

    Axis–angle from e_z to the force direction; ``e_z × z_d`` has the
    closed form ``(−z_y, z_x, 0)`` so no general cross product is needed.
    Degenerate-direction guards match the reference quirk (pid.py:56-62):
    the small-angle test runs on the ALREADY-replaced angle, so a near-zero
    tilt snaps to a 5e-4 rotation about e_z.
    """
    nrm = jnp.linalg.norm(f_d, axis=-1, keepdims=True)
    z_d = f_d / jnp.maximum(nrm, 1e-3)
    axis_angle = jnp.stack(
        [-z_d[..., 1], z_d[..., 0], jnp.zeros_like(z_d[..., 0])], axis=-1
    )
    angle = jnp.linalg.norm(axis_angle, axis=-1)
    angle = jnp.where(angle < 1e-3, 5e-4, angle)
    e_z = jnp.zeros_like(axis_angle).at[..., 2].set(1.0)
    axis = jnp.where(
        (angle < 1e-3)[..., None], e_z, axis_angle / angle[..., None]
    )
    return rotation.axis_angle_to_rotmat(axis, angle)


def so3_rate_command(R_d, R, kp_att):
    """Stage 3 — body-rate command from the SO(3) attitude error
    ``vee(R_e − R_eᵀ)`` with ``R_e = R_dᵀ R`` (reference: pid.py:65-68)."""
    R_e = jnp.swapaxes(R_d, -1, -2) @ R
    return -kp_att * rotation.vee(R_e - jnp.swapaxes(R_e, -1, -2))


class PIDSolver(BaseSolver):
    def __init__(self, env, control_params) -> None:
        super().__init__(env, control_params)
        # physical constants come from the DEFAULT params, not the (possibly
        # domain-randomized) episode params — reference quirk (pid.py:33)
        self.param = env.default_params

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, obs, state, env_params, rng_act, control_params, info=None):
        p = self.param
        f_d = force_setpoint(
            control_params,
            p,
            pos_err=state.pos - state.pos_tar,
            vel_err=state.vel - state.vel_tar,
            integral=control_params.integral,
            acc_ff=state.acc_tar,
        )
        # thrust = body-z component of the commanded force: ⟨R e_z, f⟩
        R = rotation.quat_to_rotmat(state.quat)
        thrust = jnp.einsum("...i,...i->...", R[..., :, 2], f_d)
        thrust = jnp.clip(thrust, 0.0, p.max_thrust)

        R_d = tilt_setpoint(f_d)
        omega_d = so3_rate_command(R_d, R, control_params.Kp_att)

        # normalized bodyrate action layout: [thrust∈[−1,1], ω/ω_max]
        action = jnp.concatenate(
            [
                thrust[..., None] / p.max_thrust * 2.0 - 1.0,
                omega_d / p.max_omega,
            ],
            axis=-1,
        )

        carry = control_params.replace(
            quat_desired=rotation.rotmat_to_quat(R_d),
            integral=control_params.integral
            + (state.pos - state.pos_tar) * env_params.dt,
        )
        return action, carry, None

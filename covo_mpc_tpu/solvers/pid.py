"""Geometric PID controller.

Baseline controller and CoVO-offline's expansion policy
(reference: quadjax/controllers/pid.py:11-83). World-frame PD+I force,
thrust = body-z component, desired attitude from the force direction via
axis-angle, SO(3) attitude error -> commanded body rate.
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
    """(reference: pid.py:11-22)"""

    Kp: float = 4.0
    Kd: float = 4.0
    Ki: float = 1.0
    Kp_att: float = 4.0
    Ki_att: float = 1.0

    integral: jnp.ndarray = default_array([0.0, 0.0, 0.0])
    quat_desired: jnp.ndarray = default_array([0.0, 0.0, 0.0, 1.0])
    att_integral: jnp.ndarray = default_array([0.0, 0.0, 0.0])


class PIDSolver(BaseSolver):
    def __init__(self, env, control_params) -> None:
        super().__init__(env, control_params)
        # the reference PID reads physical constants from the DEFAULT params,
        # not the (possibly domain-randomized) episode params (pid.py:33)
        self.param = env.default_params

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, obs, state, env_params, rng_act, control_params, info=None):
        p = self.param
        Q = rotation.quat_to_rotmat(state.quat)

        # position loop: world-frame desired force (reference: pid.py:44-50)
        f_d = p.m * (
            jnp.array([0.0, 0.0, p.g])
            - control_params.Kp * (state.pos - state.pos_tar)
            - control_params.Kd * (state.vel - state.vel_tar)
            - control_params.Ki * control_params.integral
            + state.acc_tar
        )
        thrust = (Q.T @ f_d)[2]
        thrust = jnp.clip(thrust, 0.0, p.max_thrust)

        # attitude loop (reference: pid.py:56-68), including the reference's
        # small-angle guards evaluated on the ALREADY-replaced angle
        f_d_norm = jnp.linalg.norm(f_d)
        f_d_norm = jnp.where(f_d_norm < 1e-3, 1e-3, f_d_norm)
        z_d = f_d / f_d_norm
        axis_angle = jnp.cross(jnp.array([0.0, 0.0, 1.0]), z_d)
        angle = jnp.linalg.norm(axis_angle)
        angle = jnp.where(angle < 1e-3, 5e-4, angle)
        axis = jnp.where(angle < 1e-3, jnp.array([0.0, 0.0, 1.0]), axis_angle / angle)
        R_d = rotation.axis_angle_to_rotmat(axis, angle)
        quat_desired = rotation.rotmat_to_quat(R_d)
        R_e = R_d.T @ Q
        angle_err = rotation.vee(R_e - R_e.T)
        omega_d = -control_params.Kp_att * angle_err

        action = jnp.concatenate(
            [
                jnp.array([(thrust / p.max_thrust) * 2.0 - 1.0]),
                omega_d / p.max_omega,
            ]
        )

        integral = control_params.integral + (state.pos - state.pos_tar) * env_params.dt
        control_params = control_params.replace(
            quat_desired=quat_desired, integral=integral
        )
        return action, control_params, None

"""First-order bodyrate quadrotor dynamics, batch-first.

The core integrator operates on packed state arrays ``(..., 16)`` (layout in
:mod:`covo_mpc_tpu.models.structs`) so that N-sample rollouts are single wide
array programs — no per-sample pytrees, no vmap of scalar kernels.

Model semantics follow the reference ODE exactly
(reference: quadjax/dynamics/free.py:75-112):

  r'     = v                       (Euler)
  q'     = 0.5 * q x (omega, 0)    (Euler + renormalize)
  v'     = [0,0,-g] + (R(q) @ [0,0,thrust] + f_disturb) / m
  omega+ = alpha * omega + (1 - alpha) * omega_tar   (first-order lag)

with normalized action u = [thrust_cmd, omega_cmd] scaled by
``params.action_scale`` and omega_cmd mapped through
``torque / max_torque * max_omega`` (reference: free.py:122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from covo_mpc_tpu.models import rotation
from covo_mpc_tpu.models.structs import FDIST, OMEGA, POS, QUAT, VEL, EnvParams3D


def control_to_thrust_omega(action: jnp.ndarray, params: EnvParams3D) -> jnp.ndarray:
    """Map a normalized action in [-1, 1]^4 to [thrust, omega_tar].

    thrust = (a0 + 1)/2 * max_thrust          (reference: quadrotor.py:259)
    torque = a1:4 * max_torque                (reference: quadrotor.py:260)
    omega_tar = torque / max_torque * max_omega  (reference: free.py:122)

    The torque round-trip cancels algebraically; it is kept explicit so the
    intermediate matches the reference's recorded ``last_torque``.
    """
    action = jnp.clip(action, -1.0, 1.0)
    thrust = (action[..., 0:1] + 1.0) / 2.0 * params.max_thrust
    torque = action[..., 1:4] * params.max_torque
    omega_tar = torque / params.max_torque * params.max_omega
    return jnp.concatenate([thrust, omega_tar], axis=-1), torque


def bodyrate_step(
    x: jnp.ndarray, u: jnp.ndarray, params: EnvParams3D, dt
) -> jnp.ndarray:
    """One Euler step of the packed-state dynamics (reference: free.py:75-112).

    THE array-form definition of the bodyrate ODE: the jnp rollout engine
    integrates it N-wide, and the adjoint Hessian differentiates it
    (ops/hessian._step13 delegates here). The Pallas kernels run the
    component-form twin (models/scalar_core.bodyrate_step) because
    register slabs cannot take vector ops; the two forms are pinned
    against each other by tests/test_dynamics.py. They are kept as two
    layouts of one ODE deliberately: vector HLO is what XLA fuses best
    for wide batches (the component form costs ~15% on the jnp engine and
    +0.04 ms on the Hessian), while bit-unification is impossible anyway
    because XLA's FMA placement is layout-dependent.

    Args:
      x: packed state ``(..., 16)``; the input quaternion may be un-normalized
         (it is normalized on entry, as the reference does at free.py:88).
      u: physical control ``(..., 4)`` = [thrust (N), omega_tar (rad/s)],
         already action-scaled? No — scaling by ``params.action_scale`` happens
         here (reference: free.py:82).
      dt: integration step.

    Returns the packed next state with a normalized quaternion (the reference
    wrapper normalizes when writing back to EnvState3D, free.py:139).
    """
    u = u * params.action_scale
    thrust = u[..., 0]
    omega_tar = u[..., 1:4]

    r = x[..., POS]
    q = rotation.quat_normalize(x[..., QUAT])
    v = x[..., VEL]
    omega = x[..., OMEGA]
    f_disturb = x[..., FDIST]

    # translational dynamics: thrust along the body z-axis + disturbance
    thrust_world = rotation.body_z_world(q) * thrust[..., None]
    g_vec = jnp.zeros_like(v).at[..., 2].set(-params.g)
    v_dot = g_vec + (thrust_world + f_disturb) / params.m

    # rotational kinematics
    omega_quat = jnp.concatenate(
        [omega, jnp.zeros(omega.shape[:-1] + (1,), dtype=omega.dtype)], axis=-1
    )
    q_dot = 0.5 * rotation.quat_mul(q, omega_quat)

    r_new = r + v * dt
    q_new = rotation.quat_normalize(q + q_dot * dt)
    v_new = v + v_dot * dt
    omega_new = params.alpha_bodyrate * omega + (1.0 - params.alpha_bodyrate) * omega_tar

    return jnp.concatenate([r_new, q_new, v_new, omega_new, f_disturb], axis=-1)


# ---------------------------------------------------------------------------
# Disturbance models (reference: free.py:10-72)
#
# Each takes (key, params, time, vel, f_disturb) with `vel`/`f_disturb`
# batched (..., 3) and `time` a scalar (all rollout samples share the clock),
# and returns the new (..., 3) disturbance. In rollouts the reference reuses
# one step key for every sample and step (reference: mppi.py:69,74), which
# makes the stochastic draws *shared* — the batched form here computes the
# shared draw once and broadcasts it.
# ---------------------------------------------------------------------------


def periodic_disturb(key, params, time, vel, f_disturb):
    """Re-draw a uniform disturbance every `disturb_period` steps
    (reference: free.py:10-24)."""
    draw = jax.random.uniform(
        key, shape=(3,), minval=-params.disturb_scale, maxval=params.disturb_scale
    )
    return jnp.where(time % params.disturb_period == 0, draw, f_disturb)


def sin_disturb(key, params, time, vel, f_disturb):
    """Per-axis sinusoidal disturbance (reference: free.py:27-38)."""
    scale = params.disturb_params[:3] * params.disturb_scale
    period = params.disturb_params[:3] * (params.disturb_period / 3) + params.disturb_period
    phase = params.disturb_params[3:6] * 2.0 * jnp.pi
    draw = scale * jnp.sin(2.0 * jnp.pi / period * time + phase)
    return jnp.broadcast_to(draw, f_disturb.shape)


def drag_disturb(key, params, time, vel, f_disturb):
    """Quadratic drag against relative wind (reference: free.py:41-47)."""
    rel_vel = vel - params.disturb_params[:3] * 0.5
    return -jnp.abs(params.disturb_scale) * rel_vel * jnp.abs(rel_vel) / (1.5**2)


def mixed_disturb(key, params, time, vel, f_disturb):
    """(drag + sin + periodic) / 3 (reference: free.py:50-56)."""
    d = (
        drag_disturb(key, params, time, vel, f_disturb)
        + sin_disturb(key, params, time, vel, f_disturb)
        + periodic_disturb(key, params, time, vel, f_disturb)
    )
    return d / 3.0


def gaussian_disturb(key, params, time, vel, f_disturb):
    """i.i.d. Gaussian force noise scaled by dyn_noise_scale
    (reference: free.py:66-70). The scale is zeroed in deterministic rollouts
    (reference: quadrotor.py:233-235)."""
    draw = params.dyn_noise_scale * jax.random.normal(key, shape=(3,))
    return jnp.broadcast_to(draw, f_disturb.shape)


def none_disturb(key, params, time, vel, f_disturb):
    return jnp.zeros_like(f_disturb)


DISTURB_FNS = {
    "periodic": periodic_disturb,
    "sin": sin_disturb,
    "drag": drag_disturb,
    "mixed": mixed_disturb,
    "gaussian": gaussian_disturb,
    "none": none_disturb,
}


def get_disturb_fn(disturb_type: str):
    """Disturbance name -> batched disturbance fn (reference: free.py:58-72)."""
    if disturb_type not in DISTURB_FNS:
        raise NotImplementedError(f"unknown disturb_type {disturb_type!r}")
    return DISTURB_FNS[disturb_type]


def derive_dynamics_keys(step_key: jax.Array, fast: bool = False):
    """Replicate the reference's key-split chain from `step_env`'s key down to
    the disturbance draw (parity-critical, SURVEY §3.6).

    raw_step:       key, step_key' = split(key)          (quadrotor.py:262)
    free_dynamics:  key', key_dyn  = split(step_key')    (free.py:136)
                    disturb_key, _ = split(key')         (free.py:144)

    Returns the bare disturb key (not a tuple).

    ``fast=True`` short-circuits to ``step_key`` itself: the three
    sequential threefry splits exist only to REPLICATE the reference's
    key tree, and inside a rollout solve the step key has no other
    consumer, so using it directly is collision-free and the downstream
    draw still hashes it. The chain is pure serial scalar-u32 work on
    the solve's critical path — device-trace measured 9.1 us of the
    62 us MPPI kernel-rng solve (scripts/kernel_ab.py). Only non-parity
    sampler modes may pass fast=True (quality re-gated, RESULTS.md).
    """
    if fast:
        return step_key
    step_key2 = jax.random.split(step_key)[1]
    key2 = jax.random.split(step_key2)[0]
    disturb_key = jax.random.split(key2)[0]
    return disturb_key

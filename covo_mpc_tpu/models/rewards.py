"""Reward / cost functions, batch-first.

Every function takes plain arrays (broadcasting over leading batch dims)
rather than a state pytree, so the rollout engines evaluate rewards for all
N samples in one wide VPU pass. Thin pytree wrappers at the bottom keep the
reference's state-based signature for the episode harness
(reference: quadjax/dynamics/utils.py:254-313).
"""

from __future__ import annotations

import jax.numpy as jnp

from covo_mpc_tpu.models import scalar_core
from covo_mpc_tpu.models.rotation import yaw_from_quat

# the multi-scale log barrier is layout-free elementwise math — one
# definition, shared with the Pallas kernels (scalar_core)
log_pos_penalty = scalar_core.log_pos_penalty


def hovering_reward(pos, vel, pos_tar, vel_tar) -> jnp.ndarray:
    """(reference: utils.py:260-263)"""
    err_pos = jnp.linalg.norm(pos_tar - pos, axis=-1)
    err_vel = jnp.linalg.norm(vel_tar - vel, axis=-1)
    return 1.0 - 0.6 * err_pos - 0.1 * err_vel


def tracking_reward(pos, vel, pos_tar, vel_tar) -> jnp.ndarray:
    """(reference: utils.py:278-282)"""
    err_pos = jnp.linalg.norm(pos_tar - pos, axis=-1)
    err_vel = jnp.linalg.norm(vel_tar - vel, axis=-1)
    return 1.0 - 0.05 * err_vel - log_pos_penalty(err_pos)


def tracking_penyaw_reward(pos, vel, quat, pos_tar, vel_tar) -> jnp.ndarray:
    """THE cost model used by the MPPI / CoVO tasks
    (reference: utils.py:286-294): tracking reward with a yaw penalty.

    Array-form definition — the rollout engines and the adjoint Hessian
    (ops/hessian._reward13 delegates here) consume this; the Pallas
    kernels run the component-form twin (scalar_core.penyaw_reward),
    pinned against this one by tests/test_rewards.py. linalg.norm is
    deliberate: it is bit-exact with the reference's reward (the closed-
    loop parity contract is ulp-sensitive, BASELINE.md)."""
    err_pos = jnp.linalg.norm(pos_tar - pos, axis=-1)
    err_vel = jnp.linalg.norm(vel_tar - vel, axis=-1)
    yaw = yaw_from_quat(quat)
    return 1.3 - 0.05 * err_vel - log_pos_penalty(err_pos) - jnp.abs(yaw) * 0.2


def tracking_realworld_reward(pos, quat, pos_tar) -> jnp.ndarray:
    """Quadratic real-world cost (reference: utils.py:298-313); array-form
    twin of scalar_core.realworld_reward."""
    pos_err = jnp.mean((pos - pos_tar) ** 2, axis=-1)
    quat_err = 1.0 - quat[..., 3] ** 2
    cost = (5.0 * pos_err + 3.0 * quat_err) * 0.02
    return -cost


# --- pytree wrappers with the reference signature reward_fn(state, params) ---


def hovering_reward_fn(state, params=None):
    return hovering_reward(state.pos, state.vel, state.pos_tar, state.vel_tar)


def tracking_reward_fn(state, params=None):
    return tracking_reward(state.pos, state.vel, state.pos_tar, state.vel_tar)


def tracking_penyaw_reward_fn(state, params=None):
    return tracking_penyaw_reward(
        state.pos, state.vel, state.quat, state.pos_tar, state.vel_tar
    )


def tracking_realworld_reward_fn(state, params=None):
    return tracking_realworld_reward(state.pos, state.quat, state.pos_tar)


def get_reward_name(task: str) -> str:
    """Task -> reward-kernel name (reference: quadrotor.py:50-84)."""
    rewards = {
        "tracking": "penyaw",
        "tracking_slow": "realworld",
        "tracking_zigzag": "penyaw",
        "hovering": "penyaw",
    }
    if task not in rewards:
        raise NotImplementedError(f"unknown task {task!r}")
    return rewards[task]


def get_reward_fn(task: str):
    """Task -> state-based reward function (reference: quadrotor.py:50-84)."""
    return {
        "penyaw": tracking_penyaw_reward_fn,
        "realworld": tracking_realworld_reward_fn,
    }[get_reward_name(task)]

"""Episode-statistics logging for auto-resetting environments.

Capability parity with the reference's LogWrapper
(reference: quadjax/envs/base.py:53-107): running return/length
accumulators that latch into ``returned_*``/``final_reward`` fields at
episode boundaries, surviving the env's in-jit auto-reset. Re-designed
functionally: the log is its own pytree advanced by a pure
:func:`advance_log` (select-based latching), and :class:`LogWrapper` is a
thin shim binding it to an env's reset/step. Unused on the MPC hot path —
the reference's RL branch is its consumer — but part of the env API
surface.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EpisodeLog:
    """Running stats of the in-flight episode + latched stats of the last
    finished one. Scalar leaves so it vmaps/scans like any carry."""

    returns: jnp.ndarray  # return accumulated so far this episode
    length: jnp.ndarray  # steps so far this episode
    last_returns: jnp.ndarray  # latched at the most recent done
    last_length: jnp.ndarray
    last_reward: jnp.ndarray  # reward of the terminal step


def fresh_log() -> EpisodeLog:
    z = jnp.float32(0.0)
    return EpisodeLog(z, jnp.int32(0), z, jnp.int32(0), z)


def advance_log(log: EpisodeLog, reward, done) -> EpisodeLog:
    """One step: accumulate; on done, latch the totals and zero the
    accumulators (the env auto-resets in the same step)."""
    ret = log.returns + reward
    n = log.length + 1

    def latch(finished, held):
        return jnp.where(done, finished, held)

    return EpisodeLog(
        returns=latch(jnp.zeros_like(ret), ret),
        length=latch(jnp.zeros_like(n), n),
        last_returns=latch(ret, log.last_returns),
        last_length=latch(n, log.last_length),
        last_reward=latch(reward, log.last_reward),
    )


def log_info(log: EpisodeLog, done) -> dict:
    """The info-dict keys the reference's consumers read
    (reference: base.py:96-102)."""
    return {
        "returned_episode_returns": log.last_returns,
        "returned_episode_lengths": log.last_length,
        "returned_episode": done,
        "final_reward": log.last_reward,
    }


@struct.dataclass
class LogEnvState:
    env_state: Any
    log: EpisodeLog

    # reference-named accessors (base.py:62-68) so downstream code written
    # against the reference's flat field layout keeps working
    @property
    def episode_returns(self):
        return self.log.returns

    @property
    def episode_lengths(self):
        return self.log.length

    @property
    def returned_episode_returns(self):
        return self.log.last_returns

    @property
    def returned_episode_lengths(self):
        return self.log.last_length

    @property
    def final_reward(self):
        return self.log.last_reward


class LogWrapper:
    """Bind the episode log to an env: delegates everything, threads an
    :class:`EpisodeLog` alongside the env state."""

    def __init__(self, env):
        self._env = env

    def __getattr__(self, name):
        return getattr(self._env, name)

    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: jax.Array, params=None):
        obs, info, env_state = self._env.reset(key, params)
        log = fresh_log()
        return (
            obs,
            {**info, **log_info(log, done=False)},
            LogEnvState(env_state, log),
        )

    @partial(jax.jit, static_argnums=(0,))
    def step(self, key: jax.Array, state: LogEnvState, action, params=None):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        log = advance_log(state.log, reward, done)
        return (
            obs,
            LogEnvState(env_state, log),
            reward,
            done,
            {**info, **log_info(log, done)},
        )

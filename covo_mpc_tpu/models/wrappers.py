"""Environment wrappers.

`LogWrapper` reproduces the reference's episode-return/length accounting
(reference: quadjax/envs/base.py:53-107) — unused on the MPC path but part
of the environment API surface (the reference's RL branch consumes it).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LogEnvState:
    env_state: struct.dataclass
    episode_returns: float
    episode_lengths: int
    returned_episode_returns: float
    returned_episode_lengths: int
    final_reward: float


class LogWrapper:
    """Accumulate per-episode returns/lengths across auto-resets."""

    def __init__(self, env):
        self._env = env

    def __getattr__(self, name):
        return getattr(self._env, name)

    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: jax.Array, params=None):
        obs, info, env_state = self._env.reset(key, params)
        info["returned_episode_returns"] = 0.0
        info["returned_episode_lengths"] = 0
        info["returned_episode"] = False
        info["final_reward"] = 0.0
        state = LogEnvState(env_state, 0.0, 0, 0.0, 0, 0.0)
        return obs, info, state

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self,
        key: jax.Array,
        state: LogEnvState,
        action: Union[int, float, jnp.ndarray],
        params=None,
    ):
        obs, env_state, reward, done, info = self._env.step(
            key, state.env_state, action, params
        )
        new_return = state.episode_returns + reward
        new_length = state.episode_lengths + 1
        state = LogEnvState(
            env_state=env_state,
            episode_returns=new_return * (1 - done),
            episode_lengths=new_length * (1 - done),
            returned_episode_returns=state.returned_episode_returns * (1 - done)
            + new_return * done,
            returned_episode_lengths=state.returned_episode_lengths * (1 - done)
            + new_length * done,
            final_reward=reward * done + state.final_reward * (1 - done),
        )
        info["returned_episode_returns"] = state.returned_episode_returns
        info["returned_episode_lengths"] = state.returned_episode_lengths
        info["returned_episode"] = done
        info["final_reward"] = state.final_reward
        return obs, state, reward, done, info

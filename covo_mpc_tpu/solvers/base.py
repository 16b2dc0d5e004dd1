"""Solver (controller) protocol.

Call signature matches the reference controller ABC so harnesses and user
code port over directly (reference: quadjax/controllers/base.py:5-19):

    action, control_params, info = solver(obs, state, env_params, rng_act,
                                          control_params, env_info)

Solvers are stateless Python objects holding static configuration; all
mutable state lives in their ``*Params`` flax structs, so a solver instance
is safely usable as a jit static argument.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import numpy as jnp


class BaseSolver:
    def __init__(self, env, control_params) -> None:
        self.env = env
        self.init_control_params = control_params

    def update_params(self, env_params, control_params):
        return control_params

    def reset(self, env_state=None, env_params=None, control_params=None, key=None):
        """Return fresh solver params (reference: base.py:14)."""
        return self.init_control_params

    @partial(jax.jit, static_argnums=(0,))
    def __call__(
        self, obs, state, env_params, rng_act, control_params, env_info=None
    ) -> jnp.ndarray:
        raise NotImplementedError


class RandomSolver(BaseSolver):
    """N(0, 0.3²) actions (reference: quadjax/controllers/random.py:15-16)."""

    def __call__(self, obs, state, env_params, rng_act, control_params, env_info=None):
        action = jax.random.normal(rng_act, (self.env.action_dim,)) * 0.3
        return action, control_params, None

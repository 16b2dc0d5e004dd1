"""Jitted episode runner.

One compiled XLA program runs the whole control episode — controller solve,
env step, auto-reset — exactly like the reference's jitted `run_one_ep`
(reference: quadjax/envs/quadrotor.py:520-563), including its RNG-split
chain so that seeded episodes are directly comparable.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def make_episode_runner(env, controller, steps: Optional[int] = None):
    """Build ``run_one_ep(rng_reset, rng, env_params=None) ->
    (rng_out, err_pos (T,), dones (T,), metrics)``.

    ``err_pos[t]`` is the tracking error of the PRE-step state at step t
    (reference: quadrotor.py:355 via get_info), so ``err_pos.mean()``
    reproduces the reference's episode metric. ``metrics`` is a dict of
    per-step (T,) arrays when the controller was built with
    ``collect_metrics=True`` (ESS, cost quantiles, Σ conditioning —
    runtime/metrics.py), else ``{}``.
    """
    T = steps or env.default_params.max_steps_in_episode

    def run_one_step(carry, _):
        obs, env_state, rng, env_params, control_params, env_info = carry
        rng, rng_act, rng_step, rng_control = jax.random.split(rng, 4)
        action, control_params, control_info = controller(
            obs, env_state, env_params, rng_act, control_params, env_info
        )
        # mean-action hook for stochastic policies (reference: quadrotor.py:527-529)
        if control_info is not None and "a_mean" in control_info:
            action = control_info["a_mean"]
        next_obs, next_state, reward, done, info = env.step(
            rng_step, env_state, action, env_params
        )
        rng, rng_control = jax.random.split(rng)
        solve_metrics = (control_info or {}).get("metrics", {})
        return (next_obs, next_state, rng, env_params, control_params, info), (
            info["err_pos"],
            done,
            solve_metrics,
        )

    @jax.jit
    def run_one_ep(rng_reset, rng, env_params=None):
        if env_params is None:
            env_params = env.default_params
        obs, info, env_state = env.reset(rng_reset, env_params)
        rng_control, rng = jax.random.split(rng)
        control_params = controller.reset(
            env_state, env_params, controller.init_control_params, rng_control
        )
        carry, (err_pos, dones, metrics) = lax.scan(
            run_one_step,
            (obs, env_state, rng, env_params, control_params, info),
            None,
            length=T,
        )
        return carry[2], err_pos, dones, metrics

    return run_one_ep

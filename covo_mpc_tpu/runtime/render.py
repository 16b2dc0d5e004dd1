"""Render harness: record a full episode trace for plotting / 3-D replay.

Reference behavior (reference: quadjax/envs/quadrotor.py:594-667): run an
episode step-by-step with domain-randomized params, record every state,
plot dashboards, persist the sequence. Differences by design:

  * the episode itself runs as ONE jitted scan on device (the reference
    crosses host<->device every step), with the recorded channels stacked
    as arrays;
  * traces persist as structured ``.npz`` (arrays, portable) instead of
    pickled python objects.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

RECORD_FIELDS = (
    "pos", "vel", "quat", "omega", "omega_tar", "pos_tar", "vel_tar",
    "last_thrust", "last_torque", "f_disturb", "time",
)


def render_episode(
    env,
    controller,
    seed: int = 1,
    steps: Optional[int] = None,
    env_params=None,
    reset_on_done: bool = False,
):
    """Run one recorded episode. Returns a dict of stacked arrays with keys
    RECORD_FIELDS + reward/done/err_pos, each shaped (T, ...).

    ``reset_on_done`` reproduces the reference harness's mid-recording
    resets (reference: quadrotor.py:633-640): every time an episode ends
    inside the recording, re-sample the env params and reset the
    controller — with the reference's exact key-split chain and arguments
    (the PRE-step state, the CURRENT control params, the NEW params).
    Note the auto-reset inside ``env.step`` has already re-initialized the
    episode state under the OLD params (reference: base.py:31-39); the new
    draw takes effect from the following step, as in the reference. Off by
    default: recordings are usually single-episode (under the CLI defaults
    dones only occur at the time limit), and the env params stay fixed.
    """
    T = steps or env.default_params.max_steps_in_episode
    rng = jax.random.PRNGKey(seed)
    rng, rng_params = jax.random.split(rng)
    if env_params is None:
        env_params = env.sample_params(rng_params)

    rng, rng_reset = jax.random.split(rng)
    obs, info, state = env.reset(rng_reset, env_params)
    rng, rng_control = jax.random.split(rng)
    control_params = controller.reset(
        state, env_params, controller.init_control_params, rng_control
    )

    def step(carry, _):
        obs, state, rng, env_params, control_params, info = carry
        record = {f: getattr(state, f) for f in RECORD_FIELDS}
        rng, rng_act, rng_step = jax.random.split(rng, 3)
        action, control_params, _ = controller(
            obs, state, env_params, rng_act, control_params, info
        )
        next_obs, next_state, reward, done, next_info = env.step(
            rng_step, state, action, env_params
        )
        if reset_on_done:
            def on_done(args):
                rng, env_params, control_params = args
                # reference key chain on done (quadrotor.py:633-640)
                rng, rng_params = jax.random.split(rng)
                new_params = env.sample_params(rng_params)
                rng, rng_control = jax.random.split(rng)
                new_cp = controller.reset(
                    state, new_params, control_params, rng_control
                )
                return rng, new_params, new_cp

            rng, env_params, control_params = lax.cond(
                done, on_done, lambda args: args,
                (rng, env_params, control_params),
            )
        # the step-RETURNED info's err_pos is evaluated on the PRE-step
        # state (get_info(state, ...), the reference quirk) — i.e. on
        # exactly the state this record snapshots; the carry `info` held
        # the PREVIOUS step's error, shifting the channel one step
        # against pos/reward/action (r5 review finding; episode.py's
        # eval protocol already records the returned info)
        record.update(
            reward=reward, done=done, err_pos=next_info["err_pos"],
            action=action,
        )
        return (
            next_obs, next_state, rng, env_params, control_params, next_info
        ), record

    @jax.jit
    def run(obs, state, rng, env_params, control_params, info):
        _, records = lax.scan(
            step, (obs, state, rng, env_params, control_params, info),
            None, length=T,
        )
        return records

    records = run(obs, state, rng, env_params, control_params, info)
    return {k: np.asarray(v) for k, v in records.items()}


def save_trace(trace: dict, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **trace)
    return path


def load_trace(path: str) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}

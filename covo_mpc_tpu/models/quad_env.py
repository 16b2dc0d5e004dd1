"""Quad3D environment: functional, jit-first, self-contained.

Re-designs the reference environment (reference: quadjax/envs/quadrotor.py:23-503
and quadjax/envs/base.py:11-50) without the gymnax dependency. The API keeps
the reference's functional surface — ``step(key, state, action, params)``,
``reset(key, params)``, ``step_env``, ``reset_env``, ``sample_params``,
``get_obs``, ``is_terminal``, ``reward_fn`` — so controllers and harnesses
port over unchanged, but internally each step is one packed-state array
program (see :mod:`covo_mpc_tpu.models.dynamics`).

The environment object is a frozen config carrier: hashable and usable as a
static argument under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from covo_mpc_tpu.models import dynamics, rewards, trajectory
from covo_mpc_tpu.models.structs import (
    Action3D,
    EnvParams3D,
    EnvState3D,
    pack_state,
)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (reference: quadrotor.py:29-38)."""

    task: str = "tracking"  # tracking | tracking_slow | tracking_zigzag | hovering
    obs_type: str = "quad"  # quad | quad_params
    enable_randomizer: bool = True
    lower_controller: str = "base"  # only "base" is in scope; hook preserved
    disturb_type: str = "periodic"  # periodic | sin | drag | mixed | gaussian | none
    disable_rollover_terminate: bool = False
    generate_noisy_state: bool = False
    substeps: int = 1


class QuadEnv:
    """Crazyflie-2 quadrotor with first-order bodyrate dynamics."""

    def __init__(self, config: EnvConfig = EnvConfig(), **overrides):
        if overrides:
            config = dataclasses.replace(config, **overrides)
        self.config = config

        defaults = EnvParams3D()
        self._max_steps = int(defaults.max_steps_in_episode)
        self._dt = float(defaults.dt)
        self._traj_obs_len = int(defaults.traj_obs_len)
        self._traj_obs_gap = int(defaults.traj_obs_gap)
        self._adapt_horizon = int(defaults.adapt_horizon)
        self._obs_noise_scale = float(defaults.obs_noise_scale)

        self.generate_traj = partial(
            trajectory.get_generator(config.task), self._max_steps, self._dt
        )
        self.reward_fn = rewards.get_reward_fn(config.task)
        self.reward_name = rewards.get_reward_name(config.task)
        self.disturb_fn = dynamics.get_disturb_fn(config.disturb_type)

        if config.lower_controller != "base":
            # The reference's l1 / l1_estimate_only paths live on its rl
            # branch and are broken in the MPC branch (quadrotor.py:101-126);
            # the hook is the supported extension point.
            raise NotImplementedError(
                "only the 'base' lower controller is supported; "
                "pass a custom control_fn via subclassing"
            )

        if config.obs_type == "quad":
            self.get_obs = self.get_obs_quadonly
            self.obs_dim = 19 + self._traj_obs_len * 6
        elif config.obs_type == "quad_params":
            self.get_obs = self.get_obs_quad_params
            # 49 state/traj dims + 18 normalized parameter dims. (The
            # reference declares 39 + 30 at quadrotor.py:179 but its builders
            # actually emit 67; we report the real width.)
            self.obs_dim = 19 + self._traj_obs_len * 6 + 18
        elif config.obs_type == "params":
            self.get_obs = self.get_obs_paramsonly
            self.obs_dim = 18
        elif config.obs_type == "adapt_hist":
            self.get_obs = self.get_obs_adapt_hist
            # 7 feature blocks x adapt_horizon rows: vel/omega/dvel/ddvel/
            # domega/ddomega (3 cols each) + action_hist (4 cols)
            self.obs_dim = self._adapt_horizon * 22
        else:
            # "quad_l1" needs the L1 lower controller, which lives on the
            # reference's rl branch and is broken in its MPC branch
            # (quadrotor.py:472-477, 101-126) — out of scope like the hook.
            raise NotImplementedError(f"unknown obs_type {config.obs_type!r}")

        self.action_dim = 4
        self.default_control_params = 0.0

    # -- static-arg hashing -------------------------------------------------
    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, QuadEnv) and self.config == other.config

    # -- parameters ---------------------------------------------------------
    @property
    def default_params(self) -> EnvParams3D:
        return EnvParams3D()

    def sample_params(self, key: jax.Array) -> EnvParams3D:
        """Domain-randomized (or default) parameters
        (reference: quadrotor.py:133-171)."""
        if self.config.enable_randomizer:
            param_key = jax.random.split(key)[0]
            rand = jax.random.uniform(param_key, shape=(17,), minval=-1.0, maxval=1.0)
            p = self.default_params
            return EnvParams3D(
                m=p.m_mean + rand[0] * p.m_std,
                I_diag=p.I_diag_mean + rand[1:4] * p.I_diag_std,
                action_scale=p.action_scale_mean + rand[4] * p.action_scale_std,
                alpha_bodyrate=p.alpha_bodyrate_mean + rand[5] * p.alpha_bodyrate_std,
                disturb_params=rand[6:12] * p.disturb_scale,
            )
        # noDR still randomizes the disturbance parameters, unscaled
        # (reference: quadrotor.py:165-169)
        disturb_params = jax.random.uniform(key, shape=(6,), minval=-1.0, maxval=1.0)
        return EnvParams3D(disturb_params=disturb_params)

    # -- error metrics ------------------------------------------------------
    @staticmethod
    def get_err_pos(state: EnvState3D) -> jnp.ndarray:
        return jnp.linalg.norm(state.pos_tar - state.pos)

    @staticmethod
    def get_err_vel(state: EnvState3D) -> jnp.ndarray:
        return jnp.linalg.norm(state.vel_tar - state.vel)

    # -- reset --------------------------------------------------------------
    def get_zero_state(self, key: jax.Array, params: EnvParams3D) -> EnvState3D:
        """Initial state at the origin with a fresh trajectory
        (reference: quadrotor.py:265-312)."""
        traj_key, disturb_key, key = jax.random.split(key, 3)
        pos_traj, vel_traj, acc_traj = self.generate_traj(traj_key)
        zeros3 = jnp.zeros(3, dtype=jnp.float32)
        hist = self._adapt_horizon + 2
        return EnvState3D(
            pos=zeros3,
            vel=zeros3,
            omega=zeros3,
            omega_tar=zeros3,
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32),
            pos_tar=pos_traj[0],
            vel_tar=vel_traj[0],
            acc_tar=acc_traj[0],
            pos_traj=pos_traj,
            vel_traj=vel_traj,
            acc_traj=acc_traj,
            last_thrust=0.0,
            last_torque=zeros3,
            time=0,
            f_disturb=jax.random.uniform(
                disturb_key,
                shape=(3,),
                minval=-params.disturb_scale,
                maxval=params.disturb_scale,
            ),
            vel_hist=jnp.zeros((hist, 3), dtype=jnp.float32),
            omega_hist=jnp.zeros((hist, 3), dtype=jnp.float32),
            action_hist=jnp.zeros((hist, 4), dtype=jnp.float32),
            control_params=self.default_control_params,
        )

    get_init_state = get_zero_state

    def reset_env(
        self, key: jax.Array, params: EnvParams3D
    ) -> Tuple[jnp.ndarray, dict, EnvState3D]:
        """(reference: quadrotor.py:363-370) — returns (obs, info, state)."""
        state = self.get_init_state(key, params)
        info_key, key = jax.random.split(key)
        info = self.get_info(info_key, state, state, params)
        return self.get_obs(state, params), info, state

    @partial(jax.jit, static_argnums=(0,))
    def reset(
        self, key: jax.Array, params: Optional[EnvParams3D] = None
    ) -> Tuple[jnp.ndarray, dict, EnvState3D]:
        if params is None:
            params = self.default_params
        return self.reset_env(key, params)

    # -- step ---------------------------------------------------------------
    def control_fn(self, obs, state, params, key, input_action):
        """Lower-level controller hook; 'base' = identity
        (reference: quadrotor.py:94-100)."""
        return input_action, None, state

    def raw_step(
        self,
        key: jax.Array,
        state: EnvState3D,
        sub_action: jnp.ndarray,
        params: EnvParams3D,
    ) -> EnvState3D:
        """One dynamics step + bookkeeping (reference: quadrotor.py:250-263
        and free.py:114-202), implemented over the packed state."""
        sub_action = jnp.clip(sub_action, -1.0, 1.0)
        u, torque = dynamics.control_to_thrust_omega(sub_action, params)
        thrust = u[..., 0]

        x = pack_state(state)
        x_new = dynamics.bodyrate_step(x, u, params, self._dt)

        # disturbance update from the PRE-step state (reference: free.py:147)
        disturb_key = dynamics.derive_dynamics_keys(key)
        f_disturb = self.disturb_fn(
            disturb_key, params, state.time, state.vel, state.f_disturb
        )

        time = state.time + 1
        # gather clamps at the table end, matching XLA's default clamping the
        # reference relies on when rollout horizons overrun the table
        t_idx = jnp.clip(time, 0, state.pos_traj.shape[0] - 1)

        normed_action = jnp.concatenate(
            [
                jnp.asarray([thrust]) / params.max_thrust * 2.0 - 1.0,
                torque / params.max_torque,
            ]
        )
        return state.replace(
            pos=x_new[..., 0:3],
            quat=x_new[..., 3:7],
            vel=x_new[..., 7:10],
            omega=x_new[..., 10:13],
            pos_tar=state.pos_traj[t_idx],
            vel_tar=state.vel_traj[t_idx],
            acc_tar=state.acc_traj[t_idx],
            omega_tar=u[..., 1:4],
            last_thrust=thrust,
            last_torque=torque,
            time=time,
            f_disturb=f_disturb,
            vel_hist=jnp.concatenate([state.vel_hist[1:], state.vel[None]]),
            omega_hist=jnp.concatenate([state.omega_hist[1:], state.omega[None]]),
            action_hist=jnp.concatenate([state.action_hist[1:], normed_action[None]]),
        )

    def step_env(
        self,
        key: jax.Array,
        state: EnvState3D,
        action: jnp.ndarray,
        params: EnvParams3D,
        deterministic: bool = False,
    ) -> Tuple[jnp.ndarray, EnvState3D, jnp.ndarray, jnp.ndarray, dict]:
        """(reference: quadrotor.py:215-248). Reward and termination are
        evaluated on the PRE-step state — a reference quirk that is
        parity-critical (quadrotor.py:243-244)."""
        action = jnp.clip(action, -1.0, 1.0)
        params = params.replace(
            dyn_noise_scale=params.dyn_noise_scale * (1.0 - deterministic)
        )

        def substep(carry, _):
            key, st, act, prm = carry
            sub_action, _, st = self.control_fn(None, st, prm, key, act)
            next_st = self.raw_step(key, st, sub_action, prm)
            return (key, next_st, act, prm), None

        (_, next_state, _, _), _ = jax.lax.scan(
            substep, (key, state, action, params), None, length=self.config.substeps
        )

        reward = self.reward_fn(state, params)
        done = self.is_terminal(state, params)
        info_key, key = jax.random.split(key)
        info = self.get_info(info_key, state, next_state, params)
        obs = self.get_obs(next_state, params)
        return obs, next_state, reward, done, info

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self,
        key: jax.Array,
        state: EnvState3D,
        action: jnp.ndarray,
        params: Optional[EnvParams3D] = None,
    ) -> Tuple[jnp.ndarray, EnvState3D, jnp.ndarray, jnp.ndarray, dict]:
        """Auto-resetting step (reference: base.py:16-40): run both step_env
        and reset_env, select on `done`."""
        if params is None:
            params = self.default_params
        key, key_reset = jax.random.split(key)
        obs_st, state_st, reward, done, info = self.step_env(key, state, action, params)
        obs_re, info_re, state_re = self.reset_env(key_reset, params)
        state = jax.tree.map(lambda a, b: jax.lax.select(done, a, b), state_re, state_st)
        info = jax.tree.map(lambda a, b: jax.lax.select(done, a, b), info_re, info)
        obs = jax.lax.select(done, obs_re, obs_st)
        return obs, state, reward, done, info

    # -- info / termination -------------------------------------------------
    def get_info(
        self,
        key: jax.Array,
        state: EnvState3D,
        next_state: EnvState3D,
        params: EnvParams3D,
    ) -> dict:
        """(reference: quadrotor.py:314-361). ``noisy_state`` injects
        observation noise into the controller's view of the next state using
        the DEFAULT obs_noise_scale, not the randomized one
        (reference: quadrotor.py:324)."""
        if self.config.generate_noisy_state:
            k_pos, k_vel, k_quat, k_omega, key = jax.random.split(key, 5)
            s = self._obs_noise_scale
            noisy_state = next_state.replace(
                pos=next_state.pos + jax.random.normal(k_pos, (3,)) * s * 0.25,
                vel=next_state.vel + jax.random.normal(k_vel, (3,)) * s * 0.5,
                quat=next_state.quat + jax.random.normal(k_quat, (4,)) * s * 0.02,
                omega=next_state.omega + jax.random.normal(k_omega, (3,)) * s * 0.5,
            )
        else:
            noisy_state = None
        return {
            "discount": jnp.where(self.is_terminal(state, params), 0.0, 1.0),
            "err_pos": self.get_err_pos(state),
            "err_vel": self.get_err_vel(state),
            "obs_param": self.get_obs_paramsonly(state, params),
            "obs_adapt": self.get_obs_adapt_hist(state, params),
            "noisy_state": noisy_state,
        }

    def is_terminal(self, state: EnvState3D, params: EnvParams3D) -> jnp.ndarray:
        """(reference: quadrotor.py:479-503)."""
        done = (state.time >= params.max_steps_in_episode) | (
            jnp.abs(state.pos) > 3.0
        ).any()
        if not self.config.disable_rollover_terminate:
            rollover = (state.quat[3] < jnp.cos(jnp.pi / 4.0)) | (
                jnp.abs(state.omega) > 100.0
            ).any()
            done = done | rollover
        return done

    # -- observations -------------------------------------------------------
    def get_obs_quadonly(self, state: EnvState3D, params: EnvParams3D) -> jnp.ndarray:
        """49-dim state + future-trajectory window (reference:
        quadrotor.py:372-394)."""
        indices = state.time + 1 + jnp.arange(self._traj_obs_len) * self._traj_obs_gap
        indices = jnp.clip(indices, 0, state.pos_traj.shape[0] - 1)
        return jnp.concatenate(
            [
                state.pos,
                state.vel / 3.0,
                state.quat,
                state.omega / 5.0,
                state.pos_tar,
                state.vel_tar / 3.0,
                state.pos_traj[indices].flatten(),
                state.vel_traj[indices].flatten() / 3.0,
            ],
            axis=-1,
        )

    def get_obs_paramsonly(self, state: EnvState3D, params: EnvParams3D) -> jnp.ndarray:
        """Normalized parameter observation (reference: quadrotor.py:425-452)."""
        return jnp.concatenate(
            [
                (params.I_diag - params.I_diag_mean) / params.I_diag_std,
                state.f_disturb / params.disturb_scale,
                (params.hook_offset - params.hook_offset_mean) / params.hook_offset_std,
                params.disturb_params,
                jnp.array(
                    [
                        (params.m - params.m_mean) / params.m_std,
                        (params.action_scale - params.action_scale_mean)
                        / params.action_scale_std,
                        (params.alpha_bodyrate - params.alpha_bodyrate_mean)
                        / params.alpha_bodyrate_std,
                    ]
                ),
            ],
            axis=-1,
        )

    def get_obs_adapt_hist(self, state: EnvState3D, params: EnvParams3D) -> jnp.ndarray:
        """History + finite-difference features for adaptation
        (reference: quadrotor.py:396-423)."""
        dvel = jnp.diff(state.vel_hist, axis=0)
        ddvel = jnp.diff(dvel, axis=0)
        domega = jnp.diff(state.omega_hist, axis=0)
        ddomega = jnp.diff(domega, axis=0)
        h = self._adapt_horizon
        return jnp.concatenate(
            [
                state.vel_hist[-h:].flatten(),
                state.omega_hist[-h:].flatten(),
                state.action_hist[-h:].flatten(),
                dvel[-h:].flatten(),
                ddvel[-h:].flatten(),
                domega[-h:].flatten(),
                ddomega[-h:].flatten(),
            ],
            axis=-1,
        )

    def get_obs_quad_params(self, state: EnvState3D, params: EnvParams3D) -> jnp.ndarray:
        """(reference: quadrotor.py:465-470)."""
        return jnp.concatenate(
            [self.get_obs_quadonly(state, params), self.get_obs_paramsonly(state, params)],
            axis=-1,
        )

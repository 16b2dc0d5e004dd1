"""Batched rollout engines (jnp reference path).

The MPC hot loop — N samples x H horizon steps of quadrotor dynamics plus
cost accumulation — runs here as ONE wide array program over packed state
``(N, 16)``. Contrast with the reference, which tree-repeats the entire
EnvState3D (including (T, 3) trajectory tables and history buffers) N-wide
and vmaps a scalar env step (reference: quadjax/controllers/mppi.py:68-97,
covo.py:227-254): on TPU that costs O(N * T) HBM traffic per solve for data
that never varies across samples. Here trajectory tables are indexed once
per step with a scalar clock shared by all samples.

Two cost paths:
  * :func:`make_rollout` — sampled-rollout costs for MPPI/CoVO solves
    (shared step key across samples and steps, reward freezing on done).
  * :func:`make_hessian_cost` — differentiable single-rollout cumulative
    cost for CoVO's Hessian (per-step key splits, no reward freezing),
    matching reference covo.py:134-185.

A fused Pallas kernel with the same contract lives in
:mod:`covo_mpc_tpu.ops.rollout_pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from covo_mpc_tpu.models import dynamics, rewards
from covo_mpc_tpu.models.quad_env import QuadEnv
from covo_mpc_tpu.models.structs import FDIST, OMEGA, POS, QUAT, VEL
from covo_mpc_tpu.utils.vma import pvary




def _make_reward(env: QuadEnv):
    name = env.reward_name
    if name == "penyaw":

        def reward(x, pos_tar, vel_tar):
            return rewards.tracking_penyaw_reward(
                x[..., POS], x[..., VEL], x[..., QUAT], pos_tar, vel_tar
            )

    elif name == "realworld":

        def reward(x, pos_tar, vel_tar):
            return rewards.tracking_realworld_reward(x[..., POS], x[..., QUAT], pos_tar)

    else:  # pragma: no cover
        raise NotImplementedError(name)
    return reward


def _make_done(env: QuadEnv):
    check_rollover = not env.config.disable_rollover_terminate
    cos_45 = jnp.cos(jnp.pi / 4.0)

    def done_fn(x, t, max_steps):
        """Termination on the pre-step state (reference: quadrotor.py:479-490).

        ``max_steps`` comes from the RUNTIME params — baking the
        default in at build time diverged from the env step
        (quad_env.is_terminal reads params.max_steps_in_episode) and
        from the pallas kernel (which packs it into its ints operand)
        for any non-default episode length (r5 review finding)."""
        d = (t >= max_steps) | (jnp.abs(x[..., POS]) > 3.0).any(axis=-1)
        if check_rollover:
            d = d | (x[..., QUAT][..., 3] < cos_45)
            d = d | (jnp.abs(x[..., OMEGA]) > 100.0).any(axis=-1)
        return d

    return done_fn


def make_rollout(env: QuadEnv, fast_keys: bool = False):
    """Build the sampled-rollout cost engine for ``env``.

    Returns ``rollout_costs(x0, t0, pos_traj, vel_traj, actions, params,
    step_key, deterministic, discount, collect_poses)`` ->
    ``(costs (N,), poses (H, N, 3) | None)`` where

      * ``x0`` (16,) is the packed (possibly obs-noisy) start state,
      * ``t0`` is the scalar episode clock shared by all samples,
      * ``actions`` is (N, H, action_dim),
      * ``step_key`` is reused for every sample and step, reproducing the
        reference's shared-noise quirk (reference: mppi.py:69-74),
      * rewards are evaluated on pre-step states and frozen once a sample
        terminates (reference: mppi.py:76, quadrotor.py:243).

    Cost is the negated discounted reward sum (reference: mppi.py:99-106).
    """
    reward_fn = _make_reward(env)
    done_fn = _make_done(env)
    disturb_fn = env.disturb_fn
    dt = env._dt

    def rollout_costs(
        x0,
        t0,
        pos_traj,
        vel_traj,
        actions,
        params,
        step_key,
        deterministic: bool = False,
        discount=1.0,
        collect_poses: bool = False,
        vary_axes=(),
    ):
        N, H, _ = actions.shape
        T = pos_traj.shape[0]
        params = params.replace(
            dyn_noise_scale=params.dyn_noise_scale * (1.0 - deterministic)
        )
        # one disturbance key for the whole solve (reference: mppi.py:69);
        # fast_keys skips the parity key-split chain (models/dynamics.py)
        disturb_key = dynamics.derive_dynamics_keys(step_key, fast=fast_keys)
        x = jnp.broadcast_to(x0, (N,) + x0.shape)

        init_r = jnp.zeros(N)
        init_d = jnp.zeros(N, dtype=bool)
        if vary_axes:
            # Under shard_map the per-shard sampled actions are "varying"
            # over the mesh axes while these carry inits are replicated;
            # promote them so the scan carry types agree (shard_map VMA).
            x = pvary(x, vary_axes)
            init_r = pvary(init_r, vary_axes)
            init_d = pvary(init_d, vary_axes)

        def step(carry, inp):
            x, r_prev, d_prev = carry
            a, h = inp
            t = t0 + h
            ti = jnp.clip(t, 0, T - 1)
            pos_tar = pos_traj[ti]
            vel_tar = vel_traj[ti]

            r = reward_fn(x, pos_tar, vel_tar)
            d = done_fn(x, t, params.max_steps_in_episode)
            r = jnp.where(d_prev, r_prev, r)
            d = d | d_prev

            a = jnp.clip(a, -1.0, 1.0)
            u, _ = dynamics.control_to_thrust_omega(a, params)
            x_new = dynamics.bodyrate_step(x, u, params, dt)
            f_new = disturb_fn(disturb_key, params, t, x[..., VEL], x[..., FDIST])
            x_new = x_new.at[..., FDIST].set(f_new)

            out = (r, x_new[..., POS] if collect_poses else None)
            return (x_new, r, d), out

        init = (x, init_r, init_d)
        (_, _, _), (rews, poses) = lax.scan(
            step, init, (actions.transpose(1, 0, 2), jnp.arange(H))
        )
        disc = jnp.power(discount, jnp.arange(H))
        costs = -jnp.einsum("h,hn->n", disc, rews)
        return costs, poses

    return rollout_costs


def make_hessian_cost(env: QuadEnv, H: int, unroll: int = 1):
    """Differentiable cumulative cost of one deterministic H-step rollout.

    ``cost(a_flat, x0, t0, pos_traj, vel_traj, params, key)`` with
    ``a_flat`` the flattened (H * action_dim,) action sequence. Semantics
    match the reference's Hessian objective (reference: covo.py:142-180):

      * deterministic env steps (dyn_noise_scale zeroed),
      * a fresh key split per step (unlike sampled rollouts),
      * rewards on pre-step states, NOT frozen on termination (the
        reference tracks `done` but never applies it),
      * terms that are CONSTANT in the actions are dropped: the reference's
        terminal ``reward_fn(initial_state)`` (covo.py:176-178) and its
        step-0 reward, which is also evaluated on the initial state. Both
        are invisible to the Hessian.

    Dropping the step-0 term is not just an optimization — it is what makes
    a ``lax.scan`` rollout differentiable here at all. The initial state
    sits exactly on its target (err_pos = 0), where ``d norm = x/|x|`` is
    undefined. In the reference's unrolled Python loop the initial state is
    a constant with a SYMBOLIC zero tangent, so autodiff never touches that
    norm; under scan the state is part of the differentiated carry, the
    tangent becomes a NUMERIC zero, and ``inf * 0 = NaN`` poisons the whole
    Hessian. (This is the real mechanism behind the reference's "scan
    breaks gradients" comment at covo.py:169.) Rewards are therefore
    accumulated POST-step — only action-dependent states are ever
    differentiated. Hessian parity is pinned by tests/test_covo.py.
    """
    reward_fn = _make_reward(env)
    disturb_fn = env.disturb_fn
    dt = env._dt
    dA = env.action_dim

    def cost(a_flat, x0, t0, pos_traj, vel_traj, params, key):
        a_seq = a_flat.reshape(H, dA)
        T = pos_traj.shape[0]
        params = params.replace(dyn_noise_scale=0.0)

        def step(carry, inp):
            x, key = carry
            a, h = inp
            rng_act, key = jax.random.split(key)
            t = t0 + h

            a = jnp.clip(a, -1.0, 1.0)
            u, _ = dynamics.control_to_thrust_omega(a, params)
            x_new = dynamics.bodyrate_step(x, u, params, dt)
            f_new = disturb_fn(
                dynamics.derive_dynamics_keys(rng_act),
                params,
                t,
                x[..., VEL],
                x[..., FDIST],
            )
            x_new = x_new.at[..., FDIST].set(f_new)

            # post-step reward: the pre-step reward of iteration h+1
            ti = jnp.clip(t + 1, 0, T - 1)
            r = reward_fn(x_new, pos_traj[ti], vel_traj[ti])
            return (x_new, key), r

        # `unroll` trades compile time for removing scan overhead from the
        # (D-wide) tangent batches that ride through this rollout under
        # jacfwd — a large lever on TPU where the Hessian dominates the
        # CoVO solve.
        (_, _), rews = lax.scan(
            step, (x0, key), (a_seq, jnp.arange(H)), unroll=unroll
        )
        # rews[h] = reward(s_{h+1}); the reference sums reward(s_1..s_{H-1})
        # plus constants, so drop the last entry.
        return -jnp.sum(rews[:-1])

    return cost

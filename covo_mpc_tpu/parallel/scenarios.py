"""Distributed control step over a batch of domain-randomized scenarios.

The pod-scale configuration (BASELINE.json config #5): a 2-D mesh where

  * SCENARIO_AXIS shards a batch of independent DR episodes (pure data
    parallelism — no per-solve communication, safe to span DCN), and
  * SAMPLE_AXIS shards each solve's N rollout samples (three tiny
    collectives per solve — keep on ICI).

One call = one full MPC control step for every scenario: receding-horizon
shift, sharded sampling/rollout/reduction, solver-state update, and the
auto-resetting environment step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.models.structs import pack_state
from covo_mpc_tpu.ops import reductions, sampling
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS, SCENARIO_AXIS


def make_multichip_control_step(env, mesh, N: int, H: int, lam: float):
    """Build the jitted distributed step.

    Returns ``step(states, params, a_means, a_covs, keys) ->
    (states', a_means', rewards, dones)`` where every input is batched over
    scenarios on axis 0 and sharded over SCENARIO_AXIS; the sample axis is
    materialized per-shard inside (never as a global array).
    """
    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    if N % n_sample_shards:
        raise ValueError(f"N={N} not divisible by {n_sample_shards}")
    n_local = N // n_sample_shards
    rollout = make_rollout(env)

    def per_scenario(state, params, a_mean, a_cov, key):
        # receding-horizon shift (reference: mppi.py:43-49)
        a_mean = jnp.concatenate([a_mean[1:], a_mean[-1:]])
        a_cov = jnp.concatenate([a_cov[1:], a_cov[-1:]])
        key, act_key, step_key, env_key = jax.random.split(key, 4)

        shard = lax.axis_index(SAMPLE_AXIS)
        ids = shard * n_local + jnp.arange(n_local)
        a_local = sampling.sample_per_step(
            act_key, a_mean, a_cov, n_local,
            mode=sampling.INVARIANT, sample_ids=ids,
        )
        a_local = jnp.clip(a_local, -1.0, 1.0)

        costs, _ = rollout(
            pack_state(state), state.time, state.pos_traj, state.vel_traj,
            a_local, params, step_key,
            deterministic=False, discount=1.0, collect_poses=False,
            vary_axes=(SAMPLE_AXIS, SCENARIO_AXIS),
        )
        min_cost = lax.pmin(jnp.min(costs), SAMPLE_AXIS)
        unnorm, local_norm = reductions.weights_from_stats(costs, min_cost, lam)
        weight = unnorm / lax.psum(local_norm, SAMPLE_AXIS)
        a_mean_new = lax.psum(
            jnp.einsum("n,nhd->hd", weight, a_local), SAMPLE_AXIS
        )

        action = a_mean_new[0]
        obs, state_new, reward, done, info = env.step(env_key, state, action, params)
        return state_new, a_mean_new, reward, done

    def local_step(states, params, a_means, a_covs, keys):
        return jax.vmap(per_scenario)(states, params, a_means, a_covs, keys)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
            P(SCENARIO_AXIS), P(SCENARIO_AXIS),
        ),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                   P(SCENARIO_AXIS)),
    )
    return jax.jit(sharded)

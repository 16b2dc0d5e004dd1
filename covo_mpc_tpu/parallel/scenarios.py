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


def make_batched_covo_solve(env, N: int, H: int, lam: float,
                            sample_sigma: float = 0.5,
                            interpret: bool = False):
    """Scenario-batched CoVO-online solve on ONE device — the per-chip
    building block of the pod configuration (BASELINE config #5: 1024 DR
    scenarios x CoVO-online N=8192, scenarios sharded across chips).

    Batching B scenarios amortizes the solve's SERIAL latency: the
    Hessian's scan steps and the Σ-designer's dependent matmul chain
    become B-batched ops (one launch does B scenarios' work), while the
    fused rollout kernel runs a native (B, lane-tiles) grid
    (ops/rollout_pallas.make_pallas_rollout_batched). Aggregate
    solves/s/chip therefore exceeds B x the single-scenario rate's
    latency-bound fraction — measured with ``bench.py --scenarios B``.

    Returns ``solve(x0s (B,16), t0s (B,), pos_trajs (B,T,3), vel_trajs,
    a_means (B,H,dA), params_b (leaves batched on axis 0), key) ->
    (a_means_new (B,H,dA), min_costs (B,))``. RNG: per-scenario
    ``fold_in(key, b)`` streams (scenario-count invariant), fast sampler.
    """
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.hessian import make_hessian_adjoint
    from covo_mpc_tpu.ops.rollout_pallas import make_pallas_rollout_batched

    dA = env.action_dim
    D = H * dA
    # scan primal: the B-wide vmap amortizes its launches, and the Pallas
    # primal kernel cannot vmap over SMEM operands (see solvers/covo.py)
    hess = make_hessian_adjoint(env, H, primal="scan")
    rollout_b = make_pallas_rollout_batched(env, interpret=interpret)

    def solve(x0s, t0s, pos_trajs, vel_trajs, a_means, params_b, key):
        B = a_means.shape[0]
        # receding-horizon shift of the mean only (reference: covo.py:201-203)
        a_means = jnp.concatenate([a_means[:, 1:], a_means[:, -1:]], axis=1)

        from covo_mpc_tpu.utils.keys import fold_in_batch

        keys = fold_in_batch(key, jnp.arange(B))
        hess_keys = jax.vmap(lambda k: jax.random.split(k, 3)[0])(keys)
        act_keys = jax.vmap(lambda k: jax.random.split(k, 3)[1])(keys)
        step_keys = jax.vmap(lambda k: jax.random.split(k, 3)[2])(keys)

        R = jax.vmap(
            lambda a, x, t, pt, vt, p, k: hess(a.flatten(), x, t, pt, vt, p, k)
        )(a_means, x0s, t0s, pos_trajs, vel_trajs, params_b, hess_keys)
        _, factors = jax.vmap(
            lambda r: covariance.optimize_sigma_ns(r, sample_sigma, D)
        )(R)

        z = jax.vmap(lambda k: jax.random.normal(k, (N, D)))(act_keys)
        a_flat = a_means.reshape(B, 1, D) + jnp.einsum(
            "bnd,bed->bne", z, factors
        )
        a_sampled = jnp.clip(a_flat.reshape(B, N, H, dA), -1.0, 1.0)

        costs = rollout_b(
            x0s, t0s, pos_trajs, vel_trajs, a_sampled, params_b, step_keys,
            deterministic=True, discount=1.0,
        )
        weights = jax.vmap(lambda c: reductions.mppi_weights(c, lam))(costs)
        a_means_new = jnp.einsum("bn,bnhd->bhd", weights, a_sampled)
        return a_means_new, jnp.min(costs, axis=1)

    return jax.jit(solve)


def make_multichip_covo_step(env, mesh, N: int, H: int, lam: float,
                             sample_sigma: float = 0.5):
    """Distributed CoVO-online control step — BASELINE config #5 proper:
    scenario axis = pure data parallelism (DR episodes), sample axis =
    sharded rollouts with pmin/psum reductions.

    Per scenario and step: receding-horizon mean shift, adjoint Hessian +
    Newton-Schulz Σ design (O(D²), independent of N — replicated across
    the sample shards rather than communicated), sharding-invariant joint
    sampling, local rollouts, three collectives (pmin + 2 psum), and the
    auto-resetting environment step.

    Returns ``step(states, params, a_means, keys) -> (states', a_means',
    rewards, dones)``, everything batched over scenarios on axis 0 and
    sharded over SCENARIO_AXIS.
    """
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.hessian import make_hessian_adjoint

    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    if N % n_sample_shards:
        raise ValueError(f"N={N} not divisible by {n_sample_shards}")
    n_local = N // n_sample_shards
    rollout = make_rollout(env)
    hess = make_hessian_adjoint(env, H, primal="scan")
    dA = env.action_dim
    D = H * dA

    def per_scenario(state, params, a_mean, key):
        # shift the mean only (reference: covo.py:201-203)
        a_mean = jnp.concatenate([a_mean[1:], a_mean[-1:]])
        key, hess_key, act_key, step_key, env_key = jax.random.split(key, 5)

        x0 = pack_state(state)
        R = hess(a_mean.flatten(), x0, state.time, state.pos_traj,
                 state.vel_traj, params, hess_key)
        _, factor = covariance.optimize_sigma_ns(R, sample_sigma, D)

        shard = lax.axis_index(SAMPLE_AXIS)
        ids = shard * n_local + jnp.arange(n_local)
        a_local = sampling.sample_joint(
            act_key, a_mean.flatten(), factor, n_local,
            mode=sampling.INVARIANT, sample_ids=ids,
        )
        a_local = jnp.clip(a_local.reshape(n_local, H, dA), -1.0, 1.0)

        costs, _ = rollout(
            x0, state.time, state.pos_traj, state.vel_traj,
            a_local, params, step_key,
            deterministic=True, discount=1.0, collect_poses=False,
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

    def local_step(states, params, a_means, keys):
        return jax.vmap(per_scenario)(states, params, a_means, keys)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                  P(SCENARIO_AXIS)),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                   P(SCENARIO_AXIS)),
    )
    return jax.jit(sharded)

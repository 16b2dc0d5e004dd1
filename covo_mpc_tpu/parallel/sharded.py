"""Sharded MPC solve cores: shard_map over the sample axis.

Strategy (SURVEY.md §2 parallelism table): the N-sample axis — the only
axis with cross-element reductions — is split across the mesh. Each shard

  1. draws its own action samples with GLOBAL-index keys
     (ops/sampling.py INVARIANT mode), so results are identical at any
     mesh shape,
  2. rolls out its N/k samples locally (zero communication),
  3. participates in three tiny collectives: pmin (min cost), psum
     (softmax normalizer), psum (weighted action mean, H·dA floats).

The communicated payload per solve is ~H·dA + 2 floats — the design keeps
the O(N·H) work local and moves only the sufficient statistics, so scaling
efficiency is limited only by collective latency.

All inputs/outputs of the wrapped fns are replicated; parallelism is
internal (each shard materializes its own slice of the sample axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.ops import reductions, sampling
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS


def _replicated_specs(tree):
    return jax.tree.map(lambda _: P(), tree)


def make_sharded_mppi_solve(env, mesh, N: int, H: int, lam: float,
                            axis: str = SAMPLE_AXIS):
    """Sharded MPPI sample→rollout→reduce→update core.

    Returns ``solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov, gammas,
    discount, params, act_key, step_key) -> (a_mean_new, a_cov_new,
    min_cost)`` with every argument and result replicated across ``axis``.
    """
    n_shards = mesh.shape[axis]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by {n_shards} shards")
    n_local = N // n_shards
    rollout = make_rollout(env)

    def local_solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov,
                    gamma_mean, gamma_sigma, discount, params,
                    act_key, step_key):
        shard = lax.axis_index(axis)
        ids = shard * n_local + jnp.arange(n_local)
        a_local = sampling.sample_per_step(
            act_key, a_mean, a_cov, n_local,
            mode=sampling.INVARIANT, sample_ids=ids,
        )
        a_local = jnp.clip(a_local, -1.0, 1.0)

        costs, _ = rollout(
            x0, t0, pos_traj, vel_traj, a_local, params, step_key,
            deterministic=False, discount=discount, collect_poses=False,
            vary_axes=(axis,),
        )

        min_cost = lax.pmin(jnp.min(costs), axis)
        unnorm, local_norm = reductions.weights_from_stats(costs, min_cost, lam)
        weight = unnorm / lax.psum(local_norm, axis)

        mean_local = jnp.einsum("n,nhd->hd", weight, a_local)
        a_mean_new = lax.psum(mean_local, axis) * gamma_mean + a_mean * (
            1.0 - gamma_mean
        )
        dev = a_local - a_mean_new[None]
        cov_local = jnp.einsum("n,nhi,nhj->hij", weight, dev, dev)
        a_cov_new = lax.psum(cov_local, axis) * gamma_sigma + a_cov * (
            1.0 - gamma_sigma
        )
        return a_mean_new, a_cov_new, min_cost

    def solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov,
              gamma_mean, gamma_sigma, discount, params, act_key, step_key):
        args = (x0, t0, pos_traj, vel_traj, a_mean, a_cov,
                gamma_mean, gamma_sigma, discount, params, act_key, step_key)
        return jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=_replicated_specs(args),
            out_specs=(P(), P(), P()),
        )(*args)

    return solve


def make_sharded_covo_sample_rollout(env, mesh, N: int, H: int, lam: float,
                                     axis: str = SAMPLE_AXIS):
    """Sharded CoVO sample→rollout→reduce core.

    Σ design (Hessian + eigh) is O(D²) and independent of N, so it runs
    replicated OUTSIDE this core; only the N-dependent work is sharded.
    ``factor`` is any square root of Σ.

    Returns ``solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
    gamma_mean, discount, params, act_key, step_key) -> (a_mean_new (H, dA),
    min_cost)``, all replicated.
    """
    n_shards = mesh.shape[axis]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by {n_shards} shards")
    n_local = N // n_shards
    rollout = make_rollout(env)
    dA = env.action_dim

    def local_solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
                    gamma_mean, discount, params, act_key, step_key):
        shard = lax.axis_index(axis)
        ids = shard * n_local + jnp.arange(n_local)
        a_flat = sampling.sample_joint(
            act_key, mean_flat, factor, n_local,
            mode=sampling.INVARIANT, sample_ids=ids,
        )
        a_local = jnp.clip(a_flat.reshape(n_local, H, dA), -1.0, 1.0)

        costs, _ = rollout(
            x0, t0, pos_traj, vel_traj, a_local, params, step_key,
            deterministic=True, discount=discount, collect_poses=False,
            vary_axes=(axis,),
        )

        min_cost = lax.pmin(jnp.min(costs), axis)
        unnorm, local_norm = reductions.weights_from_stats(costs, min_cost, lam)
        weight = unnorm / lax.psum(local_norm, axis)

        mean_local = jnp.einsum("n,nhd->hd", weight, a_local)
        a_mean_new = lax.psum(mean_local, axis) * gamma_mean + mean_flat.reshape(
            H, dA
        ) * (1.0 - gamma_mean)
        return a_mean_new, min_cost

    def solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
              gamma_mean, discount, params, act_key, step_key):
        args = (x0, t0, pos_traj, vel_traj, mean_flat, factor,
                gamma_mean, discount, params, act_key, step_key)
        return jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=_replicated_specs(args),
            out_specs=(P(), P()),
        )(*args)

    return solve

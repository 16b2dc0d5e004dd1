"""Distributed CoVO-offline Σ-schedule precompute.

The reference computes its offline schedule with max_steps strictly
sequential iterations — an H-step PID rollout, a Hessian and an eigh per
episode timestep (reference: quadjax/controllers/covo.py:44-112).
``CoVOSolver._reset_offline`` already decomposes that into a cheap
sequential phase 1 (advance the PID expansion episode) and an
embarrassingly parallel phase 2 (one Hessian + Σ design per timestep,
vmapped). This module shards phase 2's timestep axis over a device mesh:
each chip designs ``max_steps / k`` covariances with the SAME values as
the single-chip path (identical key chain — phase 1 is replicated), and
the (max_steps, D, D) schedule assembles at the shard_map boundary. Zero
in-loop communication; the schedule is ~max_steps · D² floats of output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS
from covo_mpc_tpu.utils.vma import pvary


def make_distributed_offline_schedule(solver, mesh, axis: str = SAMPLE_AXIS):
    """Shard a CoVO-offline solver's Σ-schedule precompute over ``mesh``.

    Returns ``schedule(env_state, env_params, control_params, key) ->
    control_params'`` — a drop-in replacement for ``solver.reset`` (same
    values as the single-chip ``_reset_offline``; pinned in
    tests/test_sharding.py). ``max_steps`` not divisible by the shard
    count is handled by padding the step axis (padded designs are computed
    and discarded).
    """
    if getattr(solver, "mode", None) != "offline":
        raise ValueError("requires a CoVOSolver with mode='offline'")
    n_shards = mesh.shape[axis]
    max_steps = solver.env.default_params.max_steps_in_episode
    pad = (-max_steps) % n_shards

    def local(states, keys, env_params, sample_sigma):
        # every input is either step-sharded (varying) or replicated; the
        # design math mixes them freely, so promote the replicated ones
        env_params, sample_sigma = jax.tree.map(
            lambda x: pvary(x, (axis,)), (env_params, sample_sigma)
        )
        return jax.vmap(
            lambda s, k: solver.offline_sigma_at(s, k, env_params, sample_sigma)
        )(states, keys)

    @jax.jit
    def schedule(env_state, env_params, control_params, key):
        # phase 1 (sequential PID episode) runs replicated — it is
        # max_steps single-sample env steps, negligible next to phase 2
        states, keys = solver.offline_schedule_inputs(env_state, env_params, key)
        if pad:
            states, keys = jax.tree.map(
                lambda x: jnp.concatenate([x, x[:pad]]), (states, keys)
            )
        args = (states, keys, env_params, control_params.sample_sigma)
        specs = (
            jax.tree.map(lambda _: P(axis), states),
            P(axis),
            jax.tree.map(lambda _: P(), env_params),
            P(),
        )
        covs, factors = jax.shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(P(axis), P(axis))
        )(*args)
        return control_params.replace(
            a_cov_offline=covs[:max_steps],
            a_factor_offline=factors[:max_steps],
        )

    return schedule

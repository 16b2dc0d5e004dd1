"""Worker process for the multi-process (multi-host) smoke tests.

Launched by tests/test_multiprocess.py with the env-var launcher contract
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — the contract
parallel/distributed.initialize_distributed implements). Each process
owns MP_LOCAL_DEVICES virtual CPU devices; after initialize the job spans
8 global devices across the processes. Runs

  1. ONE distributed CoVO solve over a samples=8 mesh (sample axis spans
     the process boundary), and
  2. ONE scenario-batched CoVO control step over a (samples=2,
     scenarios=4) mesh with B=8 DR scenarios (scenario axis spans the
     process boundary at 4 processes),

and prints the (replicated) results as JSON — the parent asserts all
processes agree and match the single-process values (the invariant
sampler makes both paths mesh-shape- and process-layout-exact).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ.get("MP_LOCAL_DEVICES", "4")
)

import jax  # noqa: E402

# sitecustomize registers the axon TPU plugin in every process; the env var
# alone is not reliable here — pin the platform in-process (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covo_mpc_tpu.models import EnvConfig, QuadEnv  # noqa: E402
from covo_mpc_tpu.models.structs import pack_state  # noqa: E402
from covo_mpc_tpu.parallel import (  # noqa: E402
    device_topology,
    initialize_distributed,
)
from covo_mpc_tpu.parallel.mesh import make_mesh  # noqa: E402
from covo_mpc_tpu.parallel.scenarios import make_multichip_covo_step  # noqa: E402
from covo_mpc_tpu.parallel.sharded import make_distributed_covo_solve  # noqa: E402

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def _f32(x):
    # multi-process device_put's cross-process equality check gathers
    # through jax (float32) and compares against the float64 host value
    # — any non-dyadic python-float leaf (e.g. 0.8) spuriously fails;
    # pre-cast to float32
    x = np.asarray(x)
    return x.astype(np.float32) if x.dtype == np.float64 else x


def _put_replicated(tree, mesh):
    return jax.device_put(
        jax.tree.map(_f32, tree), NamedSharding(mesh, P())
    )


def sample_sharded_solve(env):
    """Distributed CoVO solve, sample axis over all 8 global devices."""
    params = env.default_params
    _, info, _ = env.reset_env(jax.random.PRNGKey(42), params)
    noisy = info["noisy_state"]

    N, H, lam = 64, 4, 0.01
    mesh = make_mesh(samples=8)
    solve = make_distributed_covo_solve(env, mesh, N, H, lam, engine="jnp")
    a_mean = jnp.tile(jnp.array([0.0, 0.0, 0.0, 0.0]), (H, 1))

    rep = NamedSharding(mesh, P())
    args = _put_replicated(
        (pack_state(noisy), noisy.time, noisy.pos_traj, noisy.vel_traj,
         a_mean, params, jax.random.PRNGKey(3)),
        mesh,
    )
    a_new, min_cost = jax.jit(solve, out_shardings=rep)(*args)
    a_local = np.asarray(a_new.addressable_shards[0].data)
    return {
        "a_mean0": [float(v) for v in a_local[0]],
        "a_mean_sum": float(a_local.sum()),
        "min_cost": float(np.asarray(min_cost.addressable_shards[0].data)),
    }


def scenario_sharded_step(env_dr):
    """Scenario-batched CoVO step on a (samples=2, scenarios=4) mesh: at
    4 processes x 2 devices the scenario axis spans processes."""
    B, N, H = 8, 16, 4
    mesh = make_mesh(samples=2, scenarios=4)
    step = make_multichip_covo_step(env_dr, mesh, N=N, H=H, lam=0.01)

    keys = jax.random.split(jax.random.PRNGKey(7), B)
    params = jax.vmap(env_dr.sample_params)(keys)
    states = jax.vmap(lambda k, p: env_dr.reset_env(k, p)[2])(keys, params)
    a_means = jnp.zeros((B, H, env_dr.action_dim))

    rep = NamedSharding(mesh, P())
    args = _put_replicated((states, params, a_means, keys), mesh)
    _, a_means2, rewards, _ = jax.jit(step, out_shardings=rep)(*args)
    return {
        "scenario_rewards": [
            float(v) for v in np.asarray(rewards.addressable_shards[0].data)
        ],
        "scenario_amean_sum": float(
            np.asarray(a_means2.addressable_shards[0].data).sum()
        ),
    }


def main():
    pid = initialize_distributed()  # env-var contract
    topo = device_topology()

    env = QuadEnv(
        EnvConfig(
            task="tracking", enable_randomizer=False, disturb_type="gaussian",
            disable_rollover_terminate=True, generate_noisy_state=True,
        )
    )
    env_dr = QuadEnv(
        EnvConfig(
            task="tracking", enable_randomizer=True, disturb_type="gaussian",
            disable_rollover_terminate=True, generate_noisy_state=True,
        )
    )

    rec = {
        "process_id": pid,
        "process_count": topo["process_count"],
        "global_devices": topo["global_devices"],
        "local_devices": topo["local_devices"],
    }
    rec.update(sample_sharded_solve(env))
    rec.update(scenario_sharded_step(env_dr))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

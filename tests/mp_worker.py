"""Worker process for the 2-process multi-host smoke test.

Launched by tests/test_multiprocess.py with the env-var launcher contract
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — the contract
parallel/distributed.initialize_distributed implements). Each process
owns 4 virtual CPU devices; after initialize the job spans 8 global
devices across 2 processes. Runs ONE distributed CoVO solve over a
samples=8 mesh and prints the (replicated) result as JSON — the parent
asserts both processes agree and match the single-process value (the
invariant sampler makes the solve mesh-shape- and process-layout-exact).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
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
from covo_mpc_tpu.parallel.sharded import make_distributed_covo_solve  # noqa: E402


def main():
    pid = initialize_distributed()  # env-var contract
    topo = device_topology()

    env = QuadEnv(
        EnvConfig(
            task="tracking", enable_randomizer=False, disturb_type="gaussian",
            disable_rollover_terminate=True, generate_noisy_state=True,
        )
    )
    params = env.default_params
    _, info, state = env.reset_env(jax.random.PRNGKey(42), params)
    noisy = info["noisy_state"]

    N, H, lam = 64, 4, 0.01
    mesh = make_mesh(samples=8)
    solve = make_distributed_covo_solve(env, mesh, N, H, lam, engine="jnp")
    a_mean = jnp.tile(jnp.array([0.0, 0.0, 0.0, 0.0]), (H, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def _f32(x):
        # multi-process device_put's cross-process equality check gathers
        # through jax (float32) and compares against the float64 host value
        # — any non-dyadic python-float leaf (e.g. 0.8) spuriously fails;
        # pre-cast to float32
        x = np.asarray(x)
        return x.astype(np.float32) if x.dtype == np.float64 else x

    args = jax.device_put(
        jax.tree.map(
            _f32,
            (pack_state(noisy), noisy.time, noisy.pos_traj, noisy.vel_traj,
             a_mean, params, jax.random.PRNGKey(3)),
        ),
        rep,
    )
    a_new, min_cost = jax.jit(solve, out_shardings=rep)(*args)
    a_local = np.asarray(a_new.addressable_shards[0].data)
    c_local = float(np.asarray(min_cost.addressable_shards[0].data))

    print(json.dumps({
        "process_id": pid,
        "process_count": topo["process_count"],
        "global_devices": topo["global_devices"],
        "local_devices": topo["local_devices"],
        "a_mean0": [float(v) for v in a_local[0]],
        "a_mean_sum": float(a_local.sum()),
        "min_cost": c_local,
    }))


if __name__ == "__main__":
    main()

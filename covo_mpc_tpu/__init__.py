"""covo_mpc_tpu: a TPU-native sampling-based MPC framework.

A from-scratch re-design of the capabilities of LeCAR-Lab/CoVO-MPC
(reference: /root/reference/quadjax) built for TPU hardware:

- batch-first packed rollout state instead of per-sample pytree repeats
- a single Cholesky + MXU matmul for correlated-noise sampling
- fused Pallas rollout kernels for the N x H hot loop
- `shard_map` over a device mesh for the sample / scenario axes

Layers (bottom up):
  models/   physics core: quaternion math, bodyrate dynamics, disturbances,
            trajectory generators, reward functions, the Quad3D environment
  ops/      rollout engines (jnp + Pallas), samplers, covariance design,
            reductions
  solvers/  MPPI, CoVO (online/offline), PID, Random controllers
  parallel/ mesh construction + sharded solve steps (pjit/shard_map)
  runtime/  episode/eval/render harnesses, configs, metrics, checkpointing
  utils/    RNG-tree helpers, small tree utilities
"""

import os

from covo_mpc_tpu import models, ops, parallel, solvers, utils

__version__ = "0.1.0"


def get_package_path() -> str:
    """Absolute path of the installed package (reference: quadjax/__init__.py:7)."""
    return os.path.dirname(os.path.abspath(__file__))

"""Compute ops: rollout engines, samplers, covariance design, reductions."""

from covo_mpc_tpu.ops import covariance, reductions, sampling
from covo_mpc_tpu.ops.rollout import make_hessian_cost, make_rollout

__all__ = [
    "covariance",
    "make_hessian_cost",
    "make_rollout",
    "reductions",
    "sampling",
]

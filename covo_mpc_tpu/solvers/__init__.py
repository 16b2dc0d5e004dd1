"""Sampling-based MPC solvers + classical baselines."""

from covo_mpc_tpu.solvers.base import BaseSolver, RandomSolver
from covo_mpc_tpu.solvers.covo import CoVOParams, CoVOSolver
from covo_mpc_tpu.solvers.factory import get_solver, hover_sequence, parse_sample_params
from covo_mpc_tpu.solvers.mppi import MPPIParams, MPPISolver
from covo_mpc_tpu.solvers.pid import PIDParams, PIDSolver

# reference-compatible aliases (quadjax/controllers/__init__.py:1-7)
BaseController = BaseSolver
RandomController = RandomSolver
PIDController = PIDSolver
MPPIController = MPPISolver
CoVOController = CoVOSolver

__all__ = [
    "BaseController",
    "BaseSolver",
    "CoVOController",
    "CoVOParams",
    "CoVOSolver",
    "MPPIController",
    "MPPIParams",
    "MPPISolver",
    "PIDController",
    "PIDParams",
    "PIDSolver",
    "RandomController",
    "RandomSolver",
    "get_solver",
    "hover_sequence",
    "parse_sample_params",
]

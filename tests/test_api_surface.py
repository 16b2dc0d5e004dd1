"""Pins the public API surface MIGRATION.md promises to quadjax users.

Every mapping in MIGRATION.md that is import-level checkable is checked
here, so the migration guide cannot silently rot: reference-named
controller aliases (quadjax/controllers/__init__.py:1-7), the flat
subpackage re-exports, and `get_package_path` (quadjax/__init__.py:7).
"""

import os

import covo_mpc_tpu
from covo_mpc_tpu import models, ops, parallel, solvers


def test_reference_controller_aliases():
    assert solvers.BaseController is solvers.BaseSolver
    assert solvers.RandomController is solvers.RandomSolver
    assert solvers.PIDController is solvers.PIDSolver
    assert solvers.MPPIController is solvers.MPPISolver
    assert solvers.CoVOController is solvers.CoVOSolver
    for name in ("MPPIParams", "CoVOParams", "PIDParams"):
        assert hasattr(solvers, name)


def test_get_package_path():
    path = covo_mpc_tpu.get_package_path()
    assert os.path.isdir(path)
    assert os.path.basename(path) == "covo_mpc_tpu"


def test_migration_symbol_map():
    """Spot-check each MIGRATION.md table section resolves to a symbol."""
    # rotation (geom.py map)
    for name in ("quat_conj", "quat_mul", "quat_integrate", "rotate_vec",
                 "hat", "vee", "quat_to_rotmat", "rotmat_to_quat",
                 "rp_to_quat", "quat_to_rp", "quat_to_rpy",
                 "axis_angle_to_rotmat"):
        assert hasattr(models.rotation, name), name
    # dynamics (free.py map)
    for name in ("bodyrate_step", "get_disturb_fn", "derive_dynamics_keys",
                 "periodic_disturb", "sin_disturb", "drag_disturb",
                 "mixed_disturb", "gaussian_disturb", "none_disturb"):
        assert hasattr(models.dynamics, name), name
    # trajectories / rewards (utils.py map)
    for name in ("generate_fixed_traj", "generate_lissa_traj",
                 "generate_lissa_traj_slow", "generate_zigzag_traj"):
        assert hasattr(models.trajectory, name), name
    for name in ("hovering_reward_fn", "tracking_reward_fn",
                 "tracking_penyaw_reward_fn", "tracking_realworld_reward_fn"):
        assert hasattr(models.rewards, name), name
    # ops (controller-internals map)
    assert hasattr(ops.covariance, "optimize_sigma")
    assert hasattr(ops.covariance, "optimize_sigma_ns")
    assert hasattr(ops, "make_rollout")
    # parallel (new-capability section)
    for name in ("make_mesh", "make_sharded_mppi_solve",
                 "make_multichip_covo_step", "make_batched_covo_solve",
                 "initialize_distributed"):
        assert hasattr(parallel, name), name
    # runtime (harness map) — import deferred: runtime pulls matplotlib
    from covo_mpc_tpu import runtime

    for name in ("evaluate", "render_episode", "save_trace", "load_trace",
                 "MetricsLogger", "RunConfig"):
        assert hasattr(runtime, name), name
    from covo_mpc_tpu.runtime import checkpoint

    for name in ("save_solver_state", "load_solver_state",
                 "save_eval_result"):
        assert hasattr(checkpoint, name), name

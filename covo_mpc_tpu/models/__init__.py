"""Physics core: structs, rotation math, dynamics, trajectories, rewards, env."""

from covo_mpc_tpu.models import dynamics, misc, rewards, rotation, trajectory
from covo_mpc_tpu.models.quad_env import EnvConfig, QuadEnv
from covo_mpc_tpu.models.wrappers import LogEnvState, LogWrapper
from covo_mpc_tpu.models.structs import (
    PACKED_STATE_DIM,
    Action3D,
    EnvParams3D,
    EnvState3D,
    default_array,
    pack_state,
    unpack_state,
)

__all__ = [
    "Action3D",
    "EnvConfig",
    "EnvParams3D",
    "EnvState3D",
    "LogEnvState",
    "LogWrapper",
    "misc",
    "PACKED_STATE_DIM",
    "QuadEnv",
    "default_array",
    "dynamics",
    "pack_state",
    "rewards",
    "rotation",
    "trajectory",
    "unpack_state",
]

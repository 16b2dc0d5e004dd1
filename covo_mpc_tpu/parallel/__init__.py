"""Multi-chip layer: meshes and sharded solve steps."""

from covo_mpc_tpu.parallel.distributed import device_topology, initialize_distributed
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS, SCENARIO_AXIS, make_mesh
from covo_mpc_tpu.parallel.offline import make_distributed_offline_schedule
from covo_mpc_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_init_factor,
    make_pipeline_mesh,
    make_pipeline_step,
)
from covo_mpc_tpu.parallel.scenarios import (
    make_batched_covo_solve,
    make_multichip_control_step,
    make_multichip_covo_step,
)
from covo_mpc_tpu.parallel.sharded import (
    make_sharded_covo_sample_rollout,
    make_sharded_mppi_solve,
)

__all__ = [
    "PIPE_AXIS",
    "SAMPLE_AXIS",
    "SCENARIO_AXIS",
    "make_init_factor",
    "make_pipeline_mesh",
    "make_pipeline_step",
    "device_topology",
    "initialize_distributed",
    "make_mesh",
    "make_batched_covo_solve",
    "make_distributed_offline_schedule",
    "make_multichip_control_step",
    "make_multichip_covo_step",
    "make_sharded_covo_sample_rollout",
    "make_sharded_mppi_solve",
]

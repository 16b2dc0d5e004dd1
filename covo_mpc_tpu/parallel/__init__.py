"""Multi-chip layer: meshes and sharded solve steps."""

from covo_mpc_tpu.parallel.mesh import make_mesh
from covo_mpc_tpu.parallel.sharded import make_sharded_mppi_solve

__all__ = ["make_mesh", "make_sharded_mppi_solve"]

"""Device-mesh construction.

The framework scales along two embarrassingly parallel axes
(SURVEY.md §2): the MPC *sample* axis N (sharded rollouts + collective
reductions) and the domain-randomized *scenario* axis (independent
episodes). Axis names below are used by every sharded op.

On a pod slice, lay `samples` along the fastest (ICI-adjacent) dimension so
the per-solve pmin/psum reductions ride ICI; `scenarios` needs no
per-solve communication and can span DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

SAMPLE_AXIS = "samples"
SCENARIO_AXIS = "scenarios"


def make_mesh(
    samples: Optional[int] = None,
    scenarios: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (samples, scenarios) mesh over the given (or all) devices.

    ``samples`` defaults to ``len(devices) // scenarios``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if samples is None:
        samples = len(devices) // scenarios
    if samples * scenarios != len(devices):
        raise ValueError(
            f"mesh {samples}x{scenarios} != {len(devices)} devices"
        )
    # samples must be the CONTIGUOUS (fast, ICI-adjacent) device axis:
    # its 3 per-solve collectives are latency-bound, while scenarios need
    # no per-solve communication and may span hosts/DCN. A C-order
    # reshape(samples, scenarios) would stride the sample groups across
    # the device list, putting them on the slow axis.
    grid = np.array(devices).reshape(scenarios, samples)
    return Mesh(grid, (SCENARIO_AXIS, SAMPLE_AXIS))

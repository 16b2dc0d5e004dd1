"""Reference-trajectory generators.

Each generator returns ``(pos_traj, vel_traj, acc_traj)`` tables of shape
``(T, 3)`` that are stored ONCE in the episode state and shared by every
rollout sample — the rollout engines index them with a scalar (per-step)
time, so the tables are never replicated across the sample axis.

Semantics follow the reference generators (reference:
quadjax/dynamics/utils.py:49-251) including their RNG key trees, so that a
seeded episode produces the identical reference trajectory.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Traj = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def generate_fixed_traj(max_steps: int, dt: float, key: jax.Array) -> Traj:
    """All-zeros hover target (reference: utils.py:49-53)."""
    zeros = jnp.zeros((max_steps, 3))
    return zeros, zeros, zeros


def _lissajous(max_steps: int, dt: float, key: jax.Array, f1: float, f2: float) -> Traj:
    """Two-harmonic Lissajous position/velocity/acceleration tables.

    Vectorized over the three axes (the reference builds each axis in a
    Python loop, utils.py:102-128); same draws, same values.
    Table length is ``max_steps + 50`` so rollout horizons that run past the
    episode end still have targets (reference: utils.py:97).
    """
    key_amp, key_phase = jax.random.split(key, 2)
    amp = jax.random.uniform(key_amp, shape=(3, 2), minval=-1.0, maxval=1.0)
    phase = jax.random.uniform(
        key_phase, shape=(3, 2), minval=-jnp.pi, maxval=jnp.pi
    )
    ts = jnp.arange(0, max_steps + 50) * dt  # (T,)
    w1 = 2.0 * jnp.pi * f1
    w2 = 2.0 * jnp.pi * f2
    # (T, 3) per harmonic via broadcasting: ts[:, None] against (3,) params
    s1 = jnp.sin(w1 * ts[:, None] + phase[None, :, 0]) * amp[None, :, 0]
    s2 = jnp.sin(w2 * ts[:, None] + phase[None, :, 1]) * amp[None, :, 1]
    pos = s1 + s2
    pos = pos - pos[0]
    vel = (
        jnp.cos(w1 * ts[:, None] + phase[None, :, 0]) * amp[None, :, 0] * w1
        + jnp.cos(w2 * ts[:, None] + phase[None, :, 1]) * amp[None, :, 1] * w2
    )
    acc = (
        -jnp.sin(w1 * ts[:, None] + phase[None, :, 0]) * amp[None, :, 0] * w1**2
        - jnp.sin(w2 * ts[:, None] + phase[None, :, 1]) * amp[None, :, 1] * w2**2
    )
    return pos, vel, acc


def generate_lissa_traj(max_steps: int, dt: float, key: jax.Array) -> Traj:
    """Standard Lissajous (0.2 Hz + 0.4 Hz) (reference: utils.py:87-130)."""
    return _lissajous(max_steps, dt, key, 0.2, 0.4)


def generate_lissa_traj_slow(max_steps: int, dt: float, key: jax.Array) -> Traj:
    """Slow Lissajous (0.1 Hz + 0.1 Hz) (reference: utils.py:133-180)."""
    return _lissajous(max_steps, dt, key, 0.1, 0.1)


def generate_zigzag_traj(max_steps: int, dt: float, key: jax.Array) -> Traj:
    """Piecewise-linear zigzag toward randomly rotated directions
    (reference: utils.py:183-251).

    40-step linear segments; each new direction points roughly back toward
    the origin with random polar perturbations in [-pi/3, pi/3] and a random
    segment length in [1.0, 1.5]. The reference derives keypoint and angle
    keys from the *same* split of the input key (utils.py:187-188), which we
    preserve.
    """
    point_per_seg = 40
    num_seg = max_steps // point_per_seg + 1

    seg_keys = jax.random.split(key, num_seg)

    prev_point = jax.random.uniform(seg_keys[0], shape=(3,), minval=-1.0, maxval=1.0)
    prev_point = prev_point / jnp.linalg.norm(prev_point) * 0.1

    def seg_fn(carry, seg_key):
        prev_point = carry
        vec_to_center = -prev_point / jnp.linalg.norm(prev_point)
        delta_theta, delta_phi = jax.random.uniform(
            seg_key, shape=(2,), minval=-jnp.pi / 3, maxval=jnp.pi / 3
        )
        theta = jnp.arccos(vec_to_center[2]) + delta_theta
        phi = jnp.arctan2(vec_to_center[1], vec_to_center[0]) + delta_phi
        direction = jnp.array(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(theta),
            ]
        )
        distance = jax.random.uniform(seg_key, minval=1.0, maxval=1.5)
        next_point = prev_point + distance * direction

        frac = jnp.arange(point_per_seg)[:, None] / point_per_seg  # endpoint=False
        pos_seg = prev_point[None, :] + (next_point - prev_point)[None, :] * frac
        vel_seg = jnp.broadcast_to(
            (next_point - prev_point) / (point_per_seg + 1) / dt,
            (point_per_seg, 3),
        )
        return next_point, (pos_seg, vel_seg)

    # Reference key-carry quirk (utils.py:238-244): the scan updates its key
    # carry to seg_keys[i + 1] AFTER iteration i but was also initialized to
    # seg_keys[1], so segments 0 and 1 both consume seg_keys[1] and segment
    # j >= 2 consumes seg_keys[j]. Preserved for trajectory parity.
    used_keys = jnp.concatenate([seg_keys[1:2], seg_keys[1:num_seg]], axis=0)
    _, (pos_segs, vel_segs) = jax.lax.scan(seg_fn, prev_point, used_keys)

    pos_traj = pos_segs.reshape(-1, 3)
    pos_traj = pos_traj - pos_traj[0]
    vel_traj = vel_segs.reshape(-1, 3)
    return pos_traj, vel_traj, jnp.zeros_like(pos_traj)


def get_generator(task: str):
    """Task name -> trajectory generator (reference: quadrotor.py:50-84)."""
    generators = {
        "tracking": generate_lissa_traj,
        "tracking_slow": generate_lissa_traj_slow,
        "tracking_zigzag": generate_zigzag_traj,
        "hovering": generate_fixed_traj,
    }
    if task not in generators:
        raise NotImplementedError(f"unknown task {task!r}")
    return generators[task]

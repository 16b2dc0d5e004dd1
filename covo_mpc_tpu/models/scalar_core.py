"""Component-form physics + reward core — the Pallas kernels' definition.

Everything here is written component-wise with purely elementwise ops so
it runs on (8, LANES) register slabs inside the fused kernels
(:mod:`covo_mpc_tpu.ops.rollout_pallas`), where vector ops over a trailing
(x, y, z) axis do not exist.

The bodyrate ODE and rewards intentionally exist in exactly TWO layouts:

  * **array form** — models/dynamics.bodyrate_step, models/rewards.*:
    consumed by the jnp rollout engine, the env step, and the adjoint
    Hessian's autodiff (ops/hessian delegates there). Vector HLO is what
    XLA fuses best for wide batches: the component form measured ~15%
    slower on the jnp engine and +0.04 ms/solve on the Hessian.
  * **component form** — this module: consumed by the kernels.

The two are pinned against each other by direct equivalence tests
(tests/test_dynamics.py, tests/test_rewards.py) plus the kernel-vs-jnp
cost-parity suite (tests/test_pallas_rollout.py). They cannot be unified
at the bit level anyway: XLA's FMA placement is layout-dependent, so even
an algebraically identical refactor moves results by ~1 ulp (see
BASELINE.md "Closed-loop parity interpretation").

Reference semantics: bodyrate ODE quadjax/dynamics/free.py:75-112,
rewards quadjax/dynamics/utils.py:267-313.
"""

from __future__ import annotations

import jax.numpy as jnp

# component-tuple layout of the 13-dim dynamic core state
#   (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz)
PX, PY, PZ, QX, QY, QZ, QW, VX, VY, VZ, WX, WY, WZ = range(13)


def quat_normalize(qx, qy, qz, qw):
    """Entry normalization (reference: free.py:88) — by / sqrt, matching
    the array path's ``q / ||q||`` bit-for-bit."""
    n = jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    return qx / n, qy / n, qz / n, qw / n


def bodyrate_step(state, thrust, omega_tar, fdist, m, g, dt, alpha):
    """One Euler step of the first-order bodyrate ODE on unpacked
    components (reference: free.py:75-112).

      r'     = v                       (position integrates PRE-update v)
      q'     = 0.5 * q x (omega, 0)    (Euler + renormalize)
      v'     = [0,0,-g] + (R(q) @ [0,0,thrust] + f_disturb) / m
      omega+ = alpha * omega + (1 - alpha) * omega_tar

    ``state`` is the 13-component tuple (layout above); ``thrust`` and
    ``omega_tar = (wtx, wty, wtz)`` are PHYSICAL controls with
    ``action_scale`` already applied; ``fdist = (fdx, fdy, fdz)``.
    Returns the next 13-component tuple.
    """
    px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz = state
    wtx, wty, wtz = omega_tar
    fdx, fdy, fdz = fdist

    qx, qy, qz, qw = quat_normalize(qx, qy, qz, qw)

    # body z-axis in world frame (third column of R(q))
    bzx = 2.0 * (qx * qz + qw * qy)
    bzy = 2.0 * (qy * qz - qw * qx)
    bzz = qw * qw - qx * qx - qy * qy + qz * qz

    # position BEFORE the velocity update (Euler, pre-update v)
    px = px + vx * dt
    py = py + vy * dt
    pz = pz + vz * dt
    vx = vx + (bzx * thrust + fdx) / m * dt
    vy = vy + (bzy * thrust + fdy) / m * dt
    vz = vz + (-g + (bzz * thrust + fdz) / m) * dt

    # quaternion kinematics: q += dt * 0.5 * q x (omega, 0), renormalize
    # (association matches rotation.quat_mul: w1*x2 + w2*x1 + (y1*z2 - z1*y2))
    qdx = 0.5 * (qw * wx + (qy * wz - qz * wy))
    qdy = 0.5 * (qw * wy + (qz * wx - qx * wz))
    qdz = 0.5 * (qw * wz + (qx * wy - qy * wx))
    qdw = 0.5 * (-(qx * wx + qy * wy + qz * wz))
    qx = qx + dt * qdx
    qy = qy + dt * qdy
    qz = qz + dt * qdz
    qw = qw + dt * qdw
    qx, qy, qz, qw = quat_normalize(qx, qy, qz, qw)

    # first-order bodyrate lag
    wx = alpha * wx + (1.0 - alpha) * wtx
    wy = alpha * wy + (1.0 - alpha) * wty
    wz = alpha * wz + (1.0 - alpha) * wtz
    return px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz


def log_pos_penalty(err_pos):
    """Multi-scale log barrier on position error (reference: utils.py:267-274)."""
    log1p = jnp.log(err_pos + 1.0)
    return (
        err_pos * 0.4
        + jnp.clip(log1p * 4.0, 0.0, 1.0) * 0.4
        + jnp.clip(log1p * 8.0, 0.0, 1.0) * 0.2
        + jnp.clip(log1p * 16.0, 0.0, 1.0) * 0.1
        + jnp.clip(log1p * 32.0, 0.0, 1.0) * 0.1
    )


def norm3(x, y, z):
    """||(x,y,z)|| via jnp.linalg.norm on the stacked vector — bit-exact
    with the reference's reward norms (utils.py:287-288 use linalg.norm,
    whose dot-product contraction FMA-fuses; no scalar mul/add association
    reproduces it). The closed-loop 1e-3 parity contract is ulp-sensitive
    (a 1-ulp reward change moves the chaotic divergence onset by several
    steps), so the array paths must use THIS form."""
    return jnp.linalg.norm(jnp.stack([x, y, z], axis=-1), axis=-1)


def norm3_elementwise(x, y, z):
    """sqrt(x^2+y^2+z^2) as pure elementwise ops — the Pallas-kernel form
    (slabs cannot stack into a trailing vector axis). ~1 ulp from
    :func:`norm3`; absorbed by the kernels' cost-parity tolerance."""
    return jnp.sqrt(x * x + y * y + z * z)


def penyaw_reward(pos, vel, quat, pos_tar, vel_tar, atan2=jnp.arctan2,
                  norm=norm3):
    """THE cost model of the MPPI/CoVO tasks (reference: utils.py:286-294):
    1.3 - 0.05*||v_err|| - log_pos(||p_err||) - 0.2*|yaw|.

    All arguments are component tuples: pos=(px,py,pz), vel=(vx,vy,vz),
    quat=(qx,qy,qz,qw), pos_tar/vel_tar 3-tuples. ``atan2`` and ``norm``
    are injectable lowering adaptations: Pallas-TPU has no atan2 lowering
    and cannot stack slabs (the kernels pass their polynomial and
    :func:`norm3_elementwise`); everything else uses the defaults, which
    are bit-exact with the reference.
    """
    px, py, pz = pos
    vx, vy, vz = vel
    qx, qy, qz, qw = quat
    ex, ey, ez = pos_tar[0] - px, pos_tar[1] - py, pos_tar[2] - pz
    evx, evy, evz = vel_tar[0] - vx, vel_tar[1] - vy, vel_tar[2] - vz
    err_pos = norm(ex, ey, ez)
    err_vel = norm(evx, evy, evz)
    yaw = atan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return 1.3 - 0.05 * err_vel - log_pos_penalty(err_pos) - jnp.abs(yaw) * 0.2


def realworld_reward(pos, quat_w, pos_tar):
    """Quadratic real-world cost (reference: utils.py:298-313):
    -(5*mean(p_err^2) + 3*(1 - q_w^2)) * 0.02. Component tuples as above."""
    px, py, pz = pos
    ex, ey, ez = pos_tar[0] - px, pos_tar[1] - py, pos_tar[2] - pz
    pos_err = (ex * ex + ey * ey + ez * ez) / 3.0
    quat_err = 1.0 - quat_w * quat_w
    return -(5.0 * pos_err + 3.0 * quat_err) * 0.02

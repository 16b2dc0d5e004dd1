"""Exact rollout-cost Hessian via second-order sensitivity propagation.

The generic estimators (ops/covariance.make_hessian) push a D x D tangent
batch through the whole rollout with nested jacfwd — on TPU that program
is HBM-bound on tangent traffic (~3 ms at H=32). This module computes the
SAME matrix by propagating sensitivities explicitly:

  per step:   J  = d step / d (s, a)          (13 x 17, autodiff at a point)
              Hf = d² step / d (s, a)²        (13 x 17 x 17)
  chain:      S1' = J @ [S1; E_h]                         (13 x D)
              S2' = J_s @ S2 + Tᵀ Hf T                    (13 x D x D)
  cost:       Hacc += S1'ᵀ (∇²r) S1' + Σ_k (∇r)_k S2'_k

where S1/S2 are first/second sensitivities of the state w.r.t. the
flattened action sequence and E_h injects the step's action block. The
local derivatives are exact (jax autodiff of the single-point step), the
propagation is the exact chain rule, so the result equals
jacfwd(jacfwd(cost)) to fp rounding — pinned by tests/test_covo.py — but
the heavy objects move through MXU einsums instead of replayed rollouts.

State is the 13-dim packed core (pos, quat, vel, omega); the force
disturbance is action-independent under the reference's Hessian semantics
(deterministic steps, per-step key splits — reference: covo.py:142-163)
for every disturbance model except "drag"/"mixed", and enters as a
precomputed (H, 3) constant table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from covo_mpc_tpu.models import dynamics, rotation
from covo_mpc_tpu.models.quad_env import QuadEnv
from covo_mpc_tpu.models.rotation import yaw_from_quat

_SD = 13  # sensitivity state: pos(3) quat(4) vel(3) omega(3)


def _step13(s, a, fdist, params, dt):
    """One bodyrate step on the 13-dim core state (reference: free.py:75-112),
    with the action clip of step_env (quadrotor.py:223/258) folded in."""
    a = jnp.clip(a, -1.0, 1.0)
    u, _ = dynamics.control_to_thrust_omega(a, params)
    u = u * params.action_scale
    thrust, omega_tar = u[0], u[1:4]

    r, q, v, w = s[0:3], s[3:7], s[7:10], s[10:13]
    q = rotation.quat_normalize(q)
    thrust_world = rotation.body_z_world(q) * thrust
    g_vec = jnp.array([0.0, 0.0, -1.0]) * params.g
    v_dot = g_vec + (thrust_world + fdist) / params.m

    omega_quat = jnp.concatenate([w, jnp.zeros(1)])
    q_dot = 0.5 * rotation.quat_mul(q, omega_quat)

    r_new = r + v * dt
    q_new = rotation.quat_normalize(q + q_dot * dt)
    v_new = v + v_dot * dt
    w_new = params.alpha_bodyrate * w + (1.0 - params.alpha_bodyrate) * omega_tar
    return jnp.concatenate([r_new, q_new, v_new, w_new])


def _reward13(s, pos_tar, vel_tar, reward_name: str):
    pos, q, v = s[0:3], s[3:7], s[7:10]
    if reward_name == "penyaw":
        err_pos = jnp.linalg.norm(pos_tar - pos)
        err_vel = jnp.linalg.norm(vel_tar - v)
        log1p = jnp.log(err_pos + 1.0)
        logpos = (
            err_pos * 0.4
            + jnp.clip(log1p * 4.0, 0.0, 1.0) * 0.4
            + jnp.clip(log1p * 8.0, 0.0, 1.0) * 0.2
            + jnp.clip(log1p * 16.0, 0.0, 1.0) * 0.1
            + jnp.clip(log1p * 32.0, 0.0, 1.0) * 0.1
        )
        return 1.3 - 0.05 * err_vel - logpos - jnp.abs(yaw_from_quat(q)) * 0.2
    pos_err = jnp.mean((pos - pos_tar) ** 2)
    quat_err = 1.0 - q[3] ** 2
    return -(5.0 * pos_err + 3.0 * quat_err) * 0.02


def build_hessian_disturb_table(env: QuadEnv, x0, t0, params, key, H: int):
    """(H, 3) f_disturb in effect during each Hessian-rollout step.

    Unlike sampled rollouts, the Hessian rollout splits a fresh key per
    step (reference: covo.py:151), and runs deterministic (dyn noise
    zeroed). Step 0 integrates with x0's own disturbance; step h >= 1 with
    the model output at time t0 + h - 1 under key_h-1.
    """
    params = params.replace(dyn_noise_scale=0.0)
    disturb_fn = env.disturb_fn
    f0 = x0[13:16]

    def step(carry, h):
        f_prev, k = carry
        rng_act, k = jax.random.split(k)
        f = disturb_fn(
            dynamics.derive_dynamics_keys(rng_act), params, t0 + h, None, f_prev
        )
        return (f, k), f

    (_, _), fs = lax.scan(step, (f0, key), jnp.arange(H - 1))
    return jnp.concatenate([f0[None], fs], axis=0)


def make_hessian_sensitivity(env: QuadEnv, H: int):
    """Build ``hessian(a_flat, x0, t0, pos_traj, vel_traj, params, key) ->
    (D, D)`` — drop-in for covariance.make_hessian(make_hessian_cost(...)).
    """
    if env.config.disturb_type in ("drag", "mixed"):
        raise NotImplementedError(
            "velocity-dependent disturbance couples into the sensitivity "
            "state; use the autodiff Hessian estimators"
        )
    reward_name = env.reward_name
    dt = env._dt
    dA = env.action_dim
    D = H * dA

    def hessian(a_flat, x0, t0, pos_traj, vel_traj, params, key):
        a_seq = a_flat.reshape(H, dA)
        T_traj = pos_traj.shape[0]
        dist = build_hessian_disturb_table(env, x0, t0, params, key, H)

        step_sa = lambda sa, fd: _step13(sa[:_SD], sa[_SD:], fd, params, dt)
        step_jac = jax.jacfwd(step_sa)
        step_hess = jax.jacfwd(step_jac)
        rew = lambda s, pt, vt: _reward13(s, pt, vt, reward_name)
        reward_grad = jax.grad(rew)
        reward_hess = jax.hessian(rew)

        def body(carry, inp):
            s, S1, S2, Hacc = carry
            a, h = inp
            sa = jnp.concatenate([s, a])

            s_new = step_sa(sa, dist[h])
            J = step_jac(sa, dist[h])  # (13, 17)
            Hf = step_hess(sa, dist[h])  # (13, 17, 17)

            # T: d(sa)/d(a_flat) — state rows carry S1, action rows are the
            # h-th 4-column identity block
            E = lax.dynamic_update_slice(
                jnp.zeros((dA, D)), jnp.eye(dA), (0, h * dA)
            )
            T = jnp.concatenate([S1, E], axis=0)  # (17, D)

            S1_new = J @ T  # (13, D)
            S2_new = jnp.einsum("kl,lab->kab", J[:, :_SD], S2) + jnp.einsum(
                "kuv,ua,vb->kab", Hf, T, T
            )

            # post-step reward (pre-step reward of iteration h+1); the last
            # step's reward is constant-trimmed (see ops/rollout.py)
            ti = jnp.clip(t0 + h + 1, 0, T_traj - 1)
            g_r = reward_grad(s_new, pos_traj[ti], vel_traj[ti])
            H_r = reward_hess(s_new, pos_traj[ti], vel_traj[ti])
            contrib = S1_new.T @ H_r @ S1_new + jnp.einsum("k,kab->ab", g_r, S2_new)
            Hacc = jnp.where(h < H - 1, Hacc + contrib, Hacc)
            return (s_new, S1_new, S2_new, Hacc), None

        init = (
            x0[:_SD],
            jnp.zeros((_SD, D)),
            jnp.zeros((_SD, D, D)),
            jnp.zeros((D, D)),
        )
        (_, _, _, Hacc), _ = lax.scan(body, init, (a_seq, jnp.arange(H)))
        return -Hacc  # cost = -reward sum

    return hessian

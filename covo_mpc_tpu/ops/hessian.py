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
precomputed (H, 3) constant table. For the velocity-coupled models
("drag"/"mixed", reference: free.py:41-56) the disturbance force is a
function of the rollout's own velocity, so the sensitivity state widens
to 16 dims (core 13 + f_dist) with the disturbance update folded into the
differentiated step; the key/time-dependent parts of "mixed" (sin value,
periodic draw + mask) are still action-independent constants and enter as
a precomputed (H, 7) table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from covo_mpc_tpu.models import dynamics, rewards
from covo_mpc_tpu.models.quad_env import QuadEnv
from covo_mpc_tpu.utils.vma import match_vma

_SD = 13  # sensitivity state: pos(3) quat(4) vel(3) omega(3)
_SDV = 16  # velocity-coupled sensitivity state: core 13 + f_dist(3)


def _vel_coupled(env: QuadEnv) -> bool:
    """True when the disturbance force depends on the rollout's own state
    (reference: free.py:41-56) — the Hessian must differentiate through it."""
    return env.config.disturb_type in ("drag", "mixed")


def _step13(s, a, fdist, params, dt):
    """One bodyrate step on the 13-dim core state (reference: free.py:75-112),
    with the action clip of step_env (quadrotor.py:223/258) folded in.

    Delegates to THE array-form ODE (models/dynamics.bodyrate_step) so jax
    differentiates the same code the jnp rollout engine integrates — the
    Hessian carries no physics of its own. (The vector form also autodiffs
    ~0.04 ms/solve faster than the kernels' component form: fewer, wider
    HLO ops under the 17-dim tangent batches.)"""
    a = jnp.clip(a, -1.0, 1.0)
    u, _ = dynamics.control_to_thrust_omega(a, params)
    x16 = jnp.concatenate([s, fdist])
    return dynamics.bodyrate_step(x16, u, params, dt)[:13]


def _reward13(s, pos_tar, vel_tar, reward_name: str):
    """Reward on the 13-dim core state — delegates to the array-form
    definitions in models/rewards (no reward math of its own)."""
    pos, q, v = s[0:3], s[3:7], s[7:10]
    if reward_name == "penyaw":
        return rewards.tracking_penyaw_reward(pos, v, q, pos_tar, vel_tar)
    return rewards.tracking_realworld_reward(pos, q, pos_tar)


def _step16(z_s, a, aux, params, dt, mixed: bool):
    """One bodyrate step on the 16-dim state (core 13 + f_dist), with the
    velocity-coupled disturbance update folded into the differentiated step
    (reference: free.py:41-56 applied at free.py:147).

    The force applied DURING the step is the state's own f_dist (computed
    last iteration from the then-pre-step velocity — the update order of
    make_hessian_cost, ops/rollout.py:205-213); the returned state carries
    the post-step disturbance drag(v_pre) (+ the "mixed" model's sin /
    periodic terms, whose key/time parts are per-step constants in ``aux``:
    [sin value (3), periodic draw (3), redraw mask (1)]).
    """
    a = jnp.clip(a, -1.0, 1.0)
    u, _ = dynamics.control_to_thrust_omega(a, params)
    core = dynamics.bodyrate_step(z_s, u, params, dt)[:13]
    v, f_prev = z_s[7:10], z_s[13:16]
    f = dynamics.drag_disturb(None, params, None, v, f_prev)
    if mixed:
        f = (f + aux[:3] + jnp.where(aux[6] > 0, aux[3:6], f_prev)) / 3.0
    return jnp.concatenate([core, f])


def build_hessian_aux_table(env: QuadEnv, x0, t0, params, key, H: int):
    """(H, 7) per-iteration constants [sin value, periodic draw, redraw
    mask] for the in-state disturbance update of the velocity-coupled
    Hessian rollout ("mixed"); zeros for "drag", whose update needs no
    constants. Iteration h's update runs at time t0 + h under the h-th key
    of the same split chain as make_hessian_cost (ops/rollout.py:200-212;
    reference: covo.py:151)."""
    if env.config.disturb_type == "drag":
        return match_vma(jnp.zeros((H, 7), x0.dtype), x0)
    params = params.replace(dyn_noise_scale=0.0)
    times = t0 + jnp.arange(H)
    zeros3 = match_vma(jnp.zeros((3,), x0.dtype), x0)
    sin_vals = jax.vmap(
        lambda t: dynamics.sin_disturb(key, params, t, None, zeros3)
    )(times)
    mask = (times % params.disturb_period == 0).astype(x0.dtype)

    def step(k, _):
        rng_act, k = jax.random.split(k)
        dk = dynamics.derive_dynamics_keys(rng_act)
        # the periodic component's draw (reference: free.py:10-24)
        draw = jax.random.uniform(
            dk, (3,), minval=-params.disturb_scale, maxval=params.disturb_scale
        )
        return k, draw

    _, draws = lax.scan(step, key, None, length=H)
    return jnp.concatenate([sin_vals, draws, mask[:, None]], axis=1)


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

    # The sequential 32-way key-split chain costs ~0.9 ms on TPU (dominates
    # the whole Hessian) yet its values are key-independent for every
    # disturbance the adjoint supports: gaussian draws are zeroed by
    # dyn_noise_scale=0, "none" is zero, and "sin" is a closed form in time.
    # Only "periodic" (key-chained uniforms) needs the scan.
    if env.config.disturb_type in ("gaussian", "none"):
        # the zeros must match f0's varying-manual-axes when the Hessian
        # runs inside shard_map (e.g. parallel/pipeline.py's design stage)
        zeros = match_vma(jnp.zeros((H - 1, 3), x0.dtype), f0)
        return jnp.concatenate([f0[None], zeros], axis=0)
    if env.config.disturb_type == "sin":
        times = t0 + jnp.arange(H - 1)
        fs = jax.vmap(lambda t: disturb_fn(key, params, t, None, f0))(times)
        return jnp.concatenate([f0[None], fs], axis=0)

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
    reward_name = env.reward_name
    dt = env._dt
    dA = env.action_dim
    D = H * dA
    vel = _vel_coupled(env)
    SD = _SDV if vel else _SD
    mixed = env.config.disturb_type == "mixed"

    def hessian(a_flat, x0, t0, pos_traj, vel_traj, params, key):
        a_seq = a_flat.reshape(H, dA)
        T_traj = pos_traj.shape[0]
        if vel:
            aux = build_hessian_aux_table(env, x0, t0, params, key, H)
            step_sa = lambda sa, au: _step16(
                sa[:SD], sa[SD:], au, params, dt, mixed
            )
        else:
            aux = build_hessian_disturb_table(env, x0, t0, params, key, H)
            step_sa = lambda sa, fd: _step13(sa[:SD], sa[SD:], fd, params, dt)
        step_jac = jax.jacfwd(step_sa)
        step_hess = jax.jacfwd(step_jac)
        rew = lambda s, pt, vt: _reward13(s, pt, vt, reward_name)
        reward_grad = jax.grad(rew)
        reward_hess = jax.hessian(rew)

        def body(carry, inp):
            s, S1, S2, Hacc = carry
            a, h = inp
            sa = jnp.concatenate([s, a])

            s_new = step_sa(sa, aux[h])
            J = step_jac(sa, aux[h])  # (SD, SD+dA)
            Hf = step_hess(sa, aux[h])  # (SD, SD+dA, SD+dA)

            # T: d(sa)/d(a_flat) — state rows carry S1, action rows are the
            # h-th 4-column identity block
            E = lax.dynamic_update_slice(
                jnp.zeros((dA, D)), jnp.eye(dA), (0, h * dA)
            )
            T = jnp.concatenate([S1, E], axis=0)  # (SD+dA, D)

            S1_new = J @ T  # (SD, D)
            S2_new = jnp.einsum("kl,lab->kab", J[:, :SD], S2) + jnp.einsum(
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
            x0[:SD],
            jnp.zeros((SD, D)),
            jnp.zeros((SD, D, D)),
            jnp.zeros((D, D)),
        )
        (_, _, _, Hacc), _ = lax.scan(body, init, (a_seq, jnp.arange(H)))
        return -Hacc  # cost = -reward sum

    return hessian


def make_hessian_adjoint(
    env: QuadEnv, H: int, primal: str = "scan", tail: str = "xla",
    second_order: bool = True,
):
    """Exact Hessian via the second-order adjoint (costate) identity.

    With z_h = (s_h, a_h), g_h(z) = r(f(z)) and C = Σ_h g_h(z_h), the exact
    Hessian factorizes as

        ∇²C = Σ_h T_hᵀ [ ∇²g_h + Σ_k μ_{h,k} ∂²f_k/∂z² ] T_h

    where T_h = d z_h / d a = [S1_h; E_h] needs only FIRST-order forward
    sensitivities and μ is a 13-dim costate from one backward scan
    (μ_j = w_{j+1} + A_{j+1}ᵀ μ_{j+1}, w = ∂g/∂s) that absorbs every
    second-order cross-step term the sensitivity method carries as a
    (13, D, D) tensor. Sequential work shrinks to three 13-wide scans;
    local derivatives batch over the horizon with vmap; the final
    contraction is one (H,17,D)-shaped einsum pair.

    Same matrix as jacfwd(jacfwd(cost)) to fp rounding (tests/test_covo.py).

    ``primal``: "scan" (XLA) or "pallas"/"pallas_interpret". The 32
    sequential 13-dim steps of the nominal rollout cost ~0.8 ms as an XLA
    scan (one fusion launch per step on a batch of ONE) — 90+% of the whole
    Hessian; the Pallas primal runs the chain in-kernel.

    ``tail``: "xla" or "pallas"/"pallas_interpret" — run steps 3/5/6 (the
    sequential forward-sensitivity chain + quadratic pullback, H dependent
    tiny matmuls) as one fused kernel (ops/hessian_pallas.py). The backward
    costate and M stay in XLA either way.

    ``second_order=False`` is the GAUSS–NEWTON approximation
    (``hessian_mode="gn"``): M_h = J_hᵀ (∇²r)(s_{h+1}) J_h — every
    second-order dynamics term is dropped (the (13, 17, 17) per-step
    dynamics Hessian, the reward-gradient pullback through it, and the
    whole backward costate scan), leaving only first-order Jacobians and
    the tiny (13, 13) reward Hessians. Exact iff the dynamics are linear;
    on the quadrotor the quaternion/trig curvature it ignores is
    second-order in the action perturbation, and Σ design only shapes the
    SAMPLING distribution, not the optimum — quality is gated on the eval
    protocol like every non-parity mode. (First-order-only curvature for
    sampling MPC is the pattern in the retrieved Gauss–Newton-accelerated
    MPPI literature, PAPERS.md; no reference counterpart —
    quadjax/controllers/covo.py:183-185 is always exact.) Quality gate
    PASSED on the 40-episode protocol: RESULTS.md "Speed-mode quality
    gates" — gn 3.52 cm / gn+kernel-rng 3.57 cm, +48.0%/+47.2% vs the
    same-run MPPI anchor, on par with the exact adjoint.
    """
    reward_name = env.reward_name
    dt = env._dt
    dA = env.action_dim
    D = H * dA
    vel = _vel_coupled(env)
    SD = _SDV if vel else _SD
    mixed = env.config.disturb_type == "mixed"
    if vel and primal != "scan":
        # the Pallas primal kernel rolls out against a constant (H, 3)
        # disturbance table; velocity-coupled disturbances evolve in-state,
        # so the nominal rollout runs as the scan primal instead
        primal = "scan"
    if primal in ("pallas", "pallas_interpret"):
        from covo_mpc_tpu.ops.rollout_pallas import make_pallas_primal

        pallas_primal = make_pallas_primal(
            env, H, interpret=(primal == "pallas_interpret")
        )
    elif primal == "scan":
        pallas_primal = None
    else:
        raise ValueError(f"unknown primal mode {primal!r}")
    if tail in ("pallas", "pallas_interpret"):
        from covo_mpc_tpu.ops.hessian_pallas import make_tail_pullback

        tail_pullback = make_tail_pullback(
            H, dA, sd=SD, interpret=(tail == "pallas_interpret")
        )
    elif tail == "xla":
        tail_pullback = None
    else:
        raise ValueError(f"unknown tail mode {tail!r}")

    def hessian(a_flat, x0, t0, pos_traj, vel_traj, params, key):
        a_seq = a_flat.reshape(H, dA)
        T_traj = pos_traj.shape[0]
        if vel:
            aux = build_hessian_aux_table(env, x0, t0, params, key, H)
            step_z = lambda z, au: _step16(z[:SD], z[SD:], au, params, dt, mixed)
        else:
            aux = build_hessian_disturb_table(env, x0, t0, params, key, H)
            step_z = lambda z, fd: _step13(z[:SD], z[SD:], fd, params, dt)
        idx = jnp.clip(t0 + 1 + jnp.arange(H), 0, T_traj - 1)
        ptars = pos_traj[idx]
        vtars = vel_traj[idx]

        rew = lambda s, pt, vt: _reward13(s, pt, vt, reward_name)

        # 1) primal rollout, collecting z_h = (s_h, a_h)
        # kernels inside shard_map must declare the mesh axes their output
        # varies over (check_vma) — derive them from the inputs
        vary = tuple(getattr(jax.typeof(x0), "vma", frozenset()))
        if pallas_primal is not None:
            zs = pallas_primal(x0, a_seq, aux, params, vma=vary)  # (H, 17)
        else:

            def prim(s, inp):
                a, au = inp
                z = jnp.concatenate([s, a])
                return step_z(z, au), z

            _, zs = lax.scan(
                prim, x0[:SD], (a_seq, aux), unroll=True
            )  # (H, SD + dA)

        # the last step's reward is constant-trimmed (see make_hessian_cost)
        mask = (jnp.arange(H) < H - 1).astype(jnp.float32)

        if not second_order:
            # Gauss–Newton: only first-order Jacobians and the (13, 13)
            # reward Hessian at the post-step state; no dynamics Hessian,
            # no costate. HIGHEST precision: the default matmul path
            # bf16-truncates (~7e-3 absolute on a unit-scale Hessian).
            def local_derivs_gn(z, fd, pt, vt):
                f = lambda zz: step_z(zz, fd)
                J = jax.jacfwd(f)(z)  # (13, 17) = [A | B]
                H_r = jax.hessian(lambda ss: rew(ss, pt, vt))(f(z))
                return J, H_r

            J, H_r = jax.vmap(local_derivs_gn)(zs, aux, ptars, vtars)
            M = jnp.einsum(
                "hku,hkl,hlv->huv", J, H_r, J,
                precision=jax.lax.Precision.HIGHEST,
            ) * mask[:, None, None]  # (H, 17, 17)
        else:
            # 2) local derivatives, batched over the horizon
            def local_derivs(z, fd, pt, vt):
                f = lambda zz: step_z(zz, fd)
                J = jax.jacfwd(f)(z)  # (13, 17) = [A | B]
                Hf = jax.jacfwd(jax.jacfwd(f))(z)  # (13, 17, 17)
                g = lambda zz: rew(f(zz), pt, vt)
                return J, Hf, jax.grad(g)(z), jax.hessian(g)(z)

            J, Hf, grad_g, hess_g = jax.vmap(local_derivs)(zs, aux, ptars, vtars)
            grad_g = grad_g * mask[:, None]
            hess_g = hess_g * mask[:, None, None]

            # 4) backward costate: mu_j = w_{j+1} + A_{j+1}^T mu_{j+1}
            # (before step 3 — the fused tail consumes M up front)
            A_next = J[1:, :, :SD][::-1]  # A_{j+1} for j = H-2..0
            w_next = grad_g[1:, :SD][::-1]

            def bwd(mu, inp):
                A, w = inp
                mu = w + A.T @ mu
                return mu, mu

            _, mus_rev = lax.scan(
                bwd, match_vma(jnp.zeros(SD), grad_g), (A_next, w_next),
                unroll=True,
            )
            mus = jnp.concatenate(
                [mus_rev[::-1], match_vma(jnp.zeros((1, SD)), mus_rev)], axis=0
            )

            # 5) per-step quadratic forms
            M = hess_g + jnp.einsum("hk,hkuv->huv", mus, Hf)  # (H, 17, 17)

        if tail_pullback is not None:
            # 3/6 fused: chained T_h and the pullback in one kernel
            return -tail_pullback(J, M, vma=vary)

        # 3) forward first-order sensitivities: T_h = [S1_h; E_h]
        def fwd(S1, inp):
            J_h, h = inp
            E = lax.dynamic_update_slice(
                jnp.zeros((dA, D)), jnp.eye(dA), (0, h * dA)
            )
            T_h = jnp.concatenate([S1, E], axis=0)  # (17, D)
            return J_h @ T_h, T_h

        _, T = lax.scan(
            fwd, match_vma(jnp.zeros((SD, D)), J), (J, jnp.arange(H)),
            unroll=True,
        )  # (H,17,D)

        # 6) pull back and sum
        MT = jnp.einsum("huv,hvx->hux", M, T)  # (H, 17, D)
        Hess = jnp.einsum("hux,huy->xy", T, MT)  # (D, D)
        return -Hess

    return hessian

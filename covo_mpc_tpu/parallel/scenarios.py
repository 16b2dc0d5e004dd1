"""Distributed control step over a batch of domain-randomized scenarios.

The pod-scale configuration (BASELINE.json config #5): a 2-D mesh where

  * SCENARIO_AXIS shards a batch of independent DR episodes (pure data
    parallelism — no per-solve communication, safe to span DCN), and
  * SAMPLE_AXIS shards each solve's N rollout samples (three tiny
    collectives per solve — keep on ICI).

One call = one full MPC control step for every scenario: receding-horizon
shift, sharded sampling/rollout/reduction, solver-state update, and the
auto-resetting environment step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.models.structs import pack_state
from covo_mpc_tpu.ops import reductions, sampling
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS, SCENARIO_AXIS
from covo_mpc_tpu.utils.vma import pvary


def _make_batched_cost_engine(env, engine: str, interpret: bool = False):
    """Scenario-batched costs-only rollout for the multichip steps.

    ``engine="pallas"`` runs ONE fused kernel over a (B_local, lane-tiles)
    grid per shard (ops/rollout_pallas.make_pallas_rollout_batched) — the
    single-scenario kernel cannot vmap over its SMEM operands, so the
    scenario axis is a native grid dimension instead. ``engine="jnp"``
    vmaps the packed-state scan engine.

    Returns ``costs_fn(x0s, t0s, pos_trajs, vel_trajs, actions
    (B, n_local, H, dA), params_b, step_keys, deterministic, discount)
    -> costs (B, n_local)``; all inputs batched over scenarios on axis 0.
    """
    if engine == "jnp":
        # non-parity modes only -> fast disturbance key chain (see
        # parallel/sharded.make_cost_engine)
        rollout = make_rollout(env, fast_keys=True)

        def costs_fn(x0s, t0s, pos_trajs, vel_trajs, actions, params_b,
                     step_keys, deterministic, discount, layout="bnhd"):
            assert layout == "bnhd", "jnp engine takes (B, N, H, dA) actions"

            def one(x0, t0, pt, vt, a, p, k):
                costs, _ = rollout(
                    x0, t0, pt, vt, a, p, k,
                    deterministic=deterministic, discount=discount,
                    collect_poses=False,
                    vary_axes=(SAMPLE_AXIS, SCENARIO_AXIS),
                )
                return costs

            return jax.vmap(one)(
                x0s, t0s, pos_trajs, vel_trajs, actions, params_b, step_keys
            )

    elif engine == "pallas":
        from covo_mpc_tpu.ops.rollout_pallas import make_pallas_rollout_batched

        # ragged per-shard sample counts are tile-padded by the kernel
        rollout_b = make_pallas_rollout_batched(env, interpret=interpret,
                                                fast_keys=True)

        def costs_fn(x0s, t0s, pos_trajs, vel_trajs, actions, params_b,
                     step_keys, deterministic, discount, layout="bnhd"):
            # promote replicated operands to the sampled actions' vma so
            # the kernel call sees one consistent varying set (shard_map;
            # empty — a no-op — under the interpret tests' check_vma=False)
            vary = getattr(jax.typeof(actions), "vma", frozenset())
            args = jax.tree.map(
                lambda x: pvary(x, tuple(vary)),
                (x0s, t0s, pos_trajs, vel_trajs, params_b, step_keys,
                 discount),
            )
            x0s, t0s, pos_trajs, vel_trajs, params_b, step_keys, discount = args
            return rollout_b(
                x0s, t0s, pos_trajs, vel_trajs, actions, params_b, step_keys,
                deterministic=deterministic, discount=discount,
                vma=tuple(vary), layout=layout,
            )

    else:
        raise ValueError(f"unknown engine {engine!r}")
    return costs_fn


def make_multichip_control_step(env, mesh, N: int, H: int, lam: float,
                                engine: str = "jnp",
                                interpret: bool = False,
                                rng: str = "invariant"):
    """Build the jitted distributed MPPI control step.

    Returns ``step(states, params, a_means, a_covs, keys, gamma_mean,
    gamma_sigma, discount) -> (states', a_means', a_covs', rewards,
    dones)`` where every array input is batched over scenarios on axis 0
    and sharded over SCENARIO_AXIS; the sample axis is materialized
    per-shard inside (never as a global array). The gammas/discount are
    replicated runtime scalars with the single-chip solver's semantics
    (reference: mppi.py:114-126) — in particular the weighted covariance
    update the reference applies at γ_σ>0 is preserved, not dropped.
    ``engine="pallas"`` runs the fused batched rollout kernel per shard.
    ``rng="kernel"`` (pallas only) draws inside that kernel on TPU-PRNG
    streams disjoint per (scenario shard, sample shard, scenario, lane
    block) — fastest, but forfeits mesh-shape invariance (DESIGN.md §2).
    """
    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    if N % n_sample_shards:
        raise ValueError(f"N={N} not divisible by {n_sample_shards}")
    n_local = N // n_sample_shards
    if rng == "kernel":
        if engine != "pallas":
            raise ValueError("rng='kernel' requires engine='pallas'")
        from covo_mpc_tpu.ops.rollout_pallas import (
            make_pallas_rollout_batched_sampling,
        )

        fused = make_pallas_rollout_batched_sampling(
            env, interpret=interpret, joint=False, fast_keys=True
        )
    else:
        fused = None
    costs_engine = _make_batched_cost_engine(env, engine, interpret)
    # fast path samples in the kernel's sample-axis-last layout (same
    # draws — ops/sampling.sample_per_step_t), skipping per-shard transposes
    transposed = engine == "pallas"

    def local_step(states, params_b, a_means, a_covs, keys,
                   gamma_mean, gamma_sigma, discount):
        # receding-horizon shift of mean AND cov (reference: mppi.py:43-49)
        a_means = jnp.concatenate([a_means[:, 1:], a_means[:, -1:]], axis=1)
        a_covs = jnp.concatenate([a_covs[:, 1:], a_covs[:, -1:]], axis=1)
        split = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
        act_keys, step_keys, env_keys = split[:, 1], split[:, 2], split[:, 3]

        shard = lax.axis_index(SAMPLE_AXIS)
        ids = shard * n_local + jnp.arange(n_local)
        x0s = jax.vmap(pack_state)(states)
        if fused is not None:
            # fused sample+rollout: act_keys[0] is scenario-shard-specific,
            # the sample-shard fold + in-kernel (scenario, block) grid
            # indices make every stream disjoint
            kb = jax.random.fold_in(act_keys[0], shard)
            vary = tuple(getattr(jax.typeof(kb), "vma", frozenset()))
            x0s_v, t_v, pt_v, vt_v, m_v, c_v, p_v, sk_v, disc_v = (
                jax.tree.map(
                    lambda x: pvary(x, vary),
                    (x0s, states.time, states.pos_traj, states.vel_traj,
                     a_means, jnp.linalg.cholesky(a_covs), params_b,
                     step_keys, discount),
                )
            )
            costs, a_flat = fused(
                x0s_v, t_v, pt_v, vt_v, m_v, c_v, p_v, sk_v, kb, n_local,
                deterministic=False, discount=disc_v, vma=vary,
            )
            B_, H_, dA_ = a_means.shape
            a_local = a_flat.reshape(B_, H_, dA_, n_local)
        else:
            sampler = (
                sampling.sample_per_step_t if transposed
                else sampling.sample_per_step
            )
            a_local = jax.vmap(
                lambda k, m, c: sampler(
                    k, m, c, n_local, mode=sampling.INVARIANT, sample_ids=ids
                )
            )(act_keys, a_means, a_covs)
            a_local = jnp.clip(a_local, -1.0, 1.0)

            costs = costs_engine(
                x0s, states.time, states.pos_traj, states.vel_traj,
                a_local, params_b, step_keys, False, discount,
                layout="bhdn" if transposed else "bnhd",
            )

        min_cost = lax.pmin(jnp.min(costs, axis=1), SAMPLE_AXIS)
        unnorm = jnp.exp(-(costs - min_cost[:, None]) / lam)
        norm = lax.psum(jnp.sum(unnorm, axis=1), SAMPLE_AXIS)
        weight = unnorm / norm[:, None]
        mean_spec = "bn,bhdn->bhd" if transposed else "bn,bnhd->bhd"
        mean_w = lax.psum(jnp.einsum(mean_spec, weight, a_local), SAMPLE_AXIS)
        a_means_new = mean_w * gamma_mean + a_means * (1.0 - gamma_mean)
        # covariance centered on the UPDATED mean (reference: mppi.py:119-125)
        def blended(_):
            # identity at the paper's gamma_sigma=0 but re-reads the
            # whole action tensor — skip like reductions.cov_update_t
            # (gamma_sigma is replicated, so the cond + psum stay
            # collective-consistent across shards)
            if transposed:
                dev = a_local - a_means_new[..., None]
                cov_w = lax.psum(
                    jnp.einsum("bn,bhin,bhjn->bhij", weight, dev, dev),
                    SAMPLE_AXIS,
                )
            else:
                dev = a_local - a_means_new[:, None]
                cov_w = lax.psum(
                    jnp.einsum("bn,bnhi,bnhj->bhij", weight, dev, dev),
                    SAMPLE_AXIS,
                )
            return cov_w * gamma_sigma + a_covs * (1.0 - gamma_sigma)

        a_covs_new = lax.cond(gamma_sigma == 0.0, lambda _: a_covs, blended,
                              None)

        actions = a_means_new[:, 0]
        _, states_new, rewards, dones, _ = jax.vmap(env.step)(
            env_keys, states, actions, params_b
        )
        return states_new, a_means_new, a_covs_new, rewards, dones

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
            P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(), P(), P(),
        ),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                   P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        # interpret-mode pallas evaluator vs strict vma: see parallel/sharded.py
        check_vma=not (engine == "pallas" and interpret),
    )
    jitted = jax.jit(sharded)

    def step(states, params_b, a_means, a_covs, keys,
             gamma_mean=1.0, gamma_sigma=0.0, discount=1.0):
        return jitted(states, params_b, a_means, a_covs, keys,
                      jnp.float32(gamma_mean), jnp.float32(gamma_sigma),
                      jnp.float32(discount))

    return step


def make_batched_covo_solve(env, N: int, H: int, lam: float,
                            sample_sigma: float = 0.5,
                            interpret: bool = False, rng: str = "fast",
                            collect_metrics: bool = False,
                            hessian_mode: str = "adjoint"):
    """Scenario-batched CoVO-online solve on ONE device — the per-chip
    building block of the pod configuration (BASELINE config #5: 1024 DR
    scenarios x CoVO-online N=8192, scenarios sharded across chips).

    Batching B scenarios amortizes the solve's SERIAL latency: the
    Hessian's scan steps and the Σ-designer's dependent matmul chain
    become B-batched ops (one launch does B scenarios' work), while the
    fused rollout kernel runs a native (B, lane-tiles) grid
    (ops/rollout_pallas.make_pallas_rollout_batched). Aggregate
    solves/s/chip therefore exceeds B x the single-scenario rate's
    latency-bound fraction — measured with ``bench.py --scenarios B``.

    Returns ``solve(x0s (B,16), t0s (B,), pos_trajs (B,T,3), vel_trajs,
    a_means (B,H,dA), params_b (leaves batched on axis 0), key,
    gamma_mean=1.0, discount=1.0) -> (a_means_new (B,H,dA),
    min_costs (B,))`` — the γ-blended mean update and discounted costs of
    the single-chip solver (B=1 equality-pinned at γ<1 in
    tests/test_sharding.py; CoVO has no sample-covariance update to
    thread — Σ is re-designed from the Hessian each step, reference:
    covo.py:269-275). RNG: per-scenario
    ``fold_in(key, b)`` streams (scenario-count invariant), fast sampler;
    ``rng="kernel"`` draws inside the rollout kernel instead (TPU hardware
    PRNG + in-kernel F z contraction — a different stream, quality-gated
    like the single-chip kernel mode, DESIGN.md §2).
    """
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.hessian import make_hessian_adjoint
    from covo_mpc_tpu.ops.rollout_pallas import (
        make_pallas_rollout_batched,
        make_pallas_rollout_batched_sampling,
    )

    if rng not in ("fast", "kernel"):
        # "invariant" is a sharded-core mode; the batched single-chip
        # solves draw per-scenario fold_in streams ("fast") or in-kernel
        # ("kernel") — anything else used to FALL THROUGH to fast
        # silently, mis-attributing results (r5 review finding)
        raise ValueError(f"batched solve supports rng='fast'/'kernel', "
                         f"got {rng!r}")
    dA = env.action_dim
    D = H * dA
    if hessian_mode not in ("adjoint", "gn"):
        raise ValueError(f"batched covo supports 'adjoint'/'gn', "
                         f"got {hessian_mode!r}")
    # scan primal: the B-wide vmap amortizes its launches, and the Pallas
    # primal kernel cannot vmap over SMEM operands (see solvers/covo.py).
    # "gn" = Gauss-Newton curvature (quality-gated: RESULTS.md speed-mode
    # rows)
    hess = make_hessian_adjoint(env, H, primal="scan",
                                second_order=hessian_mode == "adjoint")
    rollout_b = make_pallas_rollout_batched(env, interpret=interpret,
                                            fast_keys=True)
    sampler_b = (
        make_pallas_rollout_batched_sampling(env, interpret=interpret,
                                             joint=True,
                                             fast_keys=True)
        if rng == "kernel" else None
    )

    def solve(x0s, t0s, pos_trajs, vel_trajs, a_means, params_b, key,
              gamma_mean=1.0, discount=1.0):
        B = a_means.shape[0]
        # receding-horizon shift of the mean only (reference: covo.py:201-203)
        a_means = jnp.concatenate([a_means[:, 1:], a_means[:, -1:]], axis=1)

        from covo_mpc_tpu.utils.keys import fold_in_batch

        keys = fold_in_batch(key, jnp.arange(B))
        hess_keys = jax.vmap(lambda k: jax.random.split(k, 3)[0])(keys)
        act_keys = jax.vmap(lambda k: jax.random.split(k, 3)[1])(keys)
        step_keys = jax.vmap(lambda k: jax.random.split(k, 3)[2])(keys)

        R = jax.vmap(
            lambda a, x, t, pt, vt, p, k: hess(a.flatten(), x, t, pt, vt, p, k)
        )(a_means, x0s, t0s, pos_trajs, vel_trajs, params_b, hess_keys)
        _, factors = jax.vmap(
            lambda r: covariance.optimize_sigma_ns(r, sample_sigma, D)
        )(R)

        if sampler_b is not None:
            # fused sample+rollout: the per-scenario joint draw happens
            # in-kernel; fold_in(key, B) is outside the 0..B-1 scenario
            # stream range
            costs, a_t = sampler_b(
                x0s, t0s, pos_trajs, vel_trajs, a_means, factors, params_b,
                step_keys, jax.random.fold_in(key, B), N,
                deterministic=True, discount=discount,
            )
        else:
            # sample directly in the kernel's (B, D, N) layout — same
            # draws, the MXU contracts factor @ z.T, no per-scenario
            # transpose
            z = jax.vmap(lambda k: jax.random.normal(k, (N, D)))(act_keys)
            a_t = jnp.clip(
                a_means.reshape(B, D, 1)
                + jnp.einsum("bed,bnd->ben", factors, z),
                -1.0, 1.0,
            )
            costs = rollout_b(
                x0s, t0s, pos_trajs, vel_trajs, a_t, params_b, step_keys,
                deterministic=True, discount=discount, layout="bhdn",
            )
        weights = jax.vmap(lambda c: reductions.mppi_weights(c, lam))(costs)
        a_means_new = jax.vmap(
            lambda w, a, m: reductions.mean_update_t(
                w, a.reshape(H, dA, -1), m, gamma_mean
            )
        )(weights, a_t, a_means)
        if collect_metrics:
            # per-scenario health records (SURVEY §5 metrics row on the
            # batched path; single-chip counterpart: solvers/covo.py)
            from covo_mpc_tpu.runtime.metrics import (
                sigma_metrics,
                solve_metrics_sharded,
            )

            metrics = jax.vmap(
                lambda c, w: solve_metrics_sharded(c, w, None, N)
            )(costs, weights)
            sig = jax.vmap(
                lambda f: sigma_metrics(f @ f.T)
            )(factors)
            return a_means_new, jnp.min(costs, axis=1), {**metrics, **sig}
        return a_means_new, jnp.min(costs, axis=1)

    return jax.jit(solve)


def make_batched_mppi_solve(env, N: int, H: int, lam: float,
                            interpret: bool = False, rng: str = "fast",
                            collect_metrics: bool = False):
    """Scenario-batched MPPI solve on ONE device — the MPPI counterpart of
    :func:`make_batched_covo_solve` (B domain-randomized episodes amortize
    the solve's serial latency; the fused batched rollout kernel runs a
    native (B, lane-tiles) grid).

    Returns ``solve(x0s (B,16), t0s, pos_trajs, vel_trajs, a_means
    (B,H,dA), a_covs (B,H,dA,dA), params_b, key, gamma_mean=1.0,
    gamma_sigma=0.0, discount=1.0) -> (a_means_new, a_covs_new,
    min_costs)`` — the single-chip γ-blended mean AND covariance updates
    (reference: mppi.py:114-126; B=1 equality-pinned at γ_σ>0 in
    tests/test_sharding.py). RNG: per-scenario ``fold_in(key, b)``
    streams, fast sampler; ``rng="kernel"`` draws in-kernel (per-step
    Cholesky FMAs on the TPU hardware PRNG, DESIGN.md §2).
    """
    from covo_mpc_tpu.ops.rollout_pallas import (
        make_pallas_rollout_batched,
        make_pallas_rollout_batched_sampling,
    )
    from covo_mpc_tpu.utils.keys import fold_in_batch

    if rng not in ("fast", "kernel"):
        # "invariant" is a sharded-core mode; the batched single-chip
        # solves draw per-scenario fold_in streams ("fast") or in-kernel
        # ("kernel") — anything else used to FALL THROUGH to fast
        # silently, mis-attributing results (r5 review finding)
        raise ValueError(f"batched solve supports rng='fast'/'kernel', "
                         f"got {rng!r}")
    dA = env.action_dim
    rollout_b = make_pallas_rollout_batched(env, interpret=interpret,
                                            fast_keys=True)
    sampler_b = (
        make_pallas_rollout_batched_sampling(env, interpret=interpret,
                                             joint=False,
                                             fast_keys=True)
        if rng == "kernel" else None
    )

    def solve(x0s, t0s, pos_trajs, vel_trajs, a_means, a_covs, params_b, key,
              gamma_mean=1.0, gamma_sigma=0.0, discount=1.0):
        B = a_means.shape[0]
        # receding-horizon shift of mean AND cov (reference: mppi.py:43-49)
        a_means = jnp.concatenate([a_means[:, 1:], a_means[:, -1:]], axis=1)
        a_covs = jnp.concatenate([a_covs[:, 1:], a_covs[:, -1:]], axis=1)

        keys = fold_in_batch(key, jnp.arange(B))
        act_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        step_keys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)

        if sampler_b is not None:
            # fused sample+rollout: per-scenario per-step draws in-kernel
            chols = jnp.linalg.cholesky(a_covs)
            costs, a_flat = sampler_b(
                x0s, t0s, pos_trajs, vel_trajs, a_means, chols, params_b,
                step_keys, jax.random.fold_in(key, B), N,
                deterministic=False, discount=discount,
            )
            a_t = a_flat.reshape(B, a_means.shape[1], dA, N)
        else:
            # kernel-layout sampling (see make_batched_covo_solve)
            a_t = jax.vmap(
                lambda k, m, c: sampling.sample_per_step_t(
                    k, m, c, N, mode=sampling.FAST)
            )(act_keys, a_means, a_covs)
            a_t = jnp.clip(a_t, -1.0, 1.0)
            costs = rollout_b(
                x0s, t0s, pos_trajs, vel_trajs, a_t, params_b, step_keys,
                deterministic=False, discount=discount, layout="bhdn",
            )
        weights = jax.vmap(lambda c: reductions.mppi_weights(c, lam))(costs)
        a_means_new = jax.vmap(
            lambda w, a, m: reductions.mean_update_t(w, a, m, gamma_mean)
        )(weights, a_t, a_means)
        a_covs_new = jax.vmap(
            lambda w, a, m, c: reductions.cov_update_t(w, a, m, c, gamma_sigma)
        )(weights, a_t, a_means_new, a_covs)
        if collect_metrics:
            from covo_mpc_tpu.runtime.metrics import solve_metrics_sharded

            metrics = jax.vmap(
                lambda c, w: solve_metrics_sharded(c, w, None, N)
            )(costs, weights)
            return a_means_new, a_covs_new, jnp.min(costs, axis=1), metrics
        return a_means_new, a_covs_new, jnp.min(costs, axis=1)

    return jax.jit(solve)


def make_multichip_covo_step(env, mesh, N: int, H: int, lam: float,
                             sample_sigma: float = 0.5,
                             engine: str = "jnp",
                             interpret: bool = False,
                             rng: str = "invariant",
                             hessian_mode: str = "adjoint"):
    """Distributed CoVO-online control step — BASELINE config #5 proper:
    scenario axis = pure data parallelism (DR episodes), sample axis =
    sharded rollouts with pmin/psum reductions.

    Per scenario and step: receding-horizon mean shift, adjoint Hessian +
    Newton-Schulz Σ design (O(D²), independent of N — replicated across
    the sample shards rather than communicated), sharding-invariant joint
    sampling, local rollouts, three collectives (pmin + 2 psum), and the
    auto-resetting environment step. ``engine="pallas"`` runs the fused
    batched rollout kernel per shard (the flagship per-chip rate);
    CoVO updates the mean only — Σ is re-designed from the Hessian every
    step, never from samples (reference: covo.py:269-275), so there is no
    covariance-update path to thread here. ``rng="kernel"`` (pallas only)
    draws the joint MVN inside the per-shard kernel on disjoint TPU-PRNG
    streams — fastest, forfeits mesh-shape invariance (DESIGN.md §2).

    Returns ``step(states, params, a_means, keys, gamma_mean=1.0,
    discount=1.0) -> (states', a_means', rewards, dones)``, everything
    batched over scenarios on axis 0 and sharded over SCENARIO_AXIS.
    """
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.hessian import make_hessian_adjoint

    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    if N % n_sample_shards:
        raise ValueError(f"N={N} not divisible by {n_sample_shards}")
    n_local = N // n_sample_shards
    if rng == "kernel":
        if engine != "pallas":
            raise ValueError("rng='kernel' requires engine='pallas'")
        from covo_mpc_tpu.ops.rollout_pallas import (
            make_pallas_rollout_batched_sampling,
        )

        fused = make_pallas_rollout_batched_sampling(
            env, interpret=interpret, joint=True, fast_keys=True
        )
    else:
        fused = None
    costs_engine = _make_batched_cost_engine(env, engine, interpret)
    # see make_multichip_control_step: kernel-layout sampling on the fast path
    transposed = engine == "pallas"
    if hessian_mode not in ("adjoint", "gn"):
        raise ValueError(f"multichip covo supports 'adjoint'/'gn', "
                         f"got {hessian_mode!r}")
    # scan primal: the local scenario batch vmaps the Hessian, and the
    # Pallas primal kernel cannot vmap over SMEM operands (solvers/covo.py)
    hess = make_hessian_adjoint(env, H, primal="scan",
                                second_order=hessian_mode == "adjoint")
    dA = env.action_dim
    D = H * dA

    def local_step(states, params_b, a_means, keys, gamma_mean, discount):
        # shift the mean only (reference: covo.py:201-203)
        a_means = jnp.concatenate([a_means[:, 1:], a_means[:, -1:]], axis=1)
        split = jax.vmap(lambda k: jax.random.split(k, 5))(keys)
        hess_keys, act_keys = split[:, 1], split[:, 2]
        step_keys, env_keys = split[:, 3], split[:, 4]

        x0s = jax.vmap(pack_state)(states)
        means_flat = a_means.reshape(a_means.shape[0], D)
        R = jax.vmap(
            lambda m, x, s, p, k: hess(m, x, s.time, s.pos_traj, s.vel_traj,
                                       p, k)
        )(means_flat, x0s, states, params_b, hess_keys)
        _, factors = jax.vmap(
            lambda r: covariance.optimize_sigma_ns(r, sample_sigma, D)
        )(R)

        shard = lax.axis_index(SAMPLE_AXIS)
        ids = shard * n_local + jnp.arange(n_local)
        B = a_means.shape[0]
        if fused is not None:
            # fused joint sample+rollout per shard (see
            # make_multichip_control_step for the stream layout)
            kb = jax.random.fold_in(act_keys[0], shard)
            vary = tuple(getattr(jax.typeof(kb), "vma", frozenset()))
            x0s_v, t_v, pt_v, vt_v, m_v, f_v, p_v, sk_v, disc_v = (
                jax.tree.map(
                    lambda x: pvary(x, vary),
                    (x0s, states.time, states.pos_traj, states.vel_traj,
                     a_means, factors, params_b, step_keys, discount),
                )
            )
            costs, a_local = fused(  # a_local: (B, D, n_local)
                x0s_v, t_v, pt_v, vt_v, m_v, f_v, p_v, sk_v, kb, n_local,
                deterministic=True, discount=disc_v, vma=vary,
            )
        elif transposed:
            a_local = jnp.clip(  # (B, D, n_local), kernel layout
                jax.vmap(
                    lambda k, m, f: sampling.sample_joint_t(
                        k, m, f, n_local,
                        mode=sampling.INVARIANT, sample_ids=ids,
                    )
                )(act_keys, means_flat, factors),
                -1.0, 1.0,
            )
        else:
            a_flat = jax.vmap(
                lambda k, m, f: sampling.sample_joint(
                    k, m, f, n_local, mode=sampling.INVARIANT, sample_ids=ids
                )
            )(act_keys, means_flat, factors)
            a_local = jnp.clip(a_flat.reshape(B, n_local, H, dA), -1.0, 1.0)

        if fused is None:
            costs = costs_engine(
                x0s, states.time, states.pos_traj, states.vel_traj,
                a_local, params_b, step_keys, True, discount,
                layout="bhdn" if transposed else "bnhd",
            )

        min_cost = lax.pmin(jnp.min(costs, axis=1), SAMPLE_AXIS)
        unnorm = jnp.exp(-(costs - min_cost[:, None]) / lam)
        norm = lax.psum(jnp.sum(unnorm, axis=1), SAMPLE_AXIS)
        weight = unnorm / norm[:, None]
        if transposed:
            mean_w = lax.psum(
                jnp.einsum("bn,bdn->bd", weight, a_local), SAMPLE_AXIS
            ).reshape(B, H, dA)
        else:
            mean_w = lax.psum(
                jnp.einsum("bn,bnhd->bhd", weight, a_local), SAMPLE_AXIS
            )
        a_means_new = mean_w * gamma_mean + a_means * (1.0 - gamma_mean)

        actions = a_means_new[:, 0]
        _, states_new, rewards, dones, _ = jax.vmap(env.step)(
            env_keys, states, actions, params_b
        )
        return states_new, a_means_new, rewards, dones

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                  P(SCENARIO_AXIS), P(), P()),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS),
                   P(SCENARIO_AXIS)),
        # interpret-mode pallas evaluator vs strict vma: see parallel/sharded.py
        check_vma=not (engine == "pallas" and interpret),
    )
    jitted = jax.jit(sharded)

    def step(states, params_b, a_means, keys, gamma_mean=1.0, discount=1.0):
        return jitted(states, params_b, a_means, keys,
                      jnp.float32(gamma_mean), jnp.float32(discount))

    return step

"""Sharded MPC solve cores: shard_map over the sample axis.

Strategy (SURVEY.md §2 parallelism table): the N-sample axis — the only
axis with cross-element reductions — is split across the mesh. Each shard

  1. draws its own action samples with GLOBAL-index keys
     (ops/sampling.py INVARIANT mode), so results are identical at any
     mesh shape,
  2. rolls out its N/k samples locally (zero communication),
  3. participates in three tiny collectives: pmin (min cost), psum
     (softmax normalizer), psum (weighted action mean, H·dA floats).

The communicated payload per solve is ~H·dA + 2 floats — the design keeps
the O(N·H) work local and moves only the sufficient statistics, so scaling
efficiency is limited only by collective latency.

All inputs/outputs of the wrapped fns are replicated; parallelism is
internal (each shard materializes its own slice of the sample axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from covo_mpc_tpu.ops import reductions, sampling
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.parallel.mesh import SAMPLE_AXIS
from covo_mpc_tpu.utils.vma import pvary


def _replicated_specs(tree):
    return jax.tree.map(lambda _: P(), tree)


PALLAS_TILE = 1024  # per-shard sample-count granularity of the fused kernel


def make_cost_engine(env, engine: str, interpret: bool = False):
    """Uniform costs-only rollout callable for the sharded solve cores.

    ``engine="pallas"`` runs the fused Pallas rollout kernel PER SHARD —
    the TPU-native execution SURVEY.md §2's parallelism table prescribes
    (vs the reference's vmap, quadjax/controllers/mppi.py:73-75) — so a
    multi-chip solve sustains the single-chip flagship rate per chip
    instead of the ~3x slower jnp path. Ragged/small per-shard sample
    counts are tile-padded by the kernel (each shard computes at least
    one full 1024-sample tile); ``interpret=True`` runs the kernel in
    interpret mode for CPU-mesh tests.

    Returns ``costs_fn(x0, t0, pos_traj, vel_traj, actions, params,
    step_key, deterministic, discount, vary_axes) -> costs (n_local,)``.
    """
    if engine == "jnp":
        # every distributed rng mode is non-parity (invariant/fast/kernel),
        # so the rollouts use the fast disturbance key chain — same
        # stream as the single-chip fast path (r5 review finding: the
        # builders previously defaulted to the parity chain, so
        # sharded stochastic rollouts drew different disturbances than
        # the single-chip solvers at the same keys)
        rollout = make_rollout(env, fast_keys=True)

        def costs_fn(x0, t0, pos_traj, vel_traj, actions, params, step_key,
                     deterministic, discount, vary_axes, layout="nhd"):
            assert layout == "nhd", "jnp engine takes (N, H, dA) actions"
            costs, _ = rollout(
                x0, t0, pos_traj, vel_traj, actions, params, step_key,
                deterministic=deterministic, discount=discount,
                collect_poses=False, vary_axes=vary_axes,
            )
            return costs

    elif engine == "pallas":
        from covo_mpc_tpu.ops.rollout_pallas import make_pallas_rollout

        # ragged per-shard sample counts are tile-padded by the kernel;
        # below PALLAS_TILE samples per shard each shard still computes a
        # full 1024-sample tile, so prefer fewer shards at tiny N
        rollout = make_pallas_rollout(env, interpret=interpret,
                                      fast_keys=True)

        def costs_fn(x0, t0, pos_traj, vel_traj, actions, params, step_key,
                     deterministic, discount, vary_axes, layout="nhd"):
            # shard_map tracks varying-manual-axes per value; the sampled
            # actions are varying over the mesh axes while the broadcast
            # state/tables are not — promote so the kernel sees one vma.
            # (Under check_vma=False — the interpret-mode tests — vma is
            # empty and this is a no-op.)
            vary = tuple(getattr(jax.typeof(actions), "vma", frozenset()))
            args = jax.tree.map(
                lambda x: pvary(x, vary),
                (x0, t0, pos_traj, vel_traj, params, step_key, discount),
            )
            x0, t0, pos_traj, vel_traj, params, step_key, discount = args
            costs, _ = rollout(
                x0, t0, pos_traj, vel_traj, actions, params, step_key,
                deterministic=deterministic, discount=discount, vma=vary,
                layout=layout,
            )
            return costs

    else:
        raise ValueError(f"unknown engine {engine!r}")
    return costs_fn


def make_sharded_mppi_solve(env, mesh, N: int, H: int, lam: float,
                            axis: str = SAMPLE_AXIS, engine: str = "jnp",
                            interpret: bool = False,
                            rng: str = "invariant",
                            collect_metrics: bool = False):
    """Sharded MPPI sample→rollout→reduce→update core.

    Returns ``solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov, gammas,
    discount, params, act_key, step_key) -> (a_mean_new, a_cov_new,
    min_cost)`` with every argument and result replicated across ``axis``.
    ``engine="pallas"`` runs the fused rollout kernel per shard. ``rng``:
    see :func:`make_sharded_covo_sample_rollout` ("kernel" draws in-kernel
    per shard; trades resharding invariance for throughput).
    ``collect_metrics`` appends a dict of per-solve health scalars (ESS,
    cost min/mean/max — psum'd sufficient statistics, SURVEY §5 metrics
    row) to the result tuple.
    """
    n_shards = mesh.shape[axis]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by {n_shards} shards")
    n_local = N // n_shards
    if rng == "kernel":
        if engine != "pallas":
            raise ValueError("rng='kernel' requires engine='pallas'")
        from covo_mpc_tpu.ops.rollout_pallas import (
            make_pallas_rollout_sampling,
        )

        fused = make_pallas_rollout_sampling(env, interpret=interpret,
                                             fast_keys=True)
    else:
        fused = None
    rollout = make_cost_engine(env, engine, interpret)
    # the fused kernel consumes actions sample-axis-last; sampling directly
    # in that layout skips the per-shard action transpose (same draws —
    # ops/sampling.sample_per_step_t), matching the single-chip fast path
    transposed = engine == "pallas"

    def local_solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov,
                    gamma_mean, gamma_sigma, discount, params,
                    act_key, step_key):
        shard = lax.axis_index(axis)
        ids = shard * n_local + jnp.arange(n_local)
        if fused is not None:
            # fused sample+rollout per shard (see the covo core above)
            shard_key = jax.random.fold_in(act_key, shard)
            vary = tuple(getattr(jax.typeof(shard_key), "vma", frozenset()))
            x0_v, t0_v, pt_v, vt_v, mean_v, chol_v, params_v, sk_v = (
                jax.tree.map(
                    lambda x: pvary(x, vary),
                    (x0, t0, pos_traj, vel_traj, a_mean,
                     jnp.linalg.cholesky(a_cov), params, step_key),
                )
            )
            costs, a_flat = fused(
                x0_v, t0_v, pt_v, vt_v, mean_v, chol_v, params_v, sk_v,
                shard_key, n_local, deterministic=False,
                discount=pvary(discount, vary), vma=vary,
            )
            a_local = a_flat.reshape(a_mean.shape[0], -1, n_local)
        else:
            sampler = (
                sampling.sample_per_step_t if transposed
                else sampling.sample_per_step
            )
            a_local = sampler(
                act_key, a_mean, a_cov, n_local,
                mode=sampling.INVARIANT, sample_ids=ids,
            )
            a_local = jnp.clip(a_local, -1.0, 1.0)

            costs = rollout(
                x0, t0, pos_traj, vel_traj, a_local, params, step_key,
                False, discount, (axis,),
                layout="hdn" if transposed else "nhd",
            )

        min_cost = lax.pmin(jnp.min(costs), axis)
        unnorm, local_norm = reductions.weights_from_stats(costs, min_cost, lam)
        weight = unnorm / lax.psum(local_norm, axis)

        mean_spec = "n,hdn->hd" if transposed else "n,nhd->hd"
        mean_local = jnp.einsum(mean_spec, weight, a_local)
        a_mean_new = lax.psum(mean_local, axis) * gamma_mean + a_mean * (
            1.0 - gamma_mean
        )
        def blended(_):
            # the blend re-reads the whole local action tensor; at the
            # paper's gamma_sigma=0 it is an identity, so skip it like
            # reductions.cov_update_t does on the single-chip path
            # (measured 0.086 -> 0.074 ms there). gamma_sigma is
            # replicated, so every shard takes the same cond branch and
            # the psum stays collective-consistent.
            if transposed:
                dev = a_local - a_mean_new[..., None]
                cov_local = jnp.einsum("n,hin,hjn->hij", weight, dev, dev)
            else:
                dev = a_local - a_mean_new[None]
                cov_local = jnp.einsum("n,nhi,nhj->hij", weight, dev, dev)
            return lax.psum(cov_local, axis) * gamma_sigma + a_cov * (
                1.0 - gamma_sigma
            )

        a_cov_new = lax.cond(gamma_sigma == 0.0, lambda _: a_cov, blended,
                             None)
        if collect_metrics:
            from covo_mpc_tpu.runtime.metrics import solve_metrics_sharded

            metrics = solve_metrics_sharded(costs, weight, axis, N)
            return a_mean_new, a_cov_new, min_cost, metrics
        return a_mean_new, a_cov_new, min_cost

    def solve(x0, t0, pos_traj, vel_traj, a_mean, a_cov,
              gamma_mean, gamma_sigma, discount, params, act_key, step_key):
        args = (x0, t0, pos_traj, vel_traj, a_mean, a_cov,
                gamma_mean, gamma_sigma, discount, params, act_key, step_key)
        out_specs = (P(), P(), P())
        if collect_metrics:
            out_specs = out_specs + (
                {k: P() for k in ("cost_min", "cost_mean", "cost_max", "ess")},
            )
        return jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=_replicated_specs(args),
            out_specs=out_specs,
            # the interpret-mode pallas evaluator mixes its own unvarying
            # loop indices with varying blocks and trips strict vma checking
            # (jax suggests this exact workaround); the compiled TPU path
            # keeps the check
            check_vma=not (engine == "pallas" and interpret),
        )(*args)

    return solve


def make_covo_local_core(env, H: int, lam: float, engine: str = "jnp",
                         interpret: bool = False, rng: str = "invariant",
                         collect_metrics: bool = False):
    """One shard's CoVO sample→rollout→reduce→update body — the single
    definition consumed by :func:`make_sharded_covo_sample_rollout`
    (collectives over a sample axis) and the pipeline's act stage
    (:mod:`covo_mpc_tpu.parallel.pipeline`, no sample sharding).

    Returns ``local(x0, t0, pos_traj, vel_traj, mean_flat, factor,
    gamma_mean, discount, params, act_key, step_key, *, n_local, ids,
    shard_key, vary, axis=None) -> (a_mean_new (H, dA), min_cost)`` where

      * ``ids`` are this shard's GLOBAL sample indices (invariant sampler),
      * ``shard_key`` seeds the in-kernel draw (``rng="kernel"``),
      * ``vary`` are the mesh axes the per-device values vary over
        (promotions for check_vma; empty off-shard_map / in interpret),
      * ``axis`` is the collective axis — ``None`` reduces locally (the
        whole sample batch lives on this device).
    """
    if rng == "kernel":
        if engine != "pallas":
            raise ValueError("rng='kernel' requires engine='pallas'")
        from covo_mpc_tpu.ops.rollout_pallas import (
            make_pallas_rollout_joint_sampling,
        )

        fused = make_pallas_rollout_joint_sampling(
            env, interpret=interpret, fast_keys=True
        )
    else:
        fused = None
    rollout = make_cost_engine(env, engine, interpret)
    dA = env.action_dim
    # kernel-layout sampling on the fast path (see make_sharded_mppi_solve)
    transposed = engine == "pallas"

    def local(x0, t0, pos_traj, vel_traj, mean_flat, factor,
              gamma_mean, discount, params, act_key, step_key, *,
              n_local, ids, shard_key, vary, axis=None):
        H_ = mean_flat.shape[0] // dA
        if fused is not None:
            # fused sample+rollout: promote the replicated inputs to the
            # vma the outputs carry (see make_cost_engine)
            x0_v, t0_v, pt_v, vt_v, mean_v, fac_v, params_v, sk_v = (
                jax.tree.map(
                    lambda x: pvary(x, vary),
                    (x0, t0, pos_traj, vel_traj, mean_flat, factor, params,
                     step_key),
                )
            )
            costs, a_local = fused(
                x0_v, t0_v, pt_v, vt_v, mean_v.reshape(H_, dA), fac_v,
                params_v, sk_v, shard_key, n_local,
                deterministic=True, discount=pvary(discount, vary), vma=vary,
            )
        else:
            if transposed:
                a_local = jnp.clip(  # (D, n_local), kernel layout
                    sampling.sample_joint_t(
                        act_key, mean_flat, factor, n_local,
                        mode=sampling.INVARIANT, sample_ids=ids,
                    ),
                    -1.0, 1.0,
                )
            else:
                a_flat = sampling.sample_joint(
                    act_key, mean_flat, factor, n_local,
                    mode=sampling.INVARIANT, sample_ids=ids,
                )
                a_local = jnp.clip(a_flat.reshape(n_local, H_, dA), -1.0, 1.0)
            # when ids carry no axis_index dependence (pipeline act stage)
            # the samples come out unvarying — promote so the pallas
            # engine declares the vma check_vma demands
            a_local = pvary(a_local, vary)
            costs = rollout(
                x0, t0, pos_traj, vel_traj, a_local, params, step_key,
                True, discount, vary,
                layout="hdn" if transposed else "nhd",
            )

        local_min = jnp.min(costs)
        min_cost = lax.pmin(local_min, axis) if axis else local_min
        unnorm, local_norm = reductions.weights_from_stats(costs, min_cost, lam)
        norm = lax.psum(local_norm, axis) if axis else local_norm
        weight = unnorm / norm

        if transposed:
            mean_local = jnp.einsum("n,dn->d", weight, a_local).reshape(H_, dA)
        else:
            mean_local = jnp.einsum("n,nhd->hd", weight, a_local)
        mean_total = lax.psum(mean_local, axis) if axis else mean_local
        a_mean_new = mean_total * gamma_mean + mean_flat.reshape(
            H_, dA
        ) * (1.0 - gamma_mean)
        if collect_metrics:
            from covo_mpc_tpu.runtime.metrics import solve_metrics_sharded

            n_total = n_local * (
                lax.psum(1, axis) if axis else 1
            )
            metrics = solve_metrics_sharded(costs, weight, axis, n_total)
            return a_mean_new, min_cost, metrics
        return a_mean_new, min_cost

    return local


def make_sharded_covo_sample_rollout(env, mesh, N: int, H: int, lam: float,
                                     axis: str = SAMPLE_AXIS,
                                     engine: str = "jnp",
                                     interpret: bool = False,
                                     rng: str = "invariant",
                                     collect_metrics: bool = False):
    """Sharded CoVO sample→rollout→reduce core.

    Σ design (Hessian + eigh) is O(D²) and independent of N, so it runs
    replicated OUTSIDE this core; only the N-dependent work is sharded.
    ``factor`` is any square root of Σ. ``engine="pallas"`` runs the fused
    rollout kernel per shard (the flagship per-chip path).

    ``rng``: "invariant" (default) draws with global-sample-id keys —
    bit-identical results at ANY mesh shape; "kernel" (pallas only) draws
    inside the per-shard rollout kernel on shard-folded TPU-PRNG streams
    (DESIGN.md §2) — fastest, but resharding changes the draws, so it
    trades the invariance guarantee for the single-chip kernel path's
    throughput.

    Returns ``solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
    gamma_mean, discount, params, act_key, step_key) -> (a_mean_new (H, dA),
    min_cost)``, all replicated; ``collect_metrics`` appends a dict of
    psum'd per-solve health scalars (SURVEY §5 metrics row).
    """
    n_shards = mesh.shape[axis]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by {n_shards} shards")
    n_local = N // n_shards
    core = make_covo_local_core(env, H, lam, engine=engine,
                                interpret=interpret, rng=rng,
                                collect_metrics=collect_metrics)

    def local_solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
                    gamma_mean, discount, params, act_key, step_key):
        shard = lax.axis_index(axis)
        ids = shard * n_local + jnp.arange(n_local)
        # disjoint in-kernel streams via the shard-folded key; its vma is
        # the shard-varying set every per-device value carries
        shard_key = jax.random.fold_in(act_key, shard)
        vary = tuple(getattr(jax.typeof(shard_key), "vma", frozenset()))
        return core(
            x0, t0, pos_traj, vel_traj, mean_flat, factor,
            gamma_mean, discount, params, act_key, step_key,
            n_local=n_local, ids=ids, shard_key=shard_key, vary=vary,
            axis=axis,
        )

    def solve(x0, t0, pos_traj, vel_traj, mean_flat, factor,
              gamma_mean, discount, params, act_key, step_key):
        args = (x0, t0, pos_traj, vel_traj, mean_flat, factor,
                gamma_mean, discount, params, act_key, step_key)
        out_specs = (P(), P())
        if collect_metrics:
            out_specs = out_specs + (
                {k: P() for k in ("cost_min", "cost_mean", "cost_max", "ess")},
            )
        return jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=_replicated_specs(args),
            out_specs=out_specs,
            # see make_sharded_mppi_solve: interpret-mode vma workaround
            check_vma=not (engine == "pallas" and interpret),
        )(*args)

    return solve


def make_distributed_covo_solve(env, mesh, N: int, H: int, lam: float,
                                sample_sigma: float = 0.5,
                                axis: str = SAMPLE_AXIS,
                                engine: str = "jnp",
                                interpret: bool = False,
                                hessian_primal: str | None = None,
                                rng: str = "invariant",
                                collect_metrics: bool = False,
                                hessian_mode: str = "adjoint"):
    """Full distributed CoVO-online solve: replicated Σ design + sharded
    sample/rollout/reduce — the flagship configuration spread over a mesh.

    Composition mirrors the single-chip fast path (solvers/covo.py with
    hessian_mode="adjoint", sigma_mode="ns", rng_mode="invariant"): the
    adjoint Hessian and Newton-Schulz Σ-designer are O(D²) and independent
    of N, so every shard computes them redundantly (cheaper than
    communicating Σ); only the O(N·H) sampling/rollout work is sharded.
    The RNG chain matches the single-chip solver, and the invariant
    sampler uses global sample ids — so on a 1-shard mesh this returns
    EXACTLY the single-chip solver's update (pinned in
    tests/test_sharding.py), and results are identical at any shard count.
    ``rng="kernel"`` (pallas only) instead draws inside the per-shard
    kernel — fastest, but forfeits both guarantees (see
    :func:`make_sharded_covo_sample_rollout`).

    Returns ``solve(x0, t0, pos_traj, vel_traj, a_mean (H, dA), params,
    rng, gamma_mean=1.0, discount=1.0) -> (a_mean_new (H, dA),
    min_cost)``, all replicated. ``collect_metrics`` appends a dict of
    per-solve health scalars: ESS + cost min/mean/max assembled from
    psum'd shard partials inside the core, plus Σ conditioning computed
    once on the replicated designer output (SURVEY §5 metrics row;
    single-chip counterpart: solvers/covo.py collect_metrics).
    """
    from covo_mpc_tpu.ops import covariance
    from covo_mpc_tpu.ops.hessian import make_hessian_adjoint

    core = make_sharded_covo_sample_rollout(
        env, mesh, N, H, lam, axis=axis, engine=engine, interpret=interpret,
        rng=rng, collect_metrics=collect_metrics,
    )
    # in-kernel primal pairs with the fused rollout engine (solvers/covo.py)
    primal = hessian_primal or (
        "pallas_interpret" if engine == "pallas" and interpret
        else "pallas" if engine == "pallas"
        else "scan"
    )
    if hessian_mode not in ("adjoint", "gn"):
        raise ValueError(f"distributed covo supports 'adjoint'/'gn', "
                         f"got {hessian_mode!r}")
    # "gn" = Gauss-Newton curvature (quality-gated: RESULTS.md speed-mode
    # rows — 3.53 cm gn+krng vs the 6.81 cm MPPI anchor); fused tail
    # pairs with the kernel primal exactly like CoVOSolver (it also
    # replaces the bf16-truncated XLA pullback matmuls with
    # HIGHEST-precision in-kernel dots)
    tail = primal if primal != "scan" else "xla"
    hess = make_hessian_adjoint(env, H, primal=primal, tail=tail,
                                second_order=hessian_mode == "adjoint")
    D = H * env.action_dim

    def solve(x0, t0, pos_traj, vel_traj, a_mean, params, rng,
              gamma_mean=1.0, discount=1.0):
        # shift the mean only (reference: covo.py:201-203); key chain
        # matches CoVOSolver.__call__
        a_mean = jnp.concatenate([a_mean[1:], a_mean[-1:]])
        R = hess(a_mean.flatten(), x0, t0, pos_traj, vel_traj, params, rng)
        a_cov, factor = covariance.optimize_sigma_ns(R, sample_sigma, D)
        rng, act_key = jax.random.split(rng)
        rng, step_key = jax.random.split(rng)
        out = core(
            x0, t0, pos_traj, vel_traj, a_mean.flatten(), factor,
            gamma_mean, discount, params, act_key, step_key,
        )
        if collect_metrics:
            from covo_mpc_tpu.runtime.metrics import sigma_metrics

            a_mean_new, min_cost, metrics = out
            # Σ health computed once on the replicated designer output —
            # O(D^2) like the design itself, no extra communication
            return a_mean_new, min_cost, {**metrics, **sigma_metrics(a_cov)}
        return out

    return solve

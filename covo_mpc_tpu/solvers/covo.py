"""CoVO-MPC: covariance-optimal sampling-based MPC (online and offline).

Algorithm per the reference (reference: quadjax/controllers/covo.py:13-283)
and the L4DC'24 paper (arXiv:2401.07369): before each solve, estimate the
Hessian R of the H-step cumulative cost around the nominal action sequence
and sample from the full (H·dA)-dimensional joint Gaussian with
Σ ∝ R^{-1/2} at fixed determinant.

TPU-native execution:
  * Hessian: batched-JVP estimators over a scan rollout (ops/covariance.py),
    with a fwd-over-rev mode that is ~D× cheaper than the reference's
    fwd-over-fwd.
  * Σ-designer returns an eigen square root; fast-mode sampling skips the
    Cholesky and is a single (N, D) @ (D, D) MXU matmul.
  * Offline mode precomputes the 300-step Σ schedule with one scan
    (reference: covo.py:44-112).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from covo_mpc_tpu.models.structs import pack_state
from covo_mpc_tpu.ops import covariance, reductions, sampling
from covo_mpc_tpu.ops.rollout import make_hessian_cost, make_rollout
from covo_mpc_tpu.solvers.base import BaseSolver
from covo_mpc_tpu.solvers.pid import PIDParams, PIDSolver


@struct.dataclass
class CoVOParams:
    """(reference: covo.py:13-22)"""

    gamma_mean: float
    gamma_sigma: float
    discount: float
    sample_sigma: float

    a_mean: jnp.ndarray  # (H, dA)
    a_cov: jnp.ndarray  # (H*dA, H*dA) joint covariance
    a_cov_offline: jnp.ndarray  # (max_steps, H*dA, H*dA) after offline reset
    # speculative mode only: the sampling factor designed LAST step for the
    # current step's Σ (factor @ factor.T == a_cov); None in online/offline
    a_factor: jnp.ndarray = None
    # offline mode, fast samplers only: the designer's Σ square roots for
    # the whole schedule, precomputed at reset so the per-solve 128x128
    # Cholesky disappears from the hot path; None before reset / in parity
    a_factor_offline: jnp.ndarray = None


class CoVOSolver(BaseSolver):
    def __init__(
        self,
        env,
        control_params: CoVOParams,
        N: int,
        H: int,
        lam: float,
        mode: str = "online",
        rng_mode: str = sampling.PARITY,
        hessian_mode: str = covariance.FWD_FWD,
        collect_debug: bool = True,
        engine: str = "jnp",
        hessian_unroll: int = 1,
        sigma_mode: str = "eigh",
        collect_metrics: bool = False,
    ) -> None:
        super().__init__(env, control_params)
        self.collect_metrics = collect_metrics
        if mode not in ("online", "offline", "speculative"):
            raise NotImplementedError(f"unknown CoVO mode {mode!r}")
        if sigma_mode == "eigh":
            self._optimize_sigma = covariance.optimize_sigma
        elif sigma_mode in ("ns", "ns_pallas"):
            # matmul-only Newton-Schulz designer; not bit-identical to eigh,
            # so it pairs with the fast/invariant samplers, not parity
            if rng_mode == sampling.PARITY:
                raise ValueError(f"sigma_mode={sigma_mode!r} is not a parity path")
            if sigma_mode == "ns" or mode == "offline":
                # offline precomputes the Σ schedule by VMAPPING the
                # designer over the episode (reset), and pallas_call
                # does not vmap over its SMEM operands on hardware (the
                # same constraint that keeps the Hessian primal on the
                # scan path there, see below) — interpret mode passes,
                # so only a hardware run would crash; force the jnp NS
                # designer for offline regardless of sigma_mode.
                self._optimize_sigma = covariance.optimize_sigma_ns
            else:
                # fused single-kernel variant; r5 trace A/B: LOSES to the
                # XLA designer solve-level (181.7 vs 130.2 us — the
                # in-kernel elimination is ~4x XLA's cholesky custom-call;
                # scripts/sigma_pallas_ab.py) — kept as the measured
                # fusion-experiment record, not a fast path
                from covo_mpc_tpu.ops.covariance_pallas import (
                    optimize_sigma_ns_pallas,
                )

                # the Σ kernel is TPU-only; interpret everywhere else so
                # ns_pallas works regardless of the rollout engine choice
                self._optimize_sigma = partial(
                    optimize_sigma_ns_pallas,
                    interpret=(
                        engine == "pallas_interpret"
                        or jax.default_backend() != "tpu"
                    ),
                )
        else:
            raise ValueError(f"unknown sigma_mode {sigma_mode!r}")
        self.N = N
        self.H = H
        self.lam = lam
        self.mode = mode
        self.rng_mode = rng_mode
        self.collect_debug = collect_debug
        self.action_dim = env.action_dim
        self.D = H * env.action_dim

        if engine in ("pallas", "pallas_interpret"):
            from covo_mpc_tpu.ops.rollout_pallas import (
                make_pallas_rollout,
                make_pallas_rollout_joint_sampling,
            )

            if collect_debug:
                raise ValueError("pallas engine requires collect_debug=False")
            interpret = engine == "pallas_interpret"
            # non-parity samplers skip the reference key-split chain
            # on the disturbance draw (9 us/solve of serial threefry,
            # scripts/kernel_ab.py; quality-gated in RESULTS.md)
            fast_keys = rng_mode != sampling.PARITY
            if rng_mode == sampling.KERNEL:
                # fused joint sample+rollout: the (H·dA)-dim MVN draw runs
                # inside the kernel (TPU PRNG + in-kernel F z contraction)
                self.rollout_sampling = make_pallas_rollout_joint_sampling(
                    env, interpret=interpret, fast_keys=fast_keys
                )
            else:
                self.rollout_sampling = None
            self.rollout = make_pallas_rollout(env, interpret=interpret,
                                           fast_keys=fast_keys)
            # fast samplers emit actions directly in the kernel's
            # sample-axis-last layout — no 4 MB transpose on the hot path
            self.transposed = rng_mode != sampling.PARITY
        elif engine == "jnp":
            if rng_mode == sampling.KERNEL:
                raise ValueError("rng_mode='kernel' requires the pallas engine")
            self.rollout = make_rollout(
                env, fast_keys=rng_mode != sampling.PARITY
            )
            self.rollout_sampling = None
            self.transposed = False
        else:
            raise ValueError(f"unknown engine {engine!r}")
        if hessian_mode == "sensitivity":
            from covo_mpc_tpu.ops.hessian import make_hessian_sensitivity

            self._hessian = make_hessian_sensitivity(env, H)
        elif hessian_mode in ("adjoint", "gn"):
            from covo_mpc_tpu.ops.hessian import make_hessian_adjoint

            # with the Pallas rollout engine, also run the Hessian's
            # sequential primal pass in-kernel (~0.8 ms as an XLA scan).
            # Offline mode instead vmaps the Hessian over the whole episode
            # schedule (reset, covo.py:92-99): the 300-wide batch amortizes
            # the scan's launches AND pallas_call does not vmap over its
            # SMEM operands — keep the scan primal there. Speculative mode's
            # prepare() is a single non-vmapped Hessian call exactly like
            # online, so it takes the kernel primal too (it was lumped in
            # with offline through r4 — the scan primal put ~0.27 ms of
            # batch-of-one small fusions on the full step: 0.40 -> 0.13 ms
            # trace-measured when fixed).
            primal = (
                engine
                if engine.startswith("pallas")
                and mode in ("online", "speculative")
                else "scan"
            )
            # the fused tail also replaces the default-precision XLA
            # pullback matmuls (bf16-truncated on TPU, ~7e-3 absolute on a
            # unit-scale Hessian) with HIGHEST-precision in-kernel dots
            tail = primal if primal != "scan" else "xla"
            # "gn": Gauss-Newton curvature — drops every second-order
            # dynamics term (see make_hessian_adjoint); same chassis
            self._hessian = make_hessian_adjoint(
                env, H, primal=primal, tail=tail,
                second_order=hessian_mode == "adjoint",
            )
        else:
            self._hessian = covariance.make_hessian(
                make_hessian_cost(env, H, unroll=hessian_unroll), mode=hessian_mode
            )
        if mode == "offline":
            # PID expansion policy for the offline schedule
            # (reference: covo.py:48-56)
            self.expansion_params = PIDParams(Kp=10.0, Kd=5.0, Ki=0.0, Kp_att=10.0)
            self.expansion = PIDSolver(env, self.expansion_params)

    # -- Σ design -----------------------------------------------------------
    def get_hessian(self, env_state, env_params, a_mean, key):
        """R = ∂² cost / ∂a² around the nominal sequence
        (reference: covo.py:134-185)."""
        return self._hessian(
            a_mean.flatten(),
            pack_state(env_state),
            env_state.time,
            env_state.pos_traj,
            env_state.vel_traj,
            env_params,
            key,
        )

    def _sigma_online(self, control_params, env_state, env_params, key):
        R = self.get_hessian(env_state, env_params, control_params.a_mean, key)
        return self._optimize_sigma(R, control_params.sample_sigma, self.D)

    # -- speculative mode (extension; not in the reference) ------------------
    @partial(jax.jit, static_argnums=(0,))
    def prepare(self, env_state, env_params, control_params, key, info=None):
        """Design Σ for the NEXT control step from the model-predicted state.

        Steps the model once with the action about to be applied
        (``a_mean[0]`` after the update, deterministic dynamics — the same
        model the rollouts use) and runs the Hessian + Σ-designer at that
        predicted state, storing ``(a_cov, a_factor)`` for the next
        :meth:`act`. This moves the whole Σ design off the obs→action
        critical path: in a deployed control loop it runs in the idle time
        after the action is sent (at 50 Hz, ~19.7 ms of idle vs ~0.15 ms of
        design work); on a device mesh it is the second stage of a
        two-stage pipeline (parallel/pipeline.make_pipeline_step — act and
        design overlapped on two chips). The Σ is one model step stale —
        quality sits
        between covo_online (exact state) and covo_offline (whole schedule
        precomputed), gated on the 40-episode protocol in RESULTS.md
        ("Speed-mode quality gates": 3.75 cm, between online's 3.88 and
        offline's 4.04, +44.6% vs the same-run MPPI anchor).
        """
        if self.mode != "speculative":
            raise ValueError("prepare() requires mode='speculative'")
        if info is not None and info.get("noisy_state") is not None:
            env_state = info["noisy_state"]  # same injection as act()
        action = control_params.a_mean[0]
        key, k_step = jax.random.split(key)
        _, x_next, _, _, _ = self.env.step_env(
            k_step, env_state, action, env_params, deterministic=True
        )
        nominal = jnp.concatenate(
            [control_params.a_mean[1:], control_params.a_mean[-1:]]
        )
        R = self.get_hessian(x_next, env_params, nominal, key)
        a_cov, factor = self._optimize_sigma(
            R, control_params.sample_sigma, self.D
        )
        return control_params.replace(a_cov=a_cov, a_factor=factor)

    @partial(jax.jit, static_argnums=(0,))
    def act(self, obs, env_state, env_params, rng_act, control_params, info=None):
        """Speculative mode's obs→action path: shift + sample + rollout +
        update with the Σ prepared last step — no Hessian, no designer.
        ``__call__`` is ``act`` + ``prepare`` fused (for protocol
        compatibility); call them separately to overlap ``prepare`` with
        control-loop idle or another pipeline stage."""
        if self.mode != "speculative":
            raise ValueError("act() requires mode='speculative'")
        if info is not None and info.get("noisy_state") is not None:
            env_state = info["noisy_state"]
        a_mean = jnp.concatenate(
            [control_params.a_mean[1:], control_params.a_mean[-1:]]
        )
        control_params = control_params.replace(a_mean=a_mean)
        return self._sample_rollout_update(
            control_params, env_state, env_params, rng_act,
            control_params.a_cov, control_params.a_factor,
        )

    # -- offline schedule ---------------------------------------------------
    def reset(self, env_state=None, env_params=None, control_params=None, key=None):
        if self.mode == "online":
            return self.init_control_params
        if self.mode == "speculative":
            if control_params is None:
                control_params = self.init_control_params
            if env_state is None:
                return control_params
            # cold start: design step 0's Σ exactly where the online mode
            # would — at the reset state around the shifted initial nominal
            nominal = jnp.concatenate(
                [control_params.a_mean[1:], control_params.a_mean[-1:]]
            )
            a_cov, factor = self._sigma_online(
                control_params.replace(a_mean=nominal), env_state, env_params, key
            )
            return control_params.replace(a_cov=a_cov, a_factor=factor)
        return self._reset_offline(env_state, env_params, control_params, key)

    def _expansion_action(self, state, params, rng):
        obs = self.env.get_obs(state, params)
        action, _, _ = self.expansion(
            obs, state, params, rng, self.expansion_params
        )
        return jax.lax.stop_gradient(action)

    def offline_schedule_inputs(self, env_state, env_params, key):
        """Offline-schedule phase 1: advance the PID expansion episode,
        collecting the per-step (state_t, key_t) pairs with the reference's
        key chain (covo.py:72-90: the H-rollout's key consumption is
        discarded; the forward step splits twice). Sequential and cheap —
        the schedule state depends only on the PID episode, never on Σ."""

        def advance(carry, _):
            state, k = carry
            out = (state, k)
            rng_step, k = jax.random.split(k)
            action = self._expansion_action(state, env_params, rng_step)
            rng_step, k = jax.random.split(k)
            _, state, _, _, _ = self.env.step_env(
                rng_step, state, action, env_params
            )
            return (state, k), out

        max_steps = self.env.default_params.max_steps_in_episode
        _, (states, keys) = jax.lax.scan(
            advance, (env_state, key), None, length=max_steps
        )
        return states, keys

    def offline_sigma_at(self, state, key, env_params, sample_sigma):
        """Offline-schedule phase 2 body: nominal H-step PID rollout +
        Hessian + Σ design at one schedule timestep (reference:
        covo.py:72-90). Independent across timesteps — vmapped on one chip
        (:meth:`_reset_offline`), sharded over the mesh by
        :func:`covo_mpc_tpu.parallel.offline.make_distributed_offline_schedule`.
        Returns ``(a_cov, factor)`` — the designer's square root rides
        along so fast-sampler solves skip the per-step Cholesky."""

        def pid_rollout(carry, _):
            st, params, k = carry
            rng_act, k = jax.random.split(k)
            action = self._expansion_action(st, params, rng_act)
            rng_step, k = jax.random.split(k)
            _, st, _, _, _ = self.env.step_env(
                rng_step, st, action, params, deterministic=True
            )
            return (st, params, k), action

        _, a_mean = jax.lax.scan(
            pid_rollout, (state, env_params, key), None, length=self.H
        )
        R = self.get_hessian(state, env_params, a_mean, key)
        return self._optimize_sigma(R, sample_sigma, self.D)

    @partial(jax.jit, static_argnums=(0,))
    def _reset_offline(self, env_state, env_params, control_params, key):
        """Precompute the per-timestep Σ schedule (reference: covo.py:58-112).

        The reference runs max_steps sequential iterations, each doing an
        H-step PID rollout, a Hessian, and an eigh. The schedule STATE only
        depends on the PID episode — never on Σ — so this decomposes into
        (1) one cheap scan advancing the PID episode and collecting the
        per-step (state, key) pairs, then (2) the H-rollouts, Hessians and
        eighs for ALL max_steps timesteps as one vmapped batch. Same values
        (identical key chain), ~device-parallel instead of 300x sequential.
        """
        states, keys = self.offline_schedule_inputs(env_state, env_params, key)
        a_cov_offline, a_factor_offline = jax.vmap(
            lambda s, k: self.offline_sigma_at(
                s, k, env_params, control_params.sample_sigma
            )
        )(states, keys)
        return control_params.replace(a_cov_offline=a_cov_offline,
                                      a_factor_offline=a_factor_offline)

    # -- solve --------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, obs, env_state, env_params, rng_act, control_params, info=None):
        if info is not None and info.get("noisy_state") is not None:
            env_state = info["noisy_state"]

        # shift the mean only — CoVO re-designs Σ from scratch each step
        # (reference: covo.py:201-203)
        a_mean = jnp.concatenate(
            [control_params.a_mean[1:], control_params.a_mean[-1:]]
        )
        control_params = control_params.replace(a_mean=a_mean)

        if self.mode == "online":
            a_cov, factor = self._sigma_online(
                control_params, env_state, env_params, rng_act
            )
        elif self.mode == "offline":
            a_cov = control_params.a_cov_offline[env_state.time]
            # fast samplers draw with the precomputed designer factor;
            # parity keeps the reference's per-solve Cholesky (bit-compat)
            factor = (
                None
                if (self.rng_mode == sampling.PARITY
                    or control_params.a_factor_offline is None)
                else control_params.a_factor_offline[env_state.time]
            )
        else:  # speculative: Σ was designed LAST step from the predicted state
            a_cov = control_params.a_cov
            factor = control_params.a_factor
        control_params = control_params.replace(a_cov=a_cov)

        action, control_params, info_out = self._sample_rollout_update(
            control_params, env_state, env_params, rng_act, a_cov, factor
        )
        if self.mode == "speculative":
            # design the NEXT step's Σ from the model-predicted next state —
            # off the obs→action critical path (runs after the action is
            # determined; at 50 Hz it hides entirely in control-loop idle,
            # and on a mesh it maps to a pipeline stage on another chip).
            # fold_in keeps the prepare key chain disjoint from the tail's
            # act/step splits of the same rng_act.
            control_params = self.prepare(
                env_state, env_params, control_params,
                jax.random.fold_in(rng_act, 7919),
            )
        return action, control_params, info_out

    def _solve_info(self, costs, weight, a_cov, poses=None):
        """Per-solve info dict shared by both engine layouts (debug poses
        + optional metrics payload — ONE definition so the layouts
        cannot silently report different metrics)."""
        info = {}
        if poses is not None:
            info["pos_mean"] = jnp.mean(poses, axis=1)
            info["pos_std"] = jnp.std(poses, axis=1)
        if self.collect_metrics:
            from covo_mpc_tpu.runtime.metrics import (
                sigma_metrics,
                solve_metrics,
            )

            info["metrics"] = {
                **solve_metrics(costs, weight),
                **sigma_metrics(a_cov),
            }
        return info

    def _sample_rollout_update(
        self, control_params, env_state, env_params, rng_act, a_cov, factor
    ):
        """Joint sampling + N×H rollout + weighted mean update given the
        step's Σ (and optionally its sampling factor). The rng split chain
        is identical for every mode, so online and speculative consume the
        same sample keys (pinned by tests/test_covo.py)."""
        # joint (H·dA)-dim sampling (reference: covo.py:212-221)
        a_mean = control_params.a_mean
        rng_act, act_key = jax.random.split(rng_act)
        if self.rng_mode == sampling.PARITY or factor is None:
            factor = jnp.linalg.cholesky(a_cov)
        rng_act, step_key = jax.random.split(rng_act)

        if self.transposed:
            if self.rollout_sampling is not None:
                # fused joint sample+rollout: the draw happens in-kernel and
                # the clipped samples come back as a kernel output (D, N)
                costs, a_t = self.rollout_sampling(
                    pack_state(env_state), env_state.time,
                    env_state.pos_traj, env_state.vel_traj, a_mean, factor,
                    env_params, step_key, act_key, self.N,
                    deterministic=True, discount=control_params.discount,
                )
            else:
                # kernel-layout fast path: same draws, actions stay (D, N)
                a_t = jnp.clip(
                    sampling.sample_joint_t(
                        act_key, a_mean.flatten(), factor, self.N,
                        mode=self.rng_mode,
                    ),
                    -1.0, 1.0,
                )
                costs, _ = self.rollout(
                    pack_state(env_state), env_state.time,
                    env_state.pos_traj, env_state.vel_traj, a_t, env_params,
                    step_key, deterministic=True,
                    discount=control_params.discount, layout="hdn",
                )
            weight = reductions.mppi_weights(costs, self.lam)
            a_mean = reductions.mean_update_t(
                weight, a_t.reshape(self.H, self.action_dim, self.N),
                control_params.a_mean, control_params.gamma_mean,
            )
            control_params = control_params.replace(a_mean=a_mean)
            return (control_params.a_mean[0], control_params,
                    self._solve_info(costs, weight, a_cov))

        a_flat = sampling.sample_joint(
            act_key, a_mean.flatten(), factor, self.N, mode=self.rng_mode
        )
        a_sampled = jnp.clip(a_flat.reshape(self.N, self.H, -1), -1.0, 1.0)

        # deterministic rollouts (reference: covo.py:231)
        costs, poses = self.rollout(
            pack_state(env_state),
            env_state.time,
            env_state.pos_traj,
            env_state.vel_traj,
            a_sampled,
            env_params,
            step_key,
            deterministic=True,
            discount=control_params.discount,
            collect_poses=self.collect_debug,
        )

        # mean-only update (reference: covo.py:269-275)
        weight = reductions.mppi_weights(costs, self.lam)
        a_mean = reductions.mean_update(
            weight, a_sampled, control_params.a_mean, control_params.gamma_mean
        )
        control_params = control_params.replace(a_mean=a_mean)
        return (control_params.a_mean[0], control_params,
                self._solve_info(costs, weight, a_cov,
                                 poses if self.collect_debug else None))

"""MPPI: Model Predictive Path Integral control.

Semantics match the reference controller (reference: quadjax/controllers/
mppi.py:11-134); the execution strategy is TPU-native:

  * sampling = one shared Cholesky + a batched matvec (ops/sampling.py)
    instead of N vmapped `multivariate_normal` calls,
  * rollouts run on packed (N, 16) state with shared trajectory tables
    (ops/rollout.py) instead of per-sample pytree repeats,
  * the weighted mean/cov updates are einsum reductions (ops/reductions.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from covo_mpc_tpu.models.structs import pack_state
from covo_mpc_tpu.ops import reductions, sampling
from covo_mpc_tpu.ops.rollout import make_rollout
from covo_mpc_tpu.solvers.base import BaseSolver


@struct.dataclass
class MPPIParams:
    """(reference: mppi.py:11-19)"""

    gamma_mean: float  # blend factor for the mean update
    gamma_sigma: float  # blend factor for the covariance update
    discount: float  # reward discount over the horizon
    sample_sigma: float  # base isotropic sampling std

    a_mean: jnp.ndarray  # (H, dA)
    a_cov: jnp.ndarray  # (H, dA, dA)
    # carried chol(a_cov), maintained by ops/reductions.cov_factor_update_t
    # so the sampler's per-solve batched Cholesky disappears whenever the
    # gamma_sigma==0 cond leaves a_cov unchanged (None = derive per solve)
    a_cov_chol: jnp.ndarray = None


class MPPISolver(BaseSolver):
    def __init__(
        self,
        env,
        control_params: MPPIParams,
        N: int,
        H: int,
        lam: float,
        rng_mode: str = sampling.PARITY,
        collect_debug: bool = True,
        engine: str = "jnp",
        collect_metrics: bool = False,
    ) -> None:
        super().__init__(env, control_params)
        self.N = N
        self.H = H
        self.lam = lam
        self.rng_mode = rng_mode
        self.collect_debug = collect_debug
        self.collect_metrics = collect_metrics
        if engine in ("pallas", "pallas_interpret"):
            from covo_mpc_tpu.ops.rollout_pallas import (
                make_pallas_rollout,
                make_pallas_rollout_sampling,
            )

            if collect_debug:
                raise ValueError("pallas engine requires collect_debug=False")
            interpret = engine == "pallas_interpret"
            # non-parity samplers skip the reference key-split chain
            # on the disturbance draw (9 us/solve of serial threefry,
            # scripts/kernel_ab.py; quality-gated in RESULTS.md)
            fast_keys = rng_mode != sampling.PARITY
            if rng_mode == sampling.KERNEL:
                # fused sample+rollout: the MVN draw runs inside the kernel
                self.rollout_sampling = make_pallas_rollout_sampling(
                    env, interpret=interpret, fast_keys=fast_keys
                )
            else:
                self.rollout_sampling = None
            # costs-only engine built unconditionally (like CoVOSolver)
            # so solver.rollout exists in every configuration
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

    def _solve_info(self, costs, weight, poses=None):
        """Per-solve info dict shared by both engine layouts (one
        definition so the layouts cannot silently report different
        metrics)."""
        info = {}
        if poses is not None:
            info["pos_mean"] = jnp.mean(poses, axis=1)
            info["pos_std"] = jnp.std(poses, axis=1)
        if self.collect_metrics:
            from covo_mpc_tpu.runtime.metrics import solve_metrics

            info["metrics"] = solve_metrics(costs, weight)
        return info

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, obs, env_state, env_params, rng_act, control_params, info=None):
        # controllers act on the obs-noise-injected state (reference: mppi.py:40)
        if info is not None and info.get("noisy_state") is not None:
            env_state = info["noisy_state"]

        # receding-horizon shift of mean AND covariance (reference: mppi.py:43-49)
        a_mean = jnp.concatenate(
            [control_params.a_mean[1:], control_params.a_mean[-1:]]
        )
        a_cov = jnp.concatenate([control_params.a_cov[1:], control_params.a_cov[-1:]])
        a_chol = control_params.a_cov_chol
        if a_chol is not None:
            # chol factorizes each (dA, dA) block independently, so the
            # row shift commutes with it — the carried factor stays exact
            a_chol = jnp.concatenate([a_chol[1:], a_chol[-1:]])
        control_params = control_params.replace(
            a_mean=a_mean, a_cov=a_cov, a_cov_chol=a_chol
        )

        # sample N action sequences (reference key chain: mppi.py:53-54)
        rng_act, act_key = jax.random.split(rng_act)
        rng_act, step_key = jax.random.split(rng_act)
        if self.transposed:
            if self.rollout_sampling is not None:
                # fused sample+rollout: the draw happens in-kernel and the
                # clipped samples come back as a kernel output (H*dA, N)
                chol = (a_chol if a_chol is not None
                        else jnp.linalg.cholesky(a_cov))
                costs, a_flat = self.rollout_sampling(
                    pack_state(env_state), env_state.time,
                    env_state.pos_traj, env_state.vel_traj, a_mean, chol,
                    env_params, step_key, act_key, self.N,
                    deterministic=False, discount=control_params.discount,
                )
                a_t = a_flat.reshape(self.H, -1, self.N)
            else:
                # kernel-layout fast path: same draws as the jnp engine,
                # actions stay (H, dA, N)
                a_t = jnp.clip(
                    sampling.sample_per_step_t(
                        act_key, a_mean, a_cov, self.N, mode=self.rng_mode,
                        chol=a_chol,
                    ),
                    -1.0, 1.0,
                )
                costs, _ = self.rollout(
                    pack_state(env_state), env_state.time,
                    env_state.pos_traj, env_state.vel_traj, a_t, env_params,
                    step_key, deterministic=False,
                    discount=control_params.discount, layout="hdn",
                )
            weight = reductions.mppi_weights(costs, self.lam)
            a_mean = reductions.mean_update_t(
                weight, a_t, control_params.a_mean, control_params.gamma_mean
            )
            if a_chol is not None:
                a_cov, a_chol = reductions.cov_factor_update_t(
                    weight, a_t, a_mean, control_params.a_cov, a_chol,
                    control_params.gamma_sigma,
                )
            else:
                a_cov = reductions.cov_update_t(
                    weight, a_t, a_mean, control_params.a_cov,
                    control_params.gamma_sigma,
                )
            control_params = control_params.replace(
                a_mean=a_mean, a_cov=a_cov, a_cov_chol=a_chol
            )
            return (control_params.a_mean[0], control_params,
                    self._solve_info(costs, weight))

        a_sampled = sampling.sample_per_step(
            act_key, a_mean, a_cov, self.N, mode=self.rng_mode, chol=a_chol
        )
        a_sampled = jnp.clip(a_sampled, -1.0, 1.0)

        # rollout all samples; one shared step key (reference: mppi.py:69)
        costs, poses = self.rollout(
            pack_state(env_state),
            env_state.time,
            env_state.pos_traj,
            env_state.vel_traj,
            a_sampled,
            env_params,
            step_key,
            deterministic=False,
            discount=control_params.discount,
            collect_poses=self.collect_debug,
        )

        weight = reductions.mppi_weights(costs, self.lam)
        a_mean = reductions.mean_update(
            weight, a_sampled, control_params.a_mean, control_params.gamma_mean
        )
        if a_chol is not None:
            a_cov, a_chol = reductions.cov_factor_update(
                weight, a_sampled, a_mean, control_params.a_cov, a_chol,
                control_params.gamma_sigma,
            )
        else:
            a_cov = reductions.cov_update(
                weight, a_sampled, a_mean, control_params.a_cov,
                control_params.gamma_sigma,
            )
        control_params = control_params.replace(
            a_mean=a_mean, a_cov=a_cov, a_cov_chol=a_chol
        )
        return (control_params.a_mean[0], control_params,
                self._solve_info(costs, weight,
                                 poses if self.collect_debug else None))

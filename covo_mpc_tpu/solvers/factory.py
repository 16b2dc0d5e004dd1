"""Solver factory + hyperparameter parsing.

Mirrors the reference's controller factory including the packed
``"N{N}_H{H}_lam{lam}"`` parameter string (reference:
quadjax/envs/quadrotor.py:670-752) so existing invocations keep working;
prefer the explicit keyword arguments for new code.
"""

from __future__ import annotations

import jax.numpy as jnp

from covo_mpc_tpu.ops import covariance, sampling
from covo_mpc_tpu.solvers.base import BaseSolver, RandomSolver
from covo_mpc_tpu.solvers.covo import CoVOParams, CoVOSolver
from covo_mpc_tpu.solvers.mppi import MPPIParams, MPPISolver
from covo_mpc_tpu.solvers.pid import PIDParams, PIDSolver

DEFAULT_N = 8192
DEFAULT_H = 32
DEFAULT_LAM = 0.01
DEFAULT_SIGMA = 0.5


def parse_sample_params(param_text: str):
    """Parse "N{N}_H{H}_lam{lam}" (reference: quadrotor.py:671-683)."""
    if param_text == "" or param_text is None:
        return DEFAULT_N, DEFAULT_H, DEFAULT_LAM, DEFAULT_SIGMA
    parts = param_text.split("_")
    return int(parts[0][1:]), int(parts[1][1:]), float(parts[2][3:]), DEFAULT_SIGMA


def resolve_engine(env, N: int, engine: str, collect_debug: bool) -> str:
    """Resolve engine="auto": the fused Pallas rollout on TPU (the kernel
    covers every disturbance model and tile-pads ragged N), unless debug
    pose collection is requested (kernel computes costs only).

    ``env``/``N`` are currently unused: the kernel handles every
    disturbance model and ragged N, so the choice no longer depends on
    them — the parameters stay so env/size-conditional dispatch can
    return without touching call sites (same for ``env`` in
    :func:`resolve_hessian_mode`)."""
    if engine != "auto":
        return engine
    import jax

    if jax.default_backend() == "tpu" and not collect_debug:
        return "pallas"
    return "jnp"


def resolve_hessian_mode(env, hessian_mode: str, rng_mode: str) -> str:
    """Resolve hessian_mode="auto": the adjoint estimator — the fast path,
    which covers every disturbance model (velocity-coupled drag/mixed run
    the widened 16-dim sensitivity state, ops/hessian.py) — except under
    the parity sampler, where the reference's own fwd-over-fwd estimator
    keeps Σ bit-compatible (reference: covo.py:183-185)."""
    if hessian_mode != "auto":
        return hessian_mode
    return covariance.FWD_FWD if rng_mode == sampling.PARITY else "adjoint"


def resolve_sigma_mode(sigma_mode: str, rng_mode: str) -> str:
    """Resolve sigma_mode="auto": the matmul-only Newton-Schulz designer
    for the fast/invariant samplers, eigh for parity (bit-compat)."""
    if sigma_mode != "auto":
        return sigma_mode
    return "eigh" if rng_mode == sampling.PARITY else "ns"


def hover_sequence(env, H: int) -> jnp.ndarray:
    """Initial nominal sequence: normalized hover thrust, zero body rates
    (reference: quadrotor.py:685-690)."""
    p = env.default_params
    thrust_hover_normed = (p.m * p.g / p.max_thrust) * 2.0 - 1.0
    return jnp.tile(jnp.array([thrust_hover_normed, 0.0, 0.0, 0.0]), (H, 1))


def get_solver(
    env,
    name: str,
    controller_params: str = "",
    debug: bool = False,
    rng_mode: str = sampling.PARITY,
    hessian_mode: str = covariance.FWD_FWD,
    collect_debug: bool = True,
    engine: str = "jnp",
    sigma_mode: str = "eigh",
    collect_metrics: bool = False,
):
    """Build (solver, control_params) by name (reference: quadrotor.py:670-752).

    Names: "pid", "random", "mppi", and any name containing "covo"
    ("covo_online" / "covo-online" / "covo_offline" / ... — substring match,
    like the reference at quadrotor.py:724-737).
    """
    if name == "pid":
        params = PIDParams(Kp=10.0, Kd=5.0, Ki=0.0, Kp_att=10.0)
        return PIDSolver(env, params), params
    if name == "random":
        return RandomSolver(env, None), None

    N, H, lam, sigma = parse_sample_params(controller_params)
    if debug:
        N, H = 4, 2  # fast-feedback smoke config (reference: quadrotor.py:705-707)
    engine = resolve_engine(env, N, engine, collect_debug)
    sigma_mode = resolve_sigma_mode(sigma_mode, rng_mode)
    hessian_mode = resolve_hessian_mode(env, hessian_mode, rng_mode)
    a_mean = hover_sequence(env, H)

    if name == "mppi":
        a_cov = jnp.tile(
            jnp.diag(jnp.full((env.action_dim,), sigma**2)), (H, 1, 1)
        )
        params = MPPIParams(
            gamma_mean=1.0,
            gamma_sigma=0.0,
            discount=1.0,
            sample_sigma=sigma,
            a_mean=a_mean,
            a_cov=a_cov,
            # carried factor: the sampler skips its per-solve batched
            # Cholesky whenever the gamma_sigma==0 cond leaves a_cov
            # unchanged (reductions.cov_factor_update maintains it)
            a_cov_chol=jnp.linalg.cholesky(a_cov),
        )
        solver = MPPISolver(
            env, params, N=N, H=H, lam=lam, rng_mode=rng_mode,
            collect_debug=collect_debug, engine=engine,
            collect_metrics=collect_metrics,
        )
        return solver, params
    if "covo" in name:
        # substring matching like the reference (quadrotor.py:724-737);
        # "spec"/"latency" selects the speculative pipeline mode (extension:
        # Σ designed one step ahead from the model-predicted state)
        if "offline" in name:
            mode = "offline"
        elif "spec" in name or "latency" in name:
            mode = "speculative"
        else:
            mode = "online"
        a_cov = jnp.diag(jnp.full((H * env.action_dim,), sigma**2))
        params = CoVOParams(
            gamma_mean=1.0,
            gamma_sigma=0.0,
            discount=1.0,
            sample_sigma=sigma,
            a_mean=a_mean,
            a_cov=a_cov,
            a_cov_offline=jnp.zeros((H, env.action_dim, env.action_dim)),
            # isotropic cold-start factor for step 0 when reset() is not
            # given a state to design from (factor @ factor.T == a_cov)
            a_factor=(
                jnp.eye(H * env.action_dim) * sigma
                if mode == "speculative" else None
            ),
        )
        solver = CoVOSolver(
            env, params, N=N, H=H, lam=lam, mode=mode, rng_mode=rng_mode,
            hessian_mode=hessian_mode, collect_debug=collect_debug,
            engine=engine, sigma_mode=sigma_mode,
            collect_metrics=collect_metrics,
        )
        return solver, params
    raise NotImplementedError(f"unknown controller {name!r}")

"""Evaluation protocols.

``evaluate`` reproduces the reference protocol — 4 fixed reset
trajectories x (num_eps/4) repetitions from PRNGKey(seed), with the RNG
chain threaded sequentially through episodes (reference:
quadjax/envs/quadrotor.py:506-591) — but runs ALL episodes inside one
`lax.scan` on device instead of a host Python loop, removing 40 dispatch
round-trips.

``evaluate_batched`` additionally vmaps independent episodes for
throughput work (scenario-style batching; keys are per-episode fold-ins,
not the reference chain).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from covo_mpc_tpu.runtime.episode import make_episode_runner


@dataclasses.dataclass
class EvalResult:
    err_pos_ep: jnp.ndarray  # (num_eps,) per-episode mean tracking error [m]
    mean: float
    std: float
    # per-solve health metrics, dict of (num_eps, T) arrays — populated
    # when the controller was built with collect_metrics=True
    metrics: Optional[dict] = None

    def summary(self) -> str:
        # the reference prints cm (quadrotor.py:579)
        return f"err_pos: {self.mean*100:.2f} +/- {self.std*100:.2f} cm"


def write_metrics_jsonl(metrics: dict, err_pos: jnp.ndarray, path: str):
    """Dump per-solve metrics (dict of (num_eps, T) arrays) as JSONL —
    one record per (episode, step) with the episode's tracking error."""
    import numpy as np

    from covo_mpc_tpu.runtime.metrics import MetricsLogger

    logger = MetricsLogger(path)
    arrs = {k: np.asarray(v) for k, v in metrics.items()}
    err = np.asarray(err_pos)
    num_eps, T = next(iter(arrs.values())).shape
    for ep in range(num_eps):
        for t in range(T):
            logger.log(
                step=ep * T + t, episode=ep,
                err_pos=err[ep] if err.ndim == 1 else err[ep, t],
                **{k: v[ep, t] for k, v in arrs.items()},
            )
    logger.close()
    return logger


def evaluate(
    env,
    controller,
    total_steps: int = 12000,
    num_trajs: int = 4,
    seed: int = 1,
    metrics_path: Optional[str] = None,
) -> EvalResult:
    """Reference-parity evaluation (reference: quadrotor.py:506-591).

    ``metrics_path``: if the controller collects solve metrics
    (collect_metrics=True), also write them as JSONL — one record per
    (episode, step) — and attach the raw arrays to the result.
    """
    max_steps = env.default_params.max_steps_in_episode
    num_eps = int(total_steps // max_steps)
    if num_eps < 1:
        raise ValueError(
            f"total_steps={total_steps} is less than one episode "
            f"({max_steps} steps)"
        )
    # fewer episodes than reset trajectories: use the first num_eps
    # trajectories once each instead of silently averaging zero episodes
    # (the reference's num_eps//4 loop nesting would run nothing and print
    # nan, quadrotor.py:564-573)
    num_trajs = min(num_trajs, num_eps)
    reps = num_eps // num_trajs
    run_one_ep = make_episode_runner(env, controller)

    rng = jax.random.PRNGKey(seed)
    rng, rng_reset_meta = jax.random.split(rng)
    reset_keys = jax.random.split(rng_reset_meta, num_trajs)  # (4, key)
    # episode i uses reset key i // reps, matching the reference loop nesting
    reset_seq = jnp.repeat(reset_keys, reps, axis=0)  # (num_eps, key)

    def ep_step(rng, rng_reset):
        rng_out, err_pos, _, metrics = run_one_ep(rng_reset, rng)
        return rng_out, (err_pos.mean(), metrics)

    @jax.jit
    def run_all(rng, reset_seq):
        return lax.scan(ep_step, rng, reset_seq)

    _, (err_pos_ep, metrics) = run_all(rng, reset_seq)
    result = EvalResult(
        err_pos_ep=err_pos_ep,
        mean=float(jnp.mean(err_pos_ep)),
        std=float(jnp.std(err_pos_ep)),
        metrics=metrics or None,
    )
    if metrics_path and metrics:
        write_metrics_jsonl(metrics, err_pos_ep, metrics_path)
    return result


def evaluate_batched(
    env,
    controller,
    num_eps: int = 40,
    seed: int = 1,
    env_params=None,
) -> EvalResult:
    """Throughput-oriented: vmap all episodes at once with independent keys."""
    run_one_ep = make_episode_runner(env, controller)
    base = jax.random.PRNGKey(seed)
    reset_keys = jax.random.split(jax.random.fold_in(base, 0), num_eps)
    run_keys = jax.random.split(jax.random.fold_in(base, 1), num_eps)

    @jax.jit
    def run_all(reset_keys, run_keys):
        _, err_pos, _, _ = jax.vmap(lambda kr, k: run_one_ep(kr, k, env_params))(
            reset_keys, run_keys
        )
        return err_pos.mean(axis=1)

    err_pos_ep = run_all(reset_keys, run_keys)
    return EvalResult(
        err_pos_ep=err_pos_ep,
        mean=float(jnp.mean(err_pos_ep)),
        std=float(jnp.std(err_pos_ep)),
    )

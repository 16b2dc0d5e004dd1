"""Harness: episode runner, eval/render protocols, configs, metrics."""

from covo_mpc_tpu.runtime.config import RunConfig
from covo_mpc_tpu.runtime.episode import make_episode_runner
from covo_mpc_tpu.runtime.eval import EvalResult, evaluate, evaluate_batched
from covo_mpc_tpu.runtime.metrics import MetricsLogger, sigma_metrics, solve_metrics
from covo_mpc_tpu.runtime.render import load_trace, render_episode, save_trace
from covo_mpc_tpu.runtime.supervisor import (
    CellStore,
    SupervisedResult,
    run_supervised,
    run_supervised_batched,
)

__all__ = [
    "CellStore",
    "EvalResult",
    "SupervisedResult",
    "run_supervised",
    "run_supervised_batched",
    "MetricsLogger",
    "RunConfig",
    "evaluate",
    "evaluate_batched",
    "load_trace",
    "make_episode_runner",
    "render_episode",
    "save_trace",
    "sigma_metrics",
    "solve_metrics",
]

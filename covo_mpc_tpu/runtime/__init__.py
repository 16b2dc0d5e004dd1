"""Harness: episode runner, eval/render protocols, configs, metrics."""

from covo_mpc_tpu.runtime.episode import make_episode_runner
from covo_mpc_tpu.runtime.eval import EvalResult, evaluate, evaluate_batched

__all__ = ["EvalResult", "evaluate", "evaluate_batched", "make_episode_runner"]

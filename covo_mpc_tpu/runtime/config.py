"""Typed run configuration.

Mirrors the reference CLI surface (reference: quadjax/envs/quadrotor.py:
755-766) plus the TPU-native knobs (RNG mode, Hessian estimator, rollout
engine, mesh shape). tyro is not available in this image, so the CLI
(covo_mpc_tpu.cli) binds these dataclasses with argparse.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class RunConfig:
    # reference-compatible fields (quadrotor.py:755-766)
    task: str = "tracking"  # tracking | tracking_zigzag | tracking_slow | hovering
    controller: str = "covo_online"  # pid | random | mppi | covo_online | covo_offline
    controller_params: str = ""  # "N{N}_H{H}_lam{lam}", empty = paper defaults
    obs_type: str = "quad"
    debug: bool = False
    mode: str = "eval"  # eval | render | bench
    lower_controller: str = "base"
    noDR: bool = False
    disturb_type: str = "gaussian"
    name: str = ""

    # TPU-native knobs
    rng_mode: str = "fast"  # parity | fast | invariant | kernel (in-kernel TPU-PRNG draw, pallas engine only)
    # auto resolves to the adjoint fast path (every published number uses
    # it; covers all disturbance models) — fwd_fwd under the parity sampler
    hessian_mode: str = "auto"  # auto | fwd_fwd (reference) | fwd_rev | sensitivity | adjoint | gn (Gauss-Newton)
    engine: str = "auto"  # auto | jnp | pallas (fused rollout kernel; TPU only)
    sigma_mode: str = "auto"  # auto | eigh | ns | ns_pallas (NS = matmul-only designer)
    # render mode: re-sample env params + reset the controller whenever an
    # episode ends inside the recording (reference: quadrotor.py:633-640)
    render_reset_on_done: bool = False
    total_steps: int = 300 * 4 * 10
    seed: int = 1
    results_dir: str = "results"
    # per-solve health metrics (ESS, cost quantiles, Σ conditioning) emitted
    # as JSONL from eval mode — runtime/metrics.py
    metrics: bool = False
    # jax.profiler trace directory for bench mode (Perfetto/TensorBoard);
    # empty = no trace — runtime/profiling.trace
    trace_dir: str = ""
    # eval mode: run under the failure-detecting supervisor
    # (runtime/supervisor.py) — chunked episodes, checkpoint/resume,
    # numeric + backend failure recovery
    supervised: bool = False
    checkpoint_dir: str = ""  # supervisor checkpoints; empty = results_dir/ckpt_<name>
    chunk_episodes: int = 4  # supervisor recovery granularity

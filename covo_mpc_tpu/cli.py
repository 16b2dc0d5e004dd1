"""Command-line entry point.

Mirrors the reference CLI surface (reference: quadjax/envs/quadrotor.py:
755-807) with argparse (tyro is not in this image):

    python -m covo_mpc_tpu.cli --task tracking_zigzag --controller covo_online \
        --controller-params N8192_H32_lam0.01 --mode eval

Modes: eval (reference protocol, 40 episodes), render (recorded episode +
dashboard PNG + .npz trace), bench (solve-latency percentiles).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from covo_mpc_tpu.runtime.config import RunConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for field in dataclasses.fields(RunConfig):
        flag = "--" + field.name.replace("_", "-")
        if field.type == "bool" or isinstance(field.default, bool):
            # BooleanOptionalAction gives a --no-<flag> negator, so a
            # default-True bool stays clearable from the command line
            p.add_argument(flag, action=argparse.BooleanOptionalAction,
                           default=field.default)
        else:
            # type(None) would reject every value; None-default fields
            # parse as strings (RunConfig has none today — future-proofing)
            typ = str if field.default is None else type(field.default)
            p.add_argument(flag, type=typ, default=field.default)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = RunConfig(**vars(args))

    import jax

    from covo_mpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if cfg.debug:
        # scoped, not a bare config.update: main() is also called
        # in-process (tests, notebooks, python -c wrappers — CLAUDE.md),
        # where leaking jax_debug_nans would make every later NaN raise
        from covo_mpc_tpu.runtime.debug import debug_mode

        with debug_mode():
            return _run(cfg)
    return _run(cfg)


def _run(cfg) -> int:
    import jax

    from covo_mpc_tpu.models import EnvConfig, QuadEnv
    from covo_mpc_tpu.runtime import evaluate
    from covo_mpc_tpu.runtime.checkpoint import save_eval_result
    from covo_mpc_tpu.runtime.profiling import time_blocking, time_chained
    from covo_mpc_tpu.runtime.render import render_episode, save_trace
    from covo_mpc_tpu.solvers import get_solver
    from covo_mpc_tpu.utils.plotting import plot_episode, plot_eval_errors

    env = QuadEnv(
        EnvConfig(
            task=cfg.task,
            obs_type=cfg.obs_type,
            enable_randomizer=not cfg.noDR,
            lower_controller=cfg.lower_controller,
            disturb_type=cfg.disturb_type,
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )
    solver, control_params = get_solver(
        env,
        cfg.controller,
        cfg.controller_params,
        debug=cfg.debug,
        rng_mode=cfg.rng_mode,
        hessian_mode=cfg.hessian_mode,
        engine=cfg.engine,
        sigma_mode=cfg.sigma_mode,
        # the pallas engine computes costs only; debug pos traces need jnp
        collect_debug=(cfg.engine == "jnp"),
        collect_metrics=cfg.metrics,
    )
    name = cfg.name or f"{cfg.controller}_{cfg.task}"
    os.makedirs(cfg.results_dir, exist_ok=True)

    if cfg.mode == "eval":
        metrics_path = (
            f"{cfg.results_dir}/metrics_{name}.jsonl" if cfg.metrics else None
        )
        if cfg.supervised:
            from covo_mpc_tpu.runtime.supervisor import run_supervised

            if metrics_path:
                # the chunked supervisor does not collect per-solve metrics
                # (they would bloat every checkpoint); run unsupervised for
                # the JSONL, or read events.jsonl for recovery telemetry
                print(
                    "warning: --metrics is not supported with --supervised; "
                    "no metrics JSONL will be written",
                    file=sys.stderr,
                )
                metrics_path = None

            fingerprint = (
                f"{cfg.task}/{cfg.controller}/{cfg.controller_params}/"
                f"{cfg.rng_mode}/{cfg.hessian_mode}/{cfg.engine}/"
                f"{cfg.sigma_mode}/{cfg.disturb_type}/noDR={cfg.noDR}"
            )
            result = run_supervised(
                env, solver, total_steps=cfg.total_steps, seed=cfg.seed,
                checkpoint_dir=cfg.checkpoint_dir
                or f"{cfg.results_dir}/ckpt_{name}",
                chunk_episodes=cfg.chunk_episodes, fingerprint=fingerprint,
            )
        else:
            result = evaluate(env, solver, total_steps=cfg.total_steps,
                              seed=cfg.seed, metrics_path=metrics_path)
        print(result.summary())
        out = save_eval_result(result, f"{cfg.results_dir}/eval_{name}.npz")
        plot_eval_errors(result.err_pos_ep, f"{cfg.results_dir}/eval_{name}.png", name)
        print(f"saved {out}")
        if metrics_path:
            print(f"metrics: {metrics_path}")
    elif cfg.mode == "render":
        trace = render_episode(env, solver, seed=cfg.seed,
                               reset_on_done=cfg.render_reset_on_done)
        out = save_trace(trace, f"{cfg.results_dir}/trace_{name}.npz")
        png = plot_episode(trace, env.default_params.dt,
                           f"{cfg.results_dir}/render_{name}.png", name)
        err = float(trace["err_pos"].mean())
        print(f"mean err_pos: {err*100:.2f} cm; saved {out} and {png}")
    elif cfg.mode == "bench":
        import jax.numpy as jnp

        from covo_mpc_tpu.runtime.profiling import trace

        obs, info, state = env.reset_env(jax.random.PRNGKey(0), env.default_params)

        def solve(key):
            action, _, _ = solver(obs, state, env.default_params, key,
                                  solver.init_control_params, info)
            return action

        with trace(cfg.trace_dir or None):
            stats = time_blocking(jax.jit(solve), iters=20, warmup=2,
                                  key=jax.random.PRNGKey(1))
            amort = time_chained(jax.jit(solve), jax.random.PRNGKey(1))
        rnd = lambda d: {k: round(v, 6) if isinstance(v, float) else v
                         for k, v in d.items()}
        print(json.dumps({"per_dispatch": rnd(stats),
                          "amortized_per_solve": rnd(amort)}))
        if cfg.trace_dir:
            print(f"profiler trace: {cfg.trace_dir}")
    else:
        raise SystemExit(f"unknown mode {cfg.mode!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Runtime harness: eval protocol parity, render traces, checkpoints, CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv
from covo_mpc_tpu.ops import sampling
from covo_mpc_tpu.runtime import evaluate, evaluate_batched, render_episode
from covo_mpc_tpu.runtime.checkpoint import (
    load_solver_state,
    save_eval_result,
    save_solver_state,
)
from covo_mpc_tpu.runtime.metrics import MetricsLogger, solve_metrics
from covo_mpc_tpu.runtime.render import load_trace, save_trace
from covo_mpc_tpu.solvers import get_solver
from tests.reference_oracle import load_reference

N, H = 16, 4
PSTR = f"N{N}_H{H}_lam0.01"


def make_env():
    return QuadEnv(
        EnvConfig(
            task="tracking",
            enable_randomizer=False,
            disturb_type="gaussian",
            disable_rollover_terminate=True,
            generate_noisy_state=True,
        )
    )


@pytest.mark.skipif(load_reference() is None, reason="reference unavailable")
def test_eval_protocol_parity():
    """Our on-device eval scan == the reference eval loop's RNG chain and
    per-episode errors (reference: quadrotor.py:506-579), 2 trajs x 1 ep.

    Uses PID: sampling controllers at toy N/H crash into the |pos|>3
    auto-reset at fp-sensitive boundaries, which makes 300-step traces
    chaotic; per-solve parity for MPPI/CoVO is pinned separately in
    test_mppi/test_covo. PID still exercises the full eval RNG chain via
    the per-step dyn-noise draws."""
    ref = load_reference()
    env = make_env()
    env_r = ref.envs.quadrotor.Quad3D(
        task="tracking", obs_type="quad", enable_randomizer=False,
        disturb_type="gaussian", disable_rollover_terminate=True,
        generate_noisy_state=True,
    )
    solver, _ = get_solver(env, "pid")
    ctrl_r, _ = ref.envs.quadrotor.get_controller(env_r, "pid")

    num_trajs = 2
    result = evaluate(env, solver, total_steps=600, num_trajs=num_trajs, seed=1)

    # manual reference loop with the same chain (quadrotor.py:517-573)
    rng = jax.random.PRNGKey(1)
    rng, meta = jax.random.split(rng)
    reset_keys = jax.random.split(meta, num_trajs)
    params_r = env_r.default_params
    step_jit = jax.jit(env_r.step)
    errs = []
    for reset_key in reset_keys:
        obs, info, state = env_r.reset(reset_key, params_r)
        rng_control, rng = jax.random.split(rng)
        cp = ctrl_r.reset(state, params_r, ctrl_r.init_control_params, rng_control)
        ep_err = []
        for _ in range(300):
            rng, rng_act, rng_step, _ = jax.random.split(rng, 4)
            action, cp, _ = ctrl_r(obs, state, params_r, rng_act, cp, info)
            obs, state, reward, done, info = step_jit(rng_step, state, action, params_r)
            ep_err.append(float(info["err_pos"]))
            rng, _ = jax.random.split(rng)
        errs.append(np.mean(ep_err))

    np.testing.assert_allclose(np.array(result.err_pos_ep), np.array(errs), atol=2e-3)


def test_evaluate_batched_smoke():
    env = make_env()
    solver, _ = get_solver(env, "pid")
    res = evaluate_batched(env, solver, num_eps=4, seed=0)
    assert res.err_pos_ep.shape == (4,)
    assert np.isfinite(res.mean)
    assert res.mean < 0.5  # PID tracks a Lissajous to well under 50 cm


def test_render_trace_roundtrip(tmp_path):
    env = make_env()
    solver, _ = get_solver(env, "pid")
    trace = render_episode(env, solver, seed=1, steps=50)
    assert trace["pos"].shape == (50, 3)
    assert trace["reward"].shape == (50,)
    # err_pos must be ALIGNED with the same step's pos/pos_tar snapshot
    # (it was recorded from the previous step's carry info through r5,
    # shifting the channel one step against every other field)
    np.testing.assert_allclose(
        trace["err_pos"],
        np.linalg.norm(trace["pos"] - trace["pos_tar"], axis=-1),
        atol=1e-5,
    )
    p = save_trace(trace, str(tmp_path / "trace.npz"))
    loaded = load_trace(p)
    np.testing.assert_allclose(loaded["pos"], trace["pos"])


def test_render_reset_on_done():
    """Mid-recording resets (reference: quadrotor.py:633-640): when an
    episode ends inside the recording, the env params are re-sampled and
    the controller reset — the traces must agree up to the first done and
    diverge after it."""
    from covo_mpc_tpu.models import EnvConfig, QuadEnv

    env = QuadEnv(
        EnvConfig(
            task="tracking", enable_randomizer=True, disturb_type="gaussian",
            disable_rollover_terminate=True, generate_noisy_state=True,
        )
    )
    # shrink the episode so a done lands mid-recording
    short = env.default_params.replace(max_steps_in_episode=10)
    solver, _ = get_solver(env, "mppi", "N8_H3_lam0.01")
    kw = dict(seed=1, steps=25, env_params=short)
    t_plain = render_episode(env, solver, reset_on_done=False, **kw)
    t_reset = render_episode(env, solver, reset_on_done=True, **kw)
    done_at = int(np.argmax(t_plain["done"]))
    assert t_plain["done"][done_at]
    # identical recordings through the first done step...
    np.testing.assert_allclose(t_reset["pos"][: done_at + 1],
                               t_plain["pos"][: done_at + 1])
    np.testing.assert_allclose(t_reset["action"][: done_at + 1],
                               t_plain["action"][: done_at + 1])
    # ...divergent afterwards (new params + controller reset)
    assert not np.allclose(t_reset["action"][done_at + 1:],
                           t_plain["action"][done_at + 1:])
    assert np.isfinite(t_reset["pos"]).all()


def test_plot_episode(tmp_path):
    env = make_env()
    solver, _ = get_solver(env, "pid")
    trace = render_episode(env, solver, seed=1, steps=30)
    # dashboard channel parity (reference: dynamics/utils.py:321-473):
    # the trace must carry the commanded body rate, the disturbance
    # force, and the per-channel action alongside pos/vel/quat
    assert trace["omega_tar"].shape == (30, 3)
    assert trace["f_disturb"].shape == (30, 3)
    assert trace["action"].shape == (30, 4)
    from covo_mpc_tpu.utils.plotting import plot_episode

    out = plot_episode(trace, env.default_params.dt, str(tmp_path / "ep.png"))
    assert os.path.exists(out)


def test_solver_state_checkpoint(tmp_path):
    env = make_env()
    solver, cp = get_solver(env, "mppi", PSTR)
    cp2 = cp.replace(a_mean=cp.a_mean + 0.1)
    p = save_solver_state(cp2, str(tmp_path / "solver.npz"))
    restored = load_solver_state(cp, p)
    np.testing.assert_allclose(restored.a_mean, cp2.a_mean)
    np.testing.assert_allclose(restored.a_cov, cp2.a_cov)


def test_eval_result_checkpoint(tmp_path):
    from covo_mpc_tpu.runtime import EvalResult

    r = EvalResult(err_pos_ep=jnp.array([0.1, 0.2]), mean=0.15, std=0.05)
    p = save_eval_result(r, str(tmp_path / "eval.npz"))
    with np.load(p) as data:
        np.testing.assert_allclose(data["err_pos_ep"], [0.1, 0.2])
        assert float(data["mean"]) == pytest.approx(0.15)


def test_metrics():
    costs = jnp.array([1.0, 2.0, 3.0, 4.0])
    w = jnp.array([0.4, 0.3, 0.2, 0.1])
    m = solve_metrics(costs, w)
    assert float(m["cost_min"]) == 1.0
    assert 1.0 <= float(m["ess"]) <= 4.0
    log = MetricsLogger()
    log.log(0, err=0.1)
    log.log(1, err=0.2)
    assert log.summary()["err"]["last"] == pytest.approx(0.2)


def test_metrics_logger_truncates_previous_run(tmp_path):
    """A fresh logger on an existing path replaces the old records — a
    re-run with the same --name must not accumulate stale JSONL rows."""
    import json

    p = str(tmp_path / "m.jsonl")
    for run in range(2):
        log = MetricsLogger(p)
        log.log(0, err=float(run))
        log.log(1, err=float(run))
        log.close()
    recs = [json.loads(l) for l in open(p)]
    assert len(recs) == 2
    assert all(r["err"] == 1.0 for r in recs)


def test_cli_render_smoke(tmp_path):
    from covo_mpc_tpu import cli

    rc = cli.main(
        [
            "--task", "hovering", "--controller", "mppi", "--debug",
            "--mode", "render", "--noDR", "--name", "smoke",
            "--results-dir", str(tmp_path),
        ]
    )
    assert rc == 0
    assert (tmp_path / "trace_smoke.npz").exists()
    assert (tmp_path / "render_smoke.png").exists()


def test_cli_eval_metrics_jsonl(tmp_path):
    """--metrics wires per-solve health metrics (ESS, cost quantiles, Σ
    conditioning) through the jitted episode scan into a JSONL sink
    (SURVEY §5 metrics row: emitted per solve, not dead code)."""
    import json

    from covo_mpc_tpu import cli

    rc = cli.main(
        [
            "--task", "hovering", "--controller", "covo_online", "--debug",
            "--mode", "eval", "--noDR", "--name", "msmoke", "--metrics",
            "--total-steps", "300", "--results-dir", str(tmp_path),
        ]
    )
    assert rc == 0
    path = tmp_path / "metrics_msmoke.jsonl"
    assert path.exists()
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(recs) == 300  # one record per (episode, solve)
    for key in ("ess", "sigma_cond", "cost_min", "cost_p90", "err_pos"):
        assert all(np.isfinite(r[key]) for r in recs), key
    # debug mode runs N=4 samples: ESS must live in [1, N]
    assert all(1.0 - 1e-6 <= r["ess"] <= 4.0 + 1e-6 for r in recs)


def test_debug_checked_solver():
    from covo_mpc_tpu.runtime.debug import checked_solver, debug_mode

    env = make_env()
    solver, cp = get_solver(env, "mppi", PSTR, rng_mode=sampling.FAST,
                            collect_debug=False)
    obs, info, state = env.reset_env(jax.random.PRNGKey(0), env.default_params)
    solve = checked_solver(solver)
    with debug_mode():
        action, cp2, _ = solve(obs, state, env.default_params,
                               jax.random.PRNGKey(1), cp, info)
    assert np.all(np.isfinite(np.asarray(action)))


def test_time_chained_stats():
    from covo_mpc_tpu.runtime.profiling import time_chained

    stats = time_chained(lambda k: jax.random.normal(k, (8,)),
                         jax.random.PRNGKey(0), iters=3, k=4)
    assert set(stats) >= {"p50", "p90", "p99", "mean", "chained"}
    assert stats["p50"] >= 0.0 and stats["p99"] >= stats["p50"]


def test_evaluate_rejects_subepisode_budget():
    from covo_mpc_tpu.runtime.eval import evaluate

    env = QuadEnv(EnvConfig(task="tracking", enable_randomizer=False,
                            disturb_type="gaussian",
                            disable_rollover_terminate=True,
                            generate_noisy_state=True))
    solver, _ = get_solver(env, "pid", "")
    with pytest.raises(ValueError):
        evaluate(env, solver, total_steps=100)


def test_evaluate_small_budget_uses_fewer_trajs():
    """2 episodes with 4 reset trajectories must run 2 episodes, not 0
    (regression: the reference's loop nesting averages an empty list to
    nan, quadrotor.py:564-573)."""
    from covo_mpc_tpu.runtime.eval import evaluate

    env = QuadEnv(EnvConfig(task="tracking", enable_randomizer=False,
                            disturb_type="gaussian",
                            disable_rollover_terminate=True,
                            generate_noisy_state=True))
    solver, _ = get_solver(env, "pid", "")
    res = evaluate(env, solver, total_steps=600)
    assert res.err_pos_ep.shape == (2,)
    assert np.isfinite(res.mean)


def test_vma_helpers_noop_outside_shard_map():
    from covo_mpc_tpu.utils.vma import match_vma, pvary

    x = jnp.zeros((3, 3))
    ref = jnp.ones((3, 3))
    assert pvary(x, ()) is x
    np.testing.assert_array_equal(match_vma(x, ref), x)

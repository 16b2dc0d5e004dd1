"""Failure-detecting supervisor: protocol parity, checkpoint/resume,
numeric + backend failure recovery (runtime/supervisor.py).

The reference has no failure machinery (its eval loop, quadrotor.py:506-591,
loses everything on interruption); these tests pin the supervisor's added
semantics against `runtime.eval.evaluate` (the reference-parity oracle for
the values) and against injected faults.
"""

import json
import os

import jax
import numpy as np
import pytest

from covo_mpc_tpu.models import EnvConfig, QuadEnv
from covo_mpc_tpu.runtime import evaluate, evaluate_batched
from covo_mpc_tpu.runtime.supervisor import (
    CellStore,
    run_supervised,
    run_supervised_batched,
)
from covo_mpc_tpu.solvers import get_solver
from covo_mpc_tpu.solvers.pid import PIDParams, PIDSolver


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


def test_supervised_matches_evaluate(tmp_path):
    """Chunked supervised run == the monolithic evaluate scan, bitwise —
    including a ragged tail chunk (4 eps in chunks of 3)."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ref = evaluate(env, solver, total_steps=1200, seed=1)
    sup = run_supervised(
        env, solver, total_steps=1200, seed=1,
        checkpoint_dir=str(tmp_path / "ckpt"), chunk_episodes=3,
    )
    np.testing.assert_array_equal(
        np.asarray(sup.err_pos_ep, np.float32), np.asarray(ref.err_pos_ep)
    )
    assert sup.mean == pytest.approx(ref.mean, rel=1e-6)
    assert not sup.failed.any()
    # checkpoint artifacts exist and record completion
    with open(tmp_path / "ckpt" / "manifest.json") as fh:
        assert json.load(fh)["completed"] == 2


def test_backend_failure_retry_then_success(tmp_path):
    """A transient dispatch failure is retried and the run completes with
    the same values as an undisturbed one."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ref = evaluate(env, solver, total_steps=900, seed=3)
    boom = {"armed": True}

    def hook(chunk, attempt):
        if chunk == 1 and attempt == 0 and boom.pop("armed", False):
            raise RuntimeError("injected tunnel outage")

    sup = run_supervised(
        env, solver, total_steps=900, seed=3,
        checkpoint_dir=str(tmp_path / "ckpt"), chunk_episodes=1,
        _fault_hook=hook,
    )
    np.testing.assert_array_equal(
        np.asarray(sup.err_pos_ep, np.float32), np.asarray(ref.err_pos_ep)
    )
    kinds = [e["kind"] for e in sup.events]
    assert "backend_failure" in kinds


def test_crash_then_resume(tmp_path):
    """Retries exhausted -> RuntimeError AFTER checkpointing; re-invoking
    the same protocol resumes at the failed chunk and the final result is
    identical to an uninterrupted run."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ckpt = str(tmp_path / "ckpt")

    def hook(chunk, attempt):
        if chunk == 1:
            raise RuntimeError("persistent outage")

    with pytest.raises(RuntimeError, match="re-run the same command"):
        run_supervised(
            env, solver, total_steps=1200, seed=5, checkpoint_dir=ckpt,
            chunk_episodes=2, max_retries=1, _fault_hook=hook,
        )
    # events recorded on disk for post-mortem
    with open(os.path.join(ckpt, "events.jsonl")) as fh:
        events = [json.loads(line) for line in fh]
    assert sum(e["kind"] == "backend_failure" for e in events) == 2

    sup = run_supervised(
        env, solver, total_steps=1200, seed=5, checkpoint_dir=ckpt,
        chunk_episodes=2,
    )
    assert sup.resumed_at_chunk == 1
    ref = evaluate(env, solver, total_steps=1200, seed=5)
    np.testing.assert_array_equal(
        np.asarray(sup.err_pos_ep, np.float32), np.asarray(ref.err_pos_ep)
    )


def test_mismatched_checkpoint_refused(tmp_path):
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ckpt = str(tmp_path / "ckpt")
    run_supervised(env, solver, total_steps=600, seed=1,
                   checkpoint_dir=ckpt, chunk_episodes=2)
    with pytest.raises(ValueError, match="different protocol"):
        run_supervised(env, solver, total_steps=600, seed=2,
                       checkpoint_dir=ckpt, chunk_episodes=2)


def test_numeric_failure_excluded(tmp_path):
    """A diverged (non-finite) solve is detected, recorded, and excluded
    from the summary instead of silently averaged (the reference would
    print nan, quadrotor.py:577-579)."""
    env = make_env()
    nan_solver = PIDSolver(
        env, PIDParams(Kp=float("nan"), Kd=5.0, Ki=0.0, Kp_att=10.0)
    )
    sup = run_supervised(
        env, nan_solver, total_steps=600, seed=1,
        checkpoint_dir=str(tmp_path / "ckpt"), chunk_episodes=1,
        max_retries=1,
    )
    assert sup.failed.all()
    assert np.isnan(sup.mean)
    assert any(e["kind"] == "numeric_failure" for e in sup.events)
    assert "FAILED" in sup.summary()


def test_non_divisible_total_matches_evaluate(tmp_path):
    """total_steps not divisible by num_trajs*episode: the supervisor runs
    the SAME effective episode count evaluate() truncates to (advisor r4:
    the old sizing crashed the tail chunk with a broadcast error, and the
    crash recurred identically on resume)."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    # 5 episodes' worth of steps, 4 trajectories -> evaluate runs 4
    ref = evaluate(env, solver, total_steps=1500, seed=1)
    sup = run_supervised(
        env, solver, total_steps=1500, seed=1,
        checkpoint_dir=str(tmp_path / "ckpt"), chunk_episodes=3,
    )
    assert sup.err_pos_ep.shape == ref.err_pos_ep.shape == (4,)
    np.testing.assert_array_equal(
        np.asarray(sup.err_pos_ep, np.float32), np.asarray(ref.err_pos_ep)
    )


def test_batched_supervised_matches_evaluate_batched(tmp_path):
    """Chunked batched supervision reproduces evaluate_batched per-episode
    values (tolerance: the chunk's vmap width IS the program shape, so
    fusion may differ by ulps) including a ragged tail chunk."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ref = evaluate_batched(env, solver, num_eps=5, seed=2)
    sup = run_supervised_batched(
        env, solver, num_eps=5, seed=2,
        checkpoint_dir=str(tmp_path / "ckpt"), chunk_episodes=2,
    )
    np.testing.assert_allclose(
        np.asarray(sup.err_pos_ep), np.asarray(ref.err_pos_ep),
        rtol=1e-5, atol=1e-7,
    )
    assert not sup.failed.any()
    with open(tmp_path / "ckpt" / "manifest.json") as fh:
        m = json.load(fh)
    assert m["completed"] == 3 and m["protocol"] == "batched"


def test_batched_crash_then_resume(tmp_path):
    """kill mid-run -> resume completes the remaining chunks only, and the
    final result is bitwise-identical to an uninterrupted supervised run
    (same chunk programs, chunks independent in the batched protocol)."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    ckpt = str(tmp_path / "ckpt")
    ref = run_supervised_batched(env, solver, num_eps=6, seed=4,
                                 chunk_episodes=2)

    def hook(chunk, attempt):
        if chunk == 2:
            raise RuntimeError("persistent outage")

    with pytest.raises(RuntimeError, match="re-run the same command"):
        run_supervised_batched(
            env, solver, num_eps=6, seed=4, checkpoint_dir=ckpt,
            chunk_episodes=2, max_retries=0, _fault_hook=hook,
        )
    sup = run_supervised_batched(
        env, solver, num_eps=6, seed=4, checkpoint_dir=ckpt,
        chunk_episodes=2,
    )
    assert sup.resumed_at_chunk == 2
    np.testing.assert_array_equal(
        np.asarray(sup.err_pos_ep), np.asarray(ref.err_pos_ep)
    )


def test_cell_store_resumes_matrix(tmp_path):
    """A sweep interrupted mid-matrix resumes without recomputing finished
    cells; a fingerprint change invalidates exactly that cell."""
    store = CellStore(str(tmp_path / "sweep"))
    calls = []

    def run_matrix(store, fail_at=None):
        out = {}
        for cell in ("a", "b", "c"):
            def fn(ckpt_dir, cell=cell):
                calls.append(cell)
                if cell == fail_at:
                    raise RuntimeError("tunnel outage")
                assert ckpt_dir.startswith(store.root)
                return {"mean": {"a": 1.0, "b": 2.0, "c": 3.0}[cell]}

            out[cell], _ = store.run_cell(cell, "fp1", fn)
        return out

    with pytest.raises(RuntimeError):
        run_matrix(store, fail_at="c")
    assert calls == ["a", "b", "c"]

    # resume IN A FRESH PROCESS (fresh store over the same root): a and b
    # come from cells.json, only c recomputes
    store2 = CellStore(str(tmp_path / "sweep"))
    out = run_matrix(store2)
    assert calls == ["a", "b", "c", "c"]
    assert out == {"a": {"mean": 1.0}, "b": {"mean": 2.0}, "c": {"mean": 3.0}}

    # fingerprint change -> that cell recomputes
    v, cached = store2.run_cell("b", "fp2", lambda d: {"mean": 9.0})
    assert v == {"mean": 9.0} and not cached
    assert store2.get("b", "fp1") is None
    assert CellStore(str(tmp_path / "sweep")).get("a", "fp1") == {"mean": 1.0}


def test_cell_store_clears_stale_checkpoint_on_fingerprint_change(tmp_path):
    """A fingerprint change with a STALE per-cell run_supervised
    checkpoint on disk must recompute, not crash: _try_resume refuses a
    manifest from a different protocol with ValueError, which would
    abort a multi-hour sweep mid-matrix (r5 review finding)."""
    env = make_env()
    solver, _ = get_solver(env, "pid")
    store = CellStore(str(tmp_path / "sweep"))

    def cell(fp):
        def fn(ckpt_dir):
            res = run_supervised(env, solver, total_steps=600,
                                 checkpoint_dir=ckpt_dir, chunk_episodes=1,
                                 fingerprint=fp)
            return {"mean": float(res.mean)}
        return fn

    v1, cached1 = store.run_cell("x", "fpA", cell("fpA"))
    assert not cached1
    # config changed (e.g. --quick toggles steps=): the finished
    # checkpoint under root/x belongs to fpA — must be cleared and the
    # cell re-measured under fpB, not ValueError'd
    v2, cached2 = store.run_cell("x", "fpB", cell("fpB"))
    assert not cached2
    assert v2 == v1  # same protocol here, so same value either way

    # a protocol field the fingerprint does NOT encode (here: seed)
    # changes — _try_resume's refusal must be caught, the checkpoint
    # cleared, and the cell recomputed once (not abort the sweep)
    store.drop("x")  # memo miss, checkpoint for fpB/seed=1 left on disk
    def fn_seed2(ckpt_dir):
        res = run_supervised(env, solver, total_steps=600, seed=2,
                             checkpoint_dir=ckpt_dir, chunk_episodes=1,
                             fingerprint="fpB")
        return {"mean": float(res.mean)}
    v3, cached3 = store.run_cell("x", "fpB", fn_seed2)
    assert not cached3 and np.isfinite(v3["mean"])


def test_probe_gates_retry():
    """probe() returning False skips pointless retries (tunnel known-down)."""
    env = make_env()
    solver, _ = get_solver(env, "pid")

    def hook(chunk, attempt):
        raise RuntimeError("outage")

    calls = []
    with pytest.raises(RuntimeError):
        run_supervised(
            env, solver, total_steps=600, seed=1, chunk_episodes=2,
            max_retries=3, probe=lambda: calls.append(1) or False,
            _fault_hook=hook,
        )
    assert len(calls) == 1  # first failure probed once, then gave up

"""Failure-detecting, checkpointed evaluation — elastic recovery for long runs.

The reference has no failure story: its eval loop (reference:
quadjax/envs/quadrotor.py:506-591) is a host Python loop that loses all
progress on any interruption and silently averages NaNs into the result if
a solve diverges. On this deployment target two real failure modes exist:

  * the remote TPU tunnel drops mid-run (observed on this machine — the
    backend raises from a dispatch, sometimes for hours), and
  * a numeric failure (non-finite solver state) poisons an episode.

``run_supervised`` runs the exact ``runtime.eval.evaluate`` protocol as a
sequence of CHUNKED jitted programs instead of one monolithic scan, and
around each chunk adds the three recovery layers a production run needs:

  1. **Checkpoint/resume** — after every chunk the RNG carry, the partial
     per-episode results, and a manifest land in ``checkpoint_dir``; a
     re-invocation with the same protocol parameters resumes at the first
     incomplete chunk (bit-identical final result — the protocol's RNG
     chain is threaded through the checkpoint). Interrupt-kill the process
     at any point and no completed episode is recomputed.
  2. **Numeric failure detection** — a chunk whose episode errors come back
     non-finite is retried (covers transient transport corruption); a
     deterministic failure is recorded per-episode in a ``failed`` mask and
     EXCLUDED from the summary statistics instead of silently averaged.
  3. **Backend failure detection** — an exception out of a chunk dispatch
     (tunnel down, backend lost) is retried with backoff via an optional
     ``probe`` callback; if retries exhaust, the run raises AFTER
     checkpointing, and the same command resumes where it stopped. (An
     in-process axon backend cannot be re-initialized once wedged — see
     CLAUDE.md — so cross-process resume IS the recovery path.)

Every event is appended to ``checkpoint_dir/events.jsonl`` for post-mortem.

Chunking preserves the protocol values exactly: ``evaluate`` scans
``ep_step`` over the reset sequence with an RNG carry, and a scan over a
partition of that sequence with the carry threaded between chunks computes
the same chain (pinned against ``evaluate`` in tests/test_supervisor.py).

``run_supervised_batched`` is the same recovery machinery over the
throughput protocol (``runtime.eval.evaluate_batched`` — independent
per-episode keys, vmapped), chunked over episode blocks with per-episode
failure masks.

``CellStore`` lifts recovery to MATRIX level for the sweep scripts
(scripts/mode_gates.py, n_ablation.py, paper_results.py): each (config
cell) records its finished summary in ``root/cells.json``, so a matrix
interrupted between cells resumes without recomputing a finished cell,
and each in-flight cell's episodes resume from its own per-cell
``run_supervised`` checkpoint. These sweeps are the runs that actually
hit multi-hour tunnel outages on this deployment.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from covo_mpc_tpu.runtime.episode import make_episode_runner
from covo_mpc_tpu.runtime.eval import EvalResult

_MANIFEST = "manifest.json"
_STATE = "state.npz"
_EVENTS = "events.jsonl"


@dataclasses.dataclass
class SupervisedResult(EvalResult):
    failed: Optional[np.ndarray] = None  # (num_eps,) bool — excluded episodes
    events: Optional[list] = None  # recovery-event records
    resumed_at_chunk: int = 0  # 0 = fresh run

    def summary(self) -> str:
        base = super().summary()
        n_fail = int(self.failed.sum()) if self.failed is not None else 0
        if n_fail:
            base += f" ({n_fail} episode(s) FAILED and excluded)"
        return base


class _EventLog:
    def __init__(self, path: Optional[str]):
        self._fh = open(path, "a") if path else None
        self.records = []

    def emit(self, kind: str, **detail):
        rec = {"ts": time.time(), "kind": kind, **detail}
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()


def _save_state(ckpt_dir, manifest, rng, err_pos, failed, completed):
    """Crash-atomic checkpoint commit.

    state.npz is the AUTHORITATIVE artifact: it carries `completed`
    alongside the arrays and is written tmp + os.replace, so a kill at
    any instant leaves either the previous consistent checkpoint or the
    new one — never a truncated npz or a carry that disagrees with its
    completed count (r5 review finding: the old in-place savez +
    manifest-carries-completed ordering had both failure windows). The
    manifest keeps a copy of `completed` for humans/old readers, but
    resume trusts the npz."""
    spath = os.path.join(ckpt_dir, _STATE)
    stmp = spath + ".tmp"
    with open(stmp, "wb") as fh:
        np.savez(
            fh,
            rng=np.asarray(rng),
            err_pos=err_pos,
            failed=failed,
            completed=np.asarray(completed, np.int64),
        )
    os.replace(stmp, spath)  # atomic cutover — the commit point
    manifest = dict(manifest, completed=completed)
    tmp = os.path.join(ckpt_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(ckpt_dir, _MANIFEST))


def _try_resume(ckpt_dir, manifest, log):
    """Load a matching checkpoint; mismatched protocols refuse loudly."""
    mpath = os.path.join(ckpt_dir, _MANIFEST)
    spath = os.path.join(ckpt_dir, _STATE)
    if not (os.path.exists(mpath) and os.path.exists(spath)):
        return None
    with open(mpath) as fh:
        on_disk = json.load(fh)
    completed = on_disk.pop("completed", 0)
    if on_disk != manifest:
        raise ValueError(
            f"checkpoint at {ckpt_dir} belongs to a different protocol "
            f"({on_disk} != {manifest}); pass a fresh --checkpoint-dir"
        )
    with np.load(spath) as data:
        # the npz's completed is authoritative (committed atomically
        # WITH the carry); the manifest copy covers pre-r5 checkpoints
        if "completed" in data:
            completed = int(data["completed"])
        state = (
            jnp.asarray(data["rng"]),
            data["err_pos"].copy(),
            data["failed"].copy(),
        )
    log.emit("resume", completed_chunks=completed)
    return completed, state


def run_supervised(
    env,
    controller,
    total_steps: int = 12000,
    num_trajs: int = 4,
    seed: int = 1,
    checkpoint_dir: Optional[str] = None,
    chunk_episodes: int = 4,
    max_retries: int = 2,
    backoff_s: float = 0.0,
    probe: Optional[Callable[[], bool]] = None,
    fingerprint: str = "",
    _fault_hook: Optional[Callable[[int, int], None]] = None,
) -> SupervisedResult:
    """``runtime.eval.evaluate`` with checkpoint/resume + failure recovery.

    Args:
      checkpoint_dir: where chunk checkpoints live; None disables
        persistence (detection/retry still run).
      chunk_episodes: episodes per jitted chunk — the recovery granularity.
        Chunks share one compiled program; a smaller ragged tail chunk
        compiles once more.
      max_retries: per-chunk retries for numeric or backend failures.
      backoff_s: sleep between backend-failure retries.
      probe: optional health check called before a backend retry; returning
        False skips the retry and raises immediately (e.g. bench.py's
        subprocess TPU probe).
      fingerprint: caller-supplied config digest folded into the manifest so
        a checkpoint is never resumed under a different solver/env setup.
      _fault_hook: test-only injection point, called as (chunk, attempt)
        inside the dispatch try-block so a raise exercises the
        backend-failure path without a real tunnel outage.
    """
    max_steps = env.default_params.max_steps_in_episode
    num_eps = int(total_steps // max_steps)
    if num_eps < 1:
        raise ValueError(f"total_steps={total_steps} is less than one episode")
    num_trajs = min(num_trajs, num_eps)
    reps = num_eps // num_trajs
    # evaluate()'s scan runs exactly num_trajs*reps episodes (reset_seq
    # length); adopt the same effective count so a non-divisible
    # total_steps neither crashes the tail chunk (err_pos was sized by the
    # truncated-away episodes) nor diverges from the parity oracle
    num_eps = num_trajs * reps
    run_one_ep = make_episode_runner(env, controller)

    # identical protocol prologue to runtime.eval.evaluate
    rng = jax.random.PRNGKey(seed)
    rng, rng_reset_meta = jax.random.split(rng)
    reset_keys = jax.random.split(rng_reset_meta, num_trajs)
    reset_seq = jnp.repeat(reset_keys, reps, axis=0)  # (num_eps, key)

    def ep_step(rng, rng_reset):
        rng_out, err_pos, _, _ = run_one_ep(rng_reset, rng)
        return rng_out, err_pos.mean()

    @jax.jit
    def run_chunk(rng, chunk_resets):
        return lax.scan(ep_step, rng, chunk_resets)

    manifest = {
        "seed": seed,
        "num_eps": num_eps,
        "num_trajs": num_trajs,
        "chunk_episodes": chunk_episodes,
        "fingerprint": fingerprint,
    }
    chunk_inputs = lambda lo, hi: reset_seq[lo:hi]
    return _run_chunked(
        run_chunk, chunk_inputs, rng, num_eps, chunk_episodes, manifest,
        checkpoint_dir, max_retries, backoff_s, probe, _fault_hook,
    )


def _run_chunked(
    run_chunk,
    chunk_inputs,
    carry,
    num_eps,
    chunk_episodes,
    manifest,
    checkpoint_dir,
    max_retries,
    backoff_s,
    probe,
    _fault_hook,
) -> SupervisedResult:
    """The recovery loop shared by the sequential and batched protocols.

    ``run_chunk(carry, inputs) -> (carry, errs)`` is the jitted chunk
    program; ``chunk_inputs(lo, hi)`` supplies its per-chunk inputs; the
    carry (an RNG chain, or a dummy for carry-free protocols) is threaded
    between chunks and through the checkpoint.
    """
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    log = _EventLog(
        os.path.join(checkpoint_dir, _EVENTS) if checkpoint_dir else None
    )
    err_pos = np.full((num_eps,), np.nan, np.float64)
    failed = np.zeros((num_eps,), bool)
    start_chunk = 0
    starts = list(range(0, num_eps, chunk_episodes))
    if checkpoint_dir:
        resumed = _try_resume(checkpoint_dir, manifest, log)
        if resumed is not None:
            start_chunk, (carry, err_pos, failed) = resumed

    resumed_at = start_chunk
    try:
        for ci in range(start_chunk, len(starts)):
            lo = starts[ci]
            hi = min(lo + chunk_episodes, num_eps)
            chunk_in = chunk_inputs(lo, hi)
            carry_in = carry  # retries re-run the chunk from the same carry
            for attempt in range(max_retries + 1):
                try:
                    if _fault_hook is not None:
                        _fault_hook(ci, attempt)
                    carry_out, errs = run_chunk(carry_in, chunk_in)
                    errs = np.asarray(errs, np.float64)
                    # force the transfer — block_until_ready is a no-op on
                    # the tunneled backend (CLAUDE.md)
                    carry_out = jnp.asarray(np.asarray(carry_out))
                except Exception as e:  # noqa: BLE001 — backend failure path
                    log.emit("backend_failure", chunk=ci, attempt=attempt,
                             error=f"{type(e).__name__}: {e}"[:300])
                    if attempt >= max_retries or (
                        probe is not None and not probe()
                    ):
                        raise RuntimeError(
                            f"chunk {ci} failed after {attempt + 1} "
                            f"attempt(s); progress through chunk {ci - 1} "
                            f"is checkpointed"
                            + (
                                f" in {checkpoint_dir} — re-run the same "
                                f"command to resume"
                                if checkpoint_dir
                                else " (no checkpoint_dir — pass one to "
                                "make this resumable)"
                            )
                        ) from e
                    if backoff_s:
                        time.sleep(backoff_s * (attempt + 1))
                    continue
                if np.isfinite(errs).all():
                    break
                bad = [int(lo + i) for i in np.flatnonzero(~np.isfinite(errs))]
                log.emit("numeric_failure", chunk=ci, attempt=attempt,
                         episodes=bad)
            else:
                # retries exhausted on numeric failure: deterministic — mark
                # and move on with the carry the chunk produced
                failed[lo:hi] = ~np.isfinite(errs)
            err_pos[lo:hi] = errs
            carry = carry_out
            if checkpoint_dir:
                _save_state(checkpoint_dir, manifest, carry, err_pos, failed,
                            completed=ci + 1)
            log.emit("chunk_done", chunk=ci, episodes=[int(lo), int(hi)])
    finally:
        log.close()

    ok = ~failed & np.isfinite(err_pos)
    mean = float(err_pos[ok].mean()) if ok.any() else float("nan")
    std = float(err_pos[ok].std()) if ok.any() else float("nan")
    return SupervisedResult(
        err_pos_ep=jnp.asarray(err_pos),
        mean=mean,
        std=std,
        failed=failed,
        events=log.records,
        resumed_at_chunk=resumed_at,
    )


def run_supervised_batched(
    env,
    controller,
    num_eps: int = 40,
    seed: int = 1,
    env_params=None,
    checkpoint_dir: Optional[str] = None,
    chunk_episodes: int = 8,
    max_retries: int = 2,
    backoff_s: float = 0.0,
    probe: Optional[Callable[[], bool]] = None,
    fingerprint: str = "",
    _fault_hook: Optional[Callable[[int, int], None]] = None,
) -> SupervisedResult:
    """``runtime.eval.evaluate_batched`` with checkpoint/resume + recovery.

    The batched protocol has NO cross-episode RNG chain (independent
    per-episode fold-in keys), so chunks over episode blocks are exactly
    independent: each chunk vmaps its block with the block's own keys, and
    the per-episode failure mask lands per block. A dummy carry keeps the
    checkpoint format shared with ``run_supervised``.

    Value parity with ``evaluate_batched`` is per-episode up to XLA
    fusion at a different vmap width (the batch size IS the program
    shape); resume parity with an uninterrupted supervised run is exact
    (pinned in tests/test_supervisor.py).
    """
    run_one_ep = make_episode_runner(env, controller)
    base = jax.random.PRNGKey(seed)
    reset_keys = jax.random.split(jax.random.fold_in(base, 0), num_eps)
    run_keys = jax.random.split(jax.random.fold_in(base, 1), num_eps)

    @jax.jit
    def run_chunk(carry, chunk_keys):
        kr, k = chunk_keys
        _, err_pos, _, _ = jax.vmap(lambda a, b: run_one_ep(a, b, env_params))(
            kr, k
        )
        return carry, err_pos.mean(axis=1)

    manifest = {
        "seed": seed,
        "num_eps": num_eps,
        "chunk_episodes": chunk_episodes,
        "fingerprint": fingerprint,
        "protocol": "batched",
    }
    chunk_inputs = lambda lo, hi: (reset_keys[lo:hi], run_keys[lo:hi])
    return _run_chunked(
        run_chunk, chunk_inputs, jax.random.PRNGKey(0), num_eps,
        chunk_episodes, manifest, checkpoint_dir, max_retries, backoff_s,
        probe, _fault_hook,
    )


class CellStore:
    """Matrix-level resume for multi-cell sweep scripts.

    A sweep (gate matrix, N-ablation, paper table) is a list of config
    cells, each minutes-to-hours of TPU time. The store records every
    finished cell's summary in ``root/cells.json`` (atomic replace) keyed
    by (cell key, config fingerprint); re-running the same sweep skips
    finished cells, and the in-flight cell resumes from its own per-cell
    ``run_supervised`` checkpoint under ``root/<key>/``. A fingerprint
    change invalidates that cell only (stale entry dropped on ``put``).
    """

    _CELLS = "cells.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, self._CELLS)
        self._cells = {}
        if os.path.exists(self._path):
            with open(self._path) as fh:
                self._cells = json.load(fh)

    @staticmethod
    def _slug(key: str) -> str:
        """Filesystem-safe UNIQUE directory name for a cell key.

        The readable prefix maps unsafe chars to '_', which can collide
        ('covo N=8' vs 'covo_N.8'); a short hash of the raw key keeps
        distinct keys on distinct dirs so one cell's stale-checkpoint
        clearing can never destroy another cell's in-flight episode
        checkpoint (r5 review finding)."""
        import hashlib

        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return f"{safe}-{hashlib.sha1(key.encode()).hexdigest()[:8]}"

    def cell_dir(self, key: str) -> str:
        return os.path.join(self.root, self._slug(key))

    def get(self, key: str, fingerprint: str):
        rec = self._cells.get(key)
        if rec is not None and rec.get("fingerprint") == fingerprint:
            return rec["value"]
        return None

    def put(self, key: str, fingerprint: str, value) -> None:
        self._cells[key] = {"fingerprint": fingerprint, "value": value}
        self._flush()

    def drop(self, key: str, clear_checkpoint: bool = False) -> None:
        """Forget a finished cell (e.g. --fresh re-measurement).

        ``clear_checkpoint=True`` also deletes the cell's episode-level
        checkpoint state so the re-run actually recomputes (a completed
        run_supervised checkpoint would otherwise just resume-at-end)."""
        if self._cells.pop(key, None) is not None:
            self._flush()
        if clear_checkpoint:
            d = self.cell_dir(key)
            for f in (_MANIFEST, _STATE):
                p = os.path.join(d, f)
                if os.path.exists(p):
                    os.remove(p)

    def _flush(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._cells, fh, indent=1)
        os.replace(tmp, self._path)

    def run_cell(self, key: str, fingerprint: str, fn):
        """Memoized cell execution: ``fn(checkpoint_dir) -> json-able``.

        Returns ``(value, was_cached)``; on a miss, runs ``fn`` with the
        cell's private checkpoint dir (pass it to ``run_supervised`` /
        ``run_supervised_batched`` for episode-level resume) and records
        the result.
        """
        cached = self.get(key, fingerprint)
        if cached is not None:
            return cached, True
        # a memo miss with a STALE per-cell checkpoint (the fingerprint
        # changed — e.g. a --quick toggle alters steps=, or the kernel
        # code changed) must recompute, not crash: run_supervised's
        # _try_resume refuses a manifest from a different protocol with
        # ValueError, which would abort the whole sweep mid-matrix.
        # Clear a fingerprint-mismatched checkpoint up front, and — for
        # protocol fields the fingerprint does not encode (seed,
        # chunk_episodes, num_trajs; review finding) — also catch the
        # refusal itself, clear, and retry ONCE.
        d = self.cell_dir(key)
        mpath = os.path.join(d, _MANIFEST)

        def clear_ckpt():
            for f in (_MANIFEST, _STATE):
                p = os.path.join(d, f)
                if os.path.exists(p):
                    os.remove(p)

        if os.path.exists(mpath):
            try:
                with open(mpath) as fh:
                    stale = json.load(fh).get("fingerprint") != fingerprint
            except (OSError, ValueError):
                stale = True  # unreadable manifest: also clear
            if stale:
                clear_ckpt()
        try:
            value = fn(d)
        except ValueError as e:
            if "different protocol" not in str(e):
                raise
            clear_ckpt()
            value = fn(d)
        self.put(key, fingerprint, value)
        return value, False

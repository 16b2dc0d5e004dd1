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
    np.savez(
        os.path.join(ckpt_dir, _STATE),
        rng=np.asarray(rng),
        err_pos=err_pos,
        failed=failed,
    )
    manifest = dict(manifest, completed=completed)
    tmp = os.path.join(ckpt_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(ckpt_dir, _MANIFEST))  # atomic cutover


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
            start_chunk, (rng, err_pos, failed) = resumed

    resumed_at = start_chunk
    try:
        for ci in range(start_chunk, len(starts)):
            lo = starts[ci]
            hi = min(lo + chunk_episodes, num_eps)
            chunk_resets = reset_seq[lo:hi]
            rng_in = rng  # retries re-run the chunk from the same carry
            for attempt in range(max_retries + 1):
                try:
                    if _fault_hook is not None:
                        _fault_hook(ci, attempt)
                    rng_out, errs = run_chunk(rng_in, chunk_resets)
                    errs = np.asarray(errs, np.float64)
                    # force the transfer — block_until_ready is a no-op on
                    # the tunneled backend (CLAUDE.md)
                    rng_out = jnp.asarray(np.asarray(rng_out))
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
            rng = rng_out
            if checkpoint_dir:
                _save_state(checkpoint_dir, manifest, rng, err_pos, failed,
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

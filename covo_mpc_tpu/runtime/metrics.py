"""Solve-quality metrics + lightweight run logging.

The reference's observability is print statements and two debug fields
(SURVEY.md §5). Here every solve can report a structured record: cost
quantiles, effective sample size of the importance weights, and Σ
conditioning — the quantities that tell you whether a sampling-based MPC
is actually healthy.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax.numpy as jnp


def solve_metrics(costs: jnp.ndarray, weights: jnp.ndarray) -> dict:
    """Per-solve health metrics (all scalars, cheap to compute on device)."""
    return {
        "cost_min": jnp.min(costs),
        "cost_mean": jnp.mean(costs),
        "cost_p90": jnp.quantile(costs, 0.9),
        # effective sample size of the exponential weights: 1 / sum(w^2);
        # N means uniform (lambda too large), 1 means collapse (too small)
        "ess": 1.0 / jnp.sum(weights**2),
    }


def solve_metrics_sharded(costs, weights, axis, n_total) -> dict:
    """:func:`solve_metrics` from inside shard_map: each shard holds its
    slice of the sample axis; the global statistics are assembled from
    psum/pmin/pmax of shard-local partials (a handful of scalars on the
    wire — the same sufficient-statistics pattern as the solve itself,
    parallel/sharded.py). ``weights`` must already be globally normalized.
    The exact global p90 needs a full sort and is replaced by cost_max —
    min/mean/max bracket the cost distribution at collective cost O(1).
    """
    from jax import lax

    if axis is None:
        return {
            "cost_min": jnp.min(costs),
            "cost_mean": jnp.mean(costs),
            "cost_max": jnp.max(costs),
            "ess": 1.0 / jnp.sum(weights**2),
        }
    return {
        "cost_min": lax.pmin(jnp.min(costs), axis),
        "cost_mean": lax.psum(jnp.sum(costs), axis) / n_total,
        "cost_max": lax.pmax(jnp.max(costs), axis),
        "ess": 1.0 / lax.psum(jnp.sum(weights**2), axis),
    }


def sigma_metrics(a_cov: jnp.ndarray) -> dict:
    """Conditioning of the sampling covariance (CoVO Σ health)."""
    eigs = jnp.linalg.eigvalsh(a_cov)
    return {
        "sigma_cond": eigs[-1] / jnp.maximum(eigs[0], 1e-12),
        "sigma_logdet": jnp.sum(jnp.log(jnp.maximum(eigs, 1e-12))),
    }


class MetricsLogger:
    """JSONL metrics sink with wall-clock stamps.

    The file is opened once at the first ``log`` (truncating any previous
    run's records — re-running an eval with the same ``--name`` must not
    accumulate stale rows) and kept open across records; call ``close``
    (or rely on interpreter teardown) to flush.
    """

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []
        self._fh = None

    def log(self, step: int, **values):
        rec = {"step": step, "t": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self.records.append(rec)
        if self.path:
            if self._fh is None:
                self._fh = open(self.path, "w")
            self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def summary(self) -> dict:
        if not self.records:
            return {}
        keys = [k for k in self.records[-1] if k not in ("step", "t")]
        out = {}
        for k in keys:
            vals = [r[k] for r in self.records if k in r]
            out[k] = {"mean": sum(vals) / len(vals), "last": vals[-1]}
        return out

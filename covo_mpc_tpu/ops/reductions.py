"""Cross-sample reductions: exponential weighting and distribution updates.

Single-device forms live here; their cross-shard (psum/pmin) counterparts
are assembled in :mod:`covo_mpc_tpu.parallel.sharded` from the same
building blocks, so the math is written once.

Semantics follow the reference update rules
(reference: quadjax/controllers/mppi.py:106-126, covo.py:263-275).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mppi_weights(costs: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Softmax weights ``exp(-(c - min c)/λ) / Σ`` (reference: mppi.py:109-111)."""
    shifted = jnp.exp(-(costs - jnp.min(costs)) / lam)
    return shifted / jnp.sum(shifted)


def weights_from_stats(
    costs: jnp.ndarray, min_cost: jnp.ndarray, lam: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharding-friendly split of :func:`mppi_weights`: given the GLOBAL
    minimum cost, return (unnormalized weights, local normalizer). Shards
    psum the normalizer and divide locally."""
    unnorm = jnp.exp(-(costs - min_cost) / lam)
    return unnorm, jnp.sum(unnorm)

def mean_update(
    weight: jnp.ndarray,  # (N,), sums to 1 globally
    a_sampled: jnp.ndarray,  # (N, H, dA)
    a_mean: jnp.ndarray,  # (H, dA)
    gamma_mean,
) -> jnp.ndarray:
    """Weighted-mean blend (reference: mppi.py:114-118)."""
    weighted = jnp.einsum("n,nhd->hd", weight, a_sampled)
    return weighted * gamma_mean + a_mean * (1.0 - gamma_mean)


def cov_update(
    weight: jnp.ndarray,  # (N,)
    a_sampled: jnp.ndarray,  # (N, H, dA)
    a_mean_new: jnp.ndarray,  # (H, dA) — the UPDATED mean (reference quirk)
    a_cov: jnp.ndarray,  # (H, dA, dA)
    gamma_sigma,
) -> jnp.ndarray:
    """Weighted per-step covariance blend (reference: mppi.py:119-125).

    The reference centers deviations on the freshly updated mean.
    gamma_sigma stays a runtime value (not static) for API parity, but the
    paper configuration sets it to 0 — where the blend is the identity —
    so the reduction sits behind a lax.cond: the weighted-covariance pass
    re-reads the full (N, H, dA) action tensor from HBM, and skipping it
    at runtime measured 0.086 → 0.074 ms end-to-end on the MPPI
    kernel-rng solve (stage ceiling 0.013 ms, scripts/mppi_ab.py; quality
    re-checked unchanged). Under a batched-params vmap the cond lowers to
    a select and both branches run — no savings there, no regression
    either.
    """

    def blended(_):
        dev = a_sampled - a_mean_new[None]
        weighted = jnp.einsum("n,nhi,nhj->hij", weight, dev, dev)
        return weighted * gamma_sigma + a_cov * (1.0 - gamma_sigma)

    return jax.lax.cond(gamma_sigma == 0.0, lambda _: a_cov, blended, None)


# --- kernel-layout (sample-axis-last) twins: same math on (H, dA, N) /
# --- (D, N) samples, avoiding the action-tensor transpose on the fused
# --- Pallas fast path (ops/sampling.sample_*_t) ------------------------


def mean_update_t(weight, a_t, a_mean, gamma_mean):
    """:func:`mean_update` on (H, dA, N) samples."""
    weighted = jnp.einsum("n,hdn->hd", weight, a_t)
    return weighted * gamma_mean + a_mean * (1.0 - gamma_mean)


def cov_update_t(weight, a_t, a_mean_new, a_cov, gamma_sigma):
    """:func:`cov_update` on (H, dA, N) samples (same gamma=0 cond)."""

    def blended(_):
        dev = a_t - a_mean_new[..., None]
        weighted = jnp.einsum("n,hin,hjn->hij", weight, dev, dev)
        return weighted * gamma_sigma + a_cov * (1.0 - gamma_sigma)

    return jax.lax.cond(gamma_sigma == 0.0, lambda _: a_cov, blended, None)


def cov_factor_update(weight, a_sampled, a_mean_new, a_cov, a_chol,
                      gamma_sigma):
    """:func:`cov_factor_update_t` on (N, H, dA) samples (jnp engine)."""

    def blended(_):
        dev = a_sampled - a_mean_new[None]
        weighted = jnp.einsum("n,nhi,nhj->hij", weight, dev, dev)
        new_cov = weighted * gamma_sigma + a_cov * (1.0 - gamma_sigma)
        return new_cov, jnp.linalg.cholesky(new_cov)

    return jax.lax.cond(
        gamma_sigma == 0.0, lambda _: (a_cov, a_chol), blended, None
    )


def cov_factor_update_t(weight, a_t, a_mean_new, a_cov, a_chol, gamma_sigma):
    """:func:`cov_update_t` that also maintains the Cholesky factor.

    The MPPI sampler needs chol(a_cov) every solve; deriving it from the
    carried covariance puts a (H, dA, dA) batched Cholesky custom-call on
    the hot path even when gamma_sigma == 0 leaves a_cov untouched
    (XLA cannot hoist through the carried cond — device trace measured it
    at 13.2 us of the 75 us kernel-rng solve, results/roofline_mppi.json).
    Carrying the factor and refreshing it only inside the blended branch
    removes that cost exactly when the blend is the identity; the
    receding-horizon row shift commutes with the per-step factorization
    (chol acts on each (dA, dA) block independently), so the shifted
    carried factor stays exact. Returns ``(a_cov, a_chol)``.
    """

    def blended(_):
        dev = a_t - a_mean_new[..., None]
        weighted = jnp.einsum("n,hin,hjn->hij", weight, dev, dev)
        new_cov = weighted * gamma_sigma + a_cov * (1.0 - gamma_sigma)
        return new_cov, jnp.linalg.cholesky(new_cov)

    return jax.lax.cond(
        gamma_sigma == 0.0, lambda _: (a_cov, a_chol), blended, None
    )
